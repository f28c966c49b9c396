"""Backoff n-gram language model with fully on-device shallow fusion.

The production companion to the LSTM LM (models/lm.py): count-based,
trains in seconds on the manifest transcripts (tools/train_ngram.py),
and fuses into beam search with ZERO per-step compute beyond two
gathers — the KenLM role in reference-family stacks.

TPU-native formulation (same recipe as decode/context.py): the model is
compiled ON HOST into dense tables over its S context states

    lp[s, v]         : fully backed-off log P(v | state s)
    next_state[s, v] : longest-suffix context state after consuming v

so backoff never happens on device — it is resolved table-build time by
walking contexts shortest-first (each state's row is its explicit
discounted mass interpolated with its suffix state's finished row).
Each beam carries one int32 state id; fusion is exact under prefix
merging and across streaming chunks because the state is a pure
function of the label prefix.

Estimation is interpolated absolute discounting:

    P(v | h) = max(c(h,v) - D, 0) / c(h)  +  D * T(h) / c(h) * P(v | h')

with T(h) = distinct continuations of h, h' = suffix(h), grounded in a
unigram interpolated with the uniform distribution — every row sums to
exactly 1 and every token has nonzero mass (tested).

Memory: S*V floats + S*V int32. With subword vocabularies (BASELINE
configs max at V=1024) and transcript-scale corpora this is a few MB;
pass the tables as traced jit arguments, not closure captures.
"""

from __future__ import annotations

import json
from typing import NamedTuple

import numpy as np

BOS_ID = 0  # blank doubles as BOS everywhere in this framework (models/lm.py)


class NgramLM(NamedTuple):
    """Dense device tables (pytree): see module docstring."""
    lp: "jax.Array"          # (S, V) float32 log P(v | s)
    next_state: "jax.Array"  # (S, V) int32
    start: int               # state id of the sentence-start context


def train_ngram(seqs, order: int, vocab_size: int, *,
                discount: float = 0.75, bos: int = BOS_ID) -> NgramLM:
    """Count, discount, and compile an n-gram LM to dense tables.

    seqs: iterable of token-id sequences (transcripts; ids < vocab_size,
    never containing `bos`). order >= 1.
    """
    import jax.numpy as jnp

    if order < 1:
        raise ValueError("order must be >= 1")
    D = float(discount)
    if not (0.0 < D < 1.0):
        raise ValueError("discount must be in (0, 1)")

    # --- counting ----------------------------------------------------------
    counts: dict[tuple, dict[int, int]] = {(): {}}
    for seq in seqs:
        toks = [int(t) for t in seq]
        for t in toks:
            if not (0 <= t < vocab_size) or t == bos:
                raise ValueError(f"token {t} invalid for the LM vocab")
        hist = (bos,) if order > 1 else ()
        for t in toks:
            for n in range(len(hist) + 1):
                h = hist[n:]
                counts.setdefault(h, {})
                counts[h][t] = counts[h].get(t, 0) + 1
            hist = (hist + (t,))[-(order - 1):] if order > 1 else ()

    # suffix-close the state set (a backoff target must exist)
    states = set(counts)
    for h in list(states):
        for i in range(1, len(h)):
            states.add(h[i:])
    states.add(())
    if order > 1:
        states.add((bos,))
    # shortest-first so each state's suffix row is finished before use
    state_list = sorted(states, key=lambda h: (len(h), h))
    sid = {h: i for i, h in enumerate(state_list)}
    S = len(state_list)

    lp = np.zeros((S, vocab_size), np.float64)
    for i, h in enumerate(state_list):
        c = counts.get(h, {})
        total = sum(c.values())
        if h == ():
            if total == 0:
                p = np.full(vocab_size, 1.0 / vocab_size)
            else:
                p = np.zeros(vocab_size)
                for v, n in c.items():
                    p[v] = max(n - D, 0.0) / total
                p += (D * len(c) / total) / vocab_size  # uniform ground
        else:
            base = np.exp(lp[sid[h[1:]]])
            if total == 0:
                p = base
            else:
                p = np.zeros(vocab_size)
                for v, n in c.items():
                    p[v] = max(n - D, 0.0) / total
                p += (D * len(c) / total) * base
        lp[i] = np.log(np.maximum(p, 1e-30))

    nxt = np.zeros((S, vocab_size), np.int32)
    for i, h in enumerate(state_list):
        for v in range(vocab_size):
            cand = (h + (v,))[-(order - 1):] if order > 1 else ()
            while cand not in sid:
                cand = cand[1:]
            nxt[i, v] = sid[cand]

    start = sid[(bos,)] if order > 1 else sid[()]
    return NgramLM(lp=jnp.asarray(lp, jnp.float32),
                   next_state=jnp.asarray(nxt), start=start)


def sequence_logprob(lm: NgramLM, seq) -> float:
    """Host-side log P(seq) under the compiled tables (tests/rescoring)."""
    lp = np.asarray(lm.lp)
    nxt = np.asarray(lm.next_state)
    s, total = lm.start, 0.0
    for t in seq:
        total += float(lp[s, int(t)])
        s = int(nxt[s, int(t)])
    return total


def _paths(path: str) -> tuple[str, str]:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".npz", base + ".meta.json"


def save_ngram(lm: NgramLM, path: str):
    npz, meta = _paths(path)
    np.savez(npz[:-4], lp=np.asarray(lm.lp),
             next_state=np.asarray(lm.next_state))
    with open(meta, "w") as f:
        json.dump({"start": int(lm.start),
                   "vocab_size": int(lm.lp.shape[1])}, f)


def load_ngram(path: str) -> NgramLM:
    import jax.numpy as jnp
    npz, meta_p = _paths(path)
    data = np.load(npz)
    with open(meta_p) as f:
        meta = json.load(f)
    return NgramLM(lp=jnp.asarray(data["lp"], jnp.float32),
                   next_state=jnp.asarray(data["next_state"], jnp.int32),
                   start=int(meta["start"]))
