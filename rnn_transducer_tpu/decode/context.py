"""Contextual biasing (keyword / phrase boosting) for beam search.

Production ASR systems bias decoding toward a caller-supplied list of
phrases — contact names, playlist titles, domain terms — by adding a
bonus to beam-search scores while a hypothesis is extending one of the
phrases (shallow-fusion contextual biasing, Zhao et al. 2019; the
reference family exposes no equivalent, so this is a capability
extension on top of the SURVEY §2 row-7 beam search).

TPU-native formulation: the phrase list is compiled ON HOST into a
token trie, and the trie is flattened into two dense device tables

  next_node[node, v] : int32  — trie state after consuming label v
  delta[node, v]     : f32    — score bonus for consuming label v

so the per-step device work is two gathers, with NO data-dependent
control flow: `beam_search` adds `delta[cb_node]` (a (B, K, V) gather)
to the label-extension scores alongside the LM fusion term, and each
chosen label advances its beam's carried node id via `next_node`. The
node id is a pure function of the label prefix, so biasing is exact
under prefix merging and carries across streaming chunks unchanged.

Scoring (the standard "subtractive partial boost" scheme):
  * each trie arc earns `boost` (per-token, per-phrase configurable);
  * when a phrase COMPLETES, its earned boost is locked in;
  * when a partial match dies (the next label leaves the trie), the
    unlocked boost accumulated since the last completion is taken back
    in the same step (delta = -accum[node]), and the search re-enters
    the trie at the root if the failing label itself starts a phrase.
  * `final_bias(bias, node)` returns the still-unlocked boost so
    callers can report scores with dangling partial matches removed
    (beam_search subtracts it from the RETURNED scores; the carried
    streaming state keeps the raw score so later chunks can complete
    the phrase).
Because take-back happens on the failing transition, every completed
occurrence of a phrase nets exactly len(phrase) * boost and unmatched
text nets 0 (up to suffix overlaps: re-entry checks root children
only, not Aho-Corasick suffix links — a depth>=2 suffix of a dying
match is not resurrected; with word/subword tokens this is rare).

Shared prefixes are shared trie arcs; if phrases with different
per-phrase boosts share a prefix, the shared arcs take the maximum.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class ContextBias(NamedTuple):
    """Device tables for trie-driven score biasing (see module doc).

    A pytree (pass it as a traced jit argument — with large phrase
    lists the tables are megabytes and must not be inlined into the
    compiled program).
    """
    next_node: "jax.Array"  # (N, V) int32
    delta: "jax.Array"      # (N, V) float32
    accum: "jax.Array"      # (N,)  float32 unlocked boost at each node


def build_context_bias(phrases: Sequence[Sequence[int]], vocab_size: int, *,
                       blank: int = 0, boost: float = 2.0,
                       boosts: Sequence[float] | None = None) -> ContextBias:
    """Compile token-id phrases into dense biasing tables.

    Args:
      phrases: label-id sequences (tokenized with the model's tokenizer;
        must not contain `blank` — blank is never emitted as a label).
      vocab_size: V; table columns.
      boost: per-token score bonus applied while matching (log-prob
        units, same scale as the LM fusion weight).
      boosts: optional per-phrase per-token bonuses overriding `boost`.

    Returns a ContextBias of jnp arrays (node 0 = root).
    """
    import jax.numpy as jnp

    if boosts is None:
        boosts = [float(boost)] * len(phrases)
    if len(boosts) != len(phrases):
        raise ValueError(f"{len(boosts)} boosts for {len(phrases)} phrases")

    # --- trie build (host) ------------------------------------------------
    children: list[dict[int, int]] = [{}]  # node -> {label: child}
    arc_boost: list[dict[int, float]] = [{}]  # node -> {label: boost}
    is_final: list[bool] = [False]
    seen: set[tuple] = set()
    for phrase, b in zip(phrases, boosts):
        phrase = tuple(int(t) for t in phrase)
        if not phrase:
            raise ValueError("empty boost phrase")
        for t in phrase:
            if not (0 <= t < vocab_size):
                raise ValueError(f"phrase token {t} outside vocab "
                                 f"[0, {vocab_size})")
            if t == blank:
                raise ValueError("boost phrases must not contain the blank "
                                 f"id ({blank})")
        if phrase in seen:
            continue
        seen.add(phrase)
        node = 0
        for t in phrase:
            if t not in children[node]:
                children[node][t] = len(children)
                children.append({})
                arc_boost.append({})
                is_final.append(False)
            arc_boost[node][t] = max(arc_boost[node].get(t, -np.inf),
                                     float(b))
            node = children[node][t]
        is_final[node] = True

    n = len(children)
    # unlocked boost at each node: resets to 0 at phrase completions
    accum = np.zeros((n,), np.float32)
    stack = [0]
    while stack:
        u = stack.pop()
        for lab, c in children[u].items():
            accum[c] = 0.0 if is_final[c] else accum[u] + arc_boost[u][lab]
            stack.append(c)

    next_node = np.zeros((n, vocab_size), np.int32)
    delta = np.zeros((n, vocab_size), np.float32)
    root_children = children[0]
    for u in range(n):
        for v in range(vocab_size):
            if v in children[u]:
                next_node[u, v] = children[u][v]
                delta[u, v] = arc_boost[u][v]
            else:
                # match dies: take back the unlocked boost, then try to
                # restart a phrase at the root with this same label
                d = -accum[u]
                if v in root_children:
                    next_node[u, v] = root_children[v]
                    d += arc_boost[0][v]
                else:
                    next_node[u, v] = 0
                delta[u, v] = d
    return ContextBias(next_node=jnp.asarray(next_node),
                       delta=jnp.asarray(delta),
                       accum=jnp.asarray(accum))


def final_bias(bias: ContextBias, node):
    """Unlocked (dangling partial-match) boost for carried node ids —
    subtract from raw beam scores to get completed-phrases-only scores."""
    return bias.accum[node]


def load_boost_phrases(path: str, tokenizer, *, default_boost: float = 2.0):
    """Parse a boost file into (phrases, boosts) for build_context_bias.

    One phrase per line, optionally `<TAB><per-token boost>`; blank
    lines and `#` comments skipped. Phrases are tokenized with the
    model's tokenizer (data/tokenizer.py protocol: .encode(text)).
    """
    phrases, boosts = [], []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            if "\t" in line:
                text, b = line.split("\t", 1)
                b = float(b)
            else:
                text, b = line, default_boost
            ids = list(tokenizer.encode(text.strip()))
            if ids:
                phrases.append(ids)
                boosts.append(b)
    if not phrases:
        raise ValueError(f"no boost phrases in {path}")
    return phrases, boosts
