"""Forced alignment: Viterbi best path over the RNN-T (T, U) lattice.

The loss computes the log-sum over all monotonic alignments
(ops/rnnt_loss.py); this computes the single best one and recovers WHERE
each label is emitted — per-label encoder-frame emit times, the classic
transducer alignment/segmentation utility (keyword timestamps, streaming
latency measurement, segmentation for downstream tasks).

Same max-plus structure as the loss's log-semiring recursion: within a
frame row t the label recurrence V[t, u] = max(A[u], V[t, u-1] + lp_y[t,
u-1]) (A = arrival from frame t-1 via blank) is solved in O(log U) depth
with an argmax-carrying `associative_scan`:
    V[t, u] = S[u] + cummax(A - S)[u],  S[u] = sum_{j<u} lp_y[t, j]
and the cummax's arg k is the backpointer "entered row t at column k".
Backtracing the tiny (B, T, U+1) pointer tensor happens on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.rnnt_loss import (
    NEG_INF,
    _gather_label_logprobs,
    _masked_transitions,
)


def _argcummax(x, axis=-1):
    """(values, argindices) of the running maximum; earliest index wins
    ties (strict-> comparison keeps the leftmost maximizer)."""
    idx = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1), x.shape)

    def combine(a, b):
        av, ai = a
        bv, bi = b
        take_b = bv > av
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    return jax.lax.associative_scan(combine, (x, idx), axis=axis)


def rnnt_viterbi(lp_blank, lp_y, frame_lens, label_lens):
    """Best-path score + backpointers.

    lp_blank, lp_y: (B, T, U+1) transition log-probs (lp_y[..., U] unused).
    Returns (score (B,), K (B, T, U+1) int32): K[b, t, u] = the column at
    which the best path enters frame row t before emitting labels
    K[b,t,u]..u-1 at frame t. Row 0 enters at column 0 by definition.
    """
    B, T, U1 = lp_blank.shape
    frame_lens = frame_lens.astype(jnp.int32)
    label_lens = label_lens.astype(jnp.int32)
    lp_blank_m, lp_y_m = _masked_transitions(lp_blank, lp_y, frame_lens,
                                             label_lens)

    def prefix(lpy_t):
        s = jnp.cumsum(lpy_t[:, :-1], axis=-1)
        s = jnp.concatenate([jnp.zeros((B, 1), lpy_t.dtype), s], axis=-1)
        return jnp.maximum(s, NEG_INF)  # cumsum over NEG_INF underflows

    V0 = prefix(lp_y_m[:, 0])  # labels-only row 0

    def step(prev_V, xs):
        lpb_prev, lpy_t = xs
        A = jnp.maximum(prev_V + lpb_prev, NEG_INF)
        S = prefix(lpy_t)
        vals, idxs = _argcummax(A - S)
        V = jnp.maximum(S + vals, NEG_INF)
        return V, (V, idxs)

    if T > 1:
        xs = (jnp.moveaxis(lp_blank_m[:, :-1], 1, 0),
              jnp.moveaxis(lp_y_m[:, 1:], 1, 0))
        _, (Vs, Ks) = jax.lax.scan(step, V0, xs)
        V_all = jnp.concatenate([V0[None], Vs], axis=0)  # (T, B, U1)
        K_all = jnp.concatenate(
            [jnp.zeros((1, B, U1), jnp.int32), Ks], axis=0)
    else:
        V_all = V0[None]
        K_all = jnp.zeros((1, B, U1), jnp.int32)
    V_all = jnp.moveaxis(V_all, 0, 1)  # (B, T, U1)
    K_all = jnp.moveaxis(K_all, 0, 1)

    t_last = jnp.clip(frame_lens - 1, 0, T - 1)
    bi = jnp.arange(B)
    # terminal: best path reaches (t_last, U_b), accepts with a final blank
    score = (V_all[bi, t_last, label_lens]
             + lp_blank[bi, t_last, label_lens])
    return score, K_all


def backtrace_emit_frames(K, frame_lens, label_lens) -> np.ndarray:
    """Backpointers -> per-label emit frames (host).

    K: (B, T, U+1) int32 from rnnt_viterbi. Returns (B, U) int32: frame at
    which each label is emitted on the best path (positions >= label_len
    are -1).
    """
    K = np.asarray(K)
    frame_lens = np.asarray(frame_lens)
    label_lens = np.asarray(label_lens)
    B, T, U1 = K.shape
    out = np.full((B, U1 - 1), -1, np.int32)
    for b in range(B):
        u = int(label_lens[b])
        for t in range(int(frame_lens[b]) - 1, 0, -1):
            k = int(K[b, t, u])
            out[b, k:u] = t
            u = k
        out[b, :u] = 0  # whatever remains was emitted in frame 0
        out[b, int(label_lens[b]):] = -1
    return out


def rnnt_forced_align(logits, labels, frame_lens, label_lens,
                      blank: int = 0):
    """Full-lattice forced alignment from joint logits.

    logits: (B, T, U+1, V); labels: (B, U).
    Returns (emit_frames (B, U) numpy int32, viterbi_score (B,) jax).
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = lp[..., blank]
    lp_y = _gather_label_logprobs(lp, labels)
    score, K = rnnt_viterbi(lp_blank, lp_y, frame_lens, label_lens)
    return backtrace_emit_frames(K, frame_lens, label_lens), score


def align(params, cfg, feats, feat_lens, labels, label_lens):
    """Features + reference labels -> per-label encoder-frame emit times.

    Convenience wrapper: model forward (materialized logits) + Viterbi.
    Frame indices are in encoder frames (multiply by hop * time_reduction
    for seconds). Returns (emit_frames (B, U) np int32, score (B,)).
    """
    from rnn_transducer_tpu.models import transducer as m

    logits, enc_lens = m.forward(params, cfg, feats, feat_lens, labels)
    return rnnt_forced_align(logits, labels, enc_lens, label_lens,
                             cfg.blank)
