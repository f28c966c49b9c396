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


def emit_frames_device(K, frame_lens, label_lens):
    """Backpointers -> per-label emit frames, fully on device (jittable).

    The host backtrace (backtrace_emit_frames) walks t backwards writing
    ranges; the device form instead reconstructs colafter (B, T) — the
    path's label column AFTER each frame — by a reverse lax.scan over the
    backpointer rows, then reads off

        emit_frame[b, j] = #{t < frame_len : colafter[b, t] <= j}

    (label j is emitted at the first frame whose after-column exceeds j;
    colafter is non-decreasing). Positions >= label_len return -1, like
    the host version. Used by the alignment-restricted training band
    (ops/rnnt_pruned.alignment_bounds), where the alignment must be
    computed INSIDE the jitted train step.
    """
    B, T, U1 = K.shape
    frame_lens = frame_lens.astype(jnp.int32)
    label_lens = label_lens.astype(jnp.int32)
    bi = jnp.arange(B)

    def step(u, t):
        # entering column of frame t, only while t is a valid (non-pad,
        # non-first) frame row; otherwise the column holds
        k = K[bi, t, u]
        u_new = jnp.where((t >= 1) & (t <= frame_lens - 1), k, u)
        return u_new, u_new  # colafter[t - 1]

    # t = T-1 .. 1; carry starts at the terminal column label_lens
    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)
    if T > 1:
        _, cols = jax.lax.scan(step, label_lens, ts)
        # cols[i] = colafter[T-1-i - ... ] for t-1 = T-2 .. 0 -> reverse
        colafter = jnp.concatenate(
            [jnp.flip(jnp.moveaxis(cols, 0, 1), axis=1),
             label_lens[:, None]], axis=1)  # (B, T)
    else:
        colafter = label_lens[:, None]
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :]
    valid_t = t_ids < frame_lens[:, None]  # (B, T)
    j = jnp.arange(U1 - 1, dtype=jnp.int32)[None, None, :]  # (1, 1, U)
    emitted_by = (colafter[:, :, None] <= j) & valid_t[:, :, None]
    emit = jnp.sum(emitted_by.astype(jnp.int32), axis=1)  # (B, U)
    return jnp.where(j[0] < label_lens[:, None], emit, -1)
