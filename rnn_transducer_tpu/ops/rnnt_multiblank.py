"""Multi-blank RNN-T loss (Xu et al., ICASSP 2023 — the NeMo-family
"multi-blank transducer" variant).

Besides the standard blank (advances one frame), the joint emits K "big
blank" symbols that consume `durations[k] > 1` frames at once (logit
columns V..V+K-1, softmaxed jointly with the vocabulary). Training
marginalizes over all alignments including the jumps; greedy decoding
then skips `duration` frames whenever a big blank wins — 2-4x fewer
sequential decode steps on blank-dominated audio at equal accuracy.

TPU-native formulation, extending ops/rnnt_loss.py's lattice solver:
the grid is indexed by CONSUMED FRAMES tau in [0, T] (row tau = "tau
frames consumed"), so every blank type is an arrival from a fixed
earlier row: alpha(tau, u) collects logsumexp_k alpha(tau - d_k, u) +
lp_k(tau - d_k, u), and the within-row emission recurrence stays the
same O(log U)-depth `associative_scan` affine log-semiring solve. The
scan over tau carries a ring buffer of the last max(d) rows; per-type
arrival terms are PRE-SHIFTED into scan inputs, so the step body is
pure VPU work with static indexing. Acceptance is exact consumption:
a path is valid iff its blanks consume exactly frame_len frames
(duration-1 blanks reproduce ops/rnnt_loss.py exactly — tested).

Gradients via JAX autodiff through the scan (the "xla" loss tier);
the fused/Pallas/pruned kernels do not support the extra transitions
and are guarded in train/loop.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.ops.rnnt_loss import (NEG_INF, _gather_label_logprobs,
                                              _logaddexp, _solve_row)


def rnnt_loss_multiblank(logits, labels, frame_lens, label_lens,
                         durations, blank: int = 0):
    """Negative log-likelihood of the multi-blank transducer.

    Args:
      logits: (B, T, U+1, V + K) — the last K columns are the big
        blanks, K = len(durations).
      labels: (B, U) int32 (< V, never a blank column).
      frame_lens, label_lens: (B,) valid lengths.
      durations: per-big-blank frame counts (each > 1).

    Returns per-utterance losses (B,) float32.
    """
    B, T, U1, C = logits.shape
    K = len(durations)
    V = C - K
    ds = (1,) + tuple(int(d) for d in durations)
    if any(d < 1 for d in ds) or any(d <= 1 for d in ds[1:]):
        raise ValueError(f"big-blank durations must be > 1: {durations}")
    cols = (blank,) + tuple(V + k for k in range(K))

    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_y = _gather_label_logprobs(lp, labels)  # (B, T, U1)
    lp_blanks = jnp.stack([lp[:, :, :, c] for c in cols], axis=-1)
    return rnnt_loss_multiblank_from_lp(lp_blanks, lp_y, frame_lens,
                                        label_lens, durations)


def rnnt_loss_multiblank_from_lp(lp_blanks, lp_y, frame_lens, label_lens,
                                 durations):
    """Multi-blank loss from pre-extracted per-cell log-prob streams.

    lp_blanks: (B, T, U+1, K+1) — column 0 the standard blank, then one
    per big-blank duration (same order as `durations`); lp_y: (B, T,
    U+1) label log-probs. This is the boundary the sequence-parallel
    path (parallel/tp.py sp_joint_loss) all-gathers across frame
    shards — the O(T*U*V) softmax/gather stays shard-local and only
    these (B, T, U+1) streams travel.
    """
    B, T, U1, _ = lp_blanks.shape
    ds = (1,) + tuple(int(d) for d in durations)

    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, None, :]
    t_len = frame_lens.astype(jnp.int32)[:, None, None]
    u_len = label_lens.astype(jnp.int32)[:, None, None]

    # emission at grid row tau reads frame tau: valid while tau < t_len
    emit_ok = (u_ids < u_len) & (t_ids < t_len)
    lp_y_m = jnp.where(emit_ok, lp_y, NEG_INF)

    # blank type k from row tau' consumes frames tau'..tau'+d_k-1: every
    # consumed frame must be valid (exact-consumption acceptance)
    lp_blanks_m = []
    for j, d in enumerate(ds):
        ok = (t_ids + d <= t_len) & (u_ids <= u_len)
        lp_blanks_m.append(jnp.where(ok, lp_blanks[:, :, :, j], NEG_INF))

    # row 0: emissions on frame 0 only
    row0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32),
         jnp.cumsum(lp_y_m[:, 0, :-1], axis=-1)], axis=-1)
    row0 = jnp.maximum(row0, NEG_INF)

    # pre-shift each blank type so scan step tau reads its arrival term
    # at static position: shifted_k[:, tau] = lp_k_m[:, tau - d_k]
    def shift(lp_k, d):
        padded = jnp.concatenate(
            [jnp.full((B, d, U1), NEG_INF, jnp.float32), lp_k], axis=1)
        return padded[:, 1: T + 1]  # rows tau = 1..T

    xs_blanks = jnp.stack([shift(lp_k, d)
                           for lp_k, d in zip(lp_blanks_m, ds)],
                          axis=2)  # (B, T, K+1, U1)
    # emissions for rows 1..T (row T has no frame: NEG_INF pad)
    xs_y = jnp.concatenate(
        [lp_y_m, jnp.full((B, 1, U1), NEG_INF, jnp.float32)],
        axis=1)[:, 1: T + 1]

    Dmax = max(ds)
    # carry[:, j] = alpha(tau - Dmax + j); init rows tau < 0 are dead
    carry0 = jnp.full((B, Dmax, U1), NEG_INF, jnp.float32)
    carry0 = carry0.at[:, Dmax - 1].set(row0)

    def step(carry, xs):
        lpk_rows, lpy_t = xs  # (B, K+1, U1), (B, U1)
        b_vec = jnp.full((B, U1), NEG_INF, jnp.float32)
        for j, d in enumerate(ds):
            b_vec = _logaddexp(b_vec, carry[:, Dmax - d] + lpk_rows[:, j])
        b_vec = jnp.maximum(b_vec, NEG_INF)
        c_vec = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, jnp.float32), lpy_t[:, :-1]],
            axis=-1)
        row = _solve_row(b_vec, c_vec)
        carry = jnp.concatenate([carry[:, 1:], row[:, None]], axis=1)
        return carry, row

    _, rows = jax.lax.scan(
        step, carry0,
        (jnp.moveaxis(xs_blanks, 1, 0), jnp.moveaxis(xs_y, 1, 0)))
    all_rows = jnp.concatenate([row0[None], rows], axis=0)  # (T+1, B, U1)

    b_idx = jnp.arange(B)
    alpha_final = all_rows[frame_lens.astype(jnp.int32), b_idx,
                           label_lens.astype(jnp.int32)]
    # zero-frame utterances: defined as loss 0 with zero gradient
    # (matches ops/rnnt_loss.py / the bucketing drain contract)
    return jnp.where(frame_lens.astype(jnp.int32) == 0, 0.0, -alpha_final)


def duration_table(vocab_size: int, durations, n_classes: int = 0):
    """Frame advance per emitted class id for greedy decoding: 1 for the
    standard blank (and, unused, for labels), durations[k] for big
    blanks. Returns (n_classes,) int32."""
    n = n_classes or vocab_size + len(durations)
    durs = jnp.ones((n,), jnp.int32)
    for k, d in enumerate(durations):
        durs = durs.at[vocab_size + k].set(int(d))
    return durs
