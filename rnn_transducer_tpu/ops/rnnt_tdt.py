"""Token-and-Duration Transducer (TDT) loss — Xu et al. 2023,
"Efficient Sequence Transduction by Jointly Predicting Tokens and
Durations" (the NeMo-family flagship transducer variant).

A second joint head (models/transducer.py joint_tdt) predicts how many
frames each emission consumes, from a fixed duration set (e.g.
(0, 1, 2, 3, 4)); the emission probability factorizes as
P(k, d | t, u) = P_tok(k) * P_dur(d). Greedy decoding advances the time
cursor by the predicted duration after EVERY emission — it never stalls
on a frame, giving the variant's large decode-step reduction.

Same TPU-native consumed-frames lattice grid as ops/rnnt_multiblank.py
(tau in [0, T] = frames consumed; acceptance = exact consumption):

  alpha(tau, u) =
      (+)_{d>=1} alpha(tau-d, u)   + lp_blank(tau-d, u)   + lp_dur_d(tau-d, u)
      (+)_{d>=1} alpha(tau-d, u-1) + lp_y(tau-d, u-1)     + lp_dur_d(tau-d, u-1)
      (+)        alpha(tau, u-1)   + lp_y(tau, u-1)       + lp_dur_0(tau, u-1)

The d >= 1 arrivals (blank AND token, the token ones shifted one label
position) are pre-shifted into scan inputs; the scan carries a ring
buffer of the last max(d) rows; the duration-0 token term is the usual
within-row affine log-semiring recurrence solved by associative_scan.
Blank may not take duration 0 (it would be a self-loop). Gradients via
autodiff (the "xla" loss tier); fused/Pallas/pruned kernels and beam
search reject TDT models (train/loop.py, decode/beam.py guards).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.ops.rnnt_loss import (NEG_INF, _gather_label_logprobs,
                                              _logaddexp, _solve_row)


def rnnt_loss_tdt(logits, dur_logits, labels, frame_lens, label_lens,
                  durations, blank: int = 0):
    """Negative log-likelihood of the TDT model.

    Args:
      logits: (B, T, U+1, V) token logits; dur_logits: (B, T, U+1, D)
        duration logits over `durations` (same order).
      labels: (B, U) int32. frame_lens, label_lens: (B,).
      durations: the duration set, e.g. (0, 1, 2, 3, 4); non-negative,
        unique, at least one >= 1.

    Returns per-utterance losses (B,) float32.
    """
    B, T, U1, V = logits.shape
    ds = tuple(int(d) for d in durations)
    if len(set(ds)) != len(ds) or any(d < 0 for d in ds) \
            or not any(d >= 1 for d in ds):
        raise ValueError(f"bad TDT duration set {durations}")
    if dur_logits.shape != (B, T, U1, len(ds)):
        raise ValueError(f"dur_logits {dur_logits.shape} vs durations {ds}")

    lp_tok = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_dur = jax.nn.log_softmax(dur_logits.astype(jnp.float32), axis=-1)
    lp_y = _gather_label_logprobs(lp_tok, labels)  # (B, T, U1)
    lp_b = lp_tok[:, :, :, blank]
    return rnnt_loss_tdt_from_lp(lp_b, lp_y, lp_dur, frame_lens,
                                 label_lens, ds)


def rnnt_loss_tdt_from_lp(lp_b, lp_y, lp_dur, frame_lens, label_lens,
                          durations):
    """TDT loss from pre-extracted per-cell log-prob streams.

    lp_b, lp_y: (B, T, U+1) blank/label token log-probs; lp_dur:
    (B, T, U+1, D) duration log-probs (same order as `durations`).
    The boundary the sequence-parallel path all-gathers across frame
    shards (parallel/tp.py sp_joint_loss).
    """
    B, T, U1 = lp_b.shape
    ds = tuple(int(d) for d in durations)

    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, None, :]
    t_len = frame_lens.astype(jnp.int32)[:, None, None]
    u_len = label_lens.astype(jnp.int32)[:, None, None]

    # per-duration masked arc scores at their SOURCE cell (tau', u'):
    # every consumed frame must be valid (tau' + d <= t_len), the source
    # frame must exist (tau' < t_len), and the label index must be legal
    tok_d, blank_d = {}, {}
    for j, d in enumerate(ds):
        frames_ok = (t_ids < t_len) & (t_ids + d <= t_len)
        tok_d[d] = jnp.where(frames_ok & (u_ids < u_len),
                             lp_y + lp_dur[:, :, :, j], NEG_INF)
        if d >= 1:
            blank_d[d] = jnp.where(frames_ok & (u_ids <= u_len),
                                   lp_b + lp_dur[:, :, :, j], NEG_INF)

    has0 = 0 in ds
    # row 0: chains of duration-0 emissions on frame 0
    if has0:
        row0 = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32),
             jnp.cumsum(tok_d[0][:, 0, :-1], axis=-1)], axis=-1)
        row0 = jnp.maximum(row0, NEG_INF)
    else:
        row0 = jnp.full((B, U1), NEG_INF, jnp.float32).at[:, 0].set(0.0)

    d1s = [d for d in ds if d >= 1]
    Dmax = max(d1s)

    def shift(a, d):  # rows tau=1..T of a pre-shifted (B, T, U1) tensor
        padded = jnp.concatenate(
            [jnp.full((B, d, U1), NEG_INF, jnp.float32), a], axis=1)
        return padded[:, 1: T + 1]

    xs_blank = jnp.stack([shift(blank_d[d], d) for d in d1s], 2)
    xs_tok = jnp.stack([shift(tok_d[d], d) for d in d1s], 2)
    if has0:
        xs_y0 = jnp.concatenate(
            [tok_d[0], jnp.full((B, 1, U1), NEG_INF, jnp.float32)],
            axis=1)[:, 1: T + 1]
    else:
        xs_y0 = jnp.full((B, T, U1), NEG_INF, jnp.float32)

    carry0 = jnp.full((B, Dmax, U1), NEG_INF, jnp.float32)
    carry0 = carry0.at[:, Dmax - 1].set(row0)

    def step(carry, xs):
        blk_rows, tok_rows, y0_t = xs
        b_vec = jnp.full((B, U1), NEG_INF, jnp.float32)
        for j, d in enumerate(d1s):
            src = carry[:, Dmax - d]  # alpha(tau - d)
            b_vec = _logaddexp(b_vec, src + blk_rows[:, j])
            tok = src + tok_rows[:, j]  # lands one label position later
            b_vec = _logaddexp(b_vec, jnp.concatenate(
                [jnp.full((B, 1), NEG_INF, jnp.float32), tok[:, :-1]], -1))
        b_vec = jnp.maximum(b_vec, NEG_INF)
        c_vec = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, jnp.float32), y0_t[:, :-1]], -1)
        row = _solve_row(b_vec, c_vec)
        carry = jnp.concatenate([carry[:, 1:], row[:, None]], axis=1)
        return carry, row

    _, rows = jax.lax.scan(
        step, carry0,
        (jnp.moveaxis(xs_blank, 1, 0), jnp.moveaxis(xs_tok, 1, 0),
         jnp.moveaxis(xs_y0, 1, 0)))
    all_rows = jnp.concatenate([row0[None], rows], axis=0)

    b_idx = jnp.arange(B)
    alpha_final = all_rows[frame_lens.astype(jnp.int32), b_idx,
                           label_lens.astype(jnp.int32)]
    return jnp.where(frame_lens.astype(jnp.int32) == 0, 0.0, -alpha_final)
