"""CTC loss (Graves 2006) — pure JAX, TPU-friendly.

The reference repo family commonly ships a CTC head for encoder
pretraining alongside the transducer (SURVEY.md §B). Same design rules as
the RNN-T loss: static shapes, scan over time, fully vectorized over the
extended label axis, fp32 log-space, -inf masking for variable lengths.
Gradients via plain XLA autodiff through the scan (the CTC lattice is
small: S = 2U+1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _extend_labels(labels, blank):
    """(B, U) -> (B, 2U+1) blank-interleaved: [b, l1, b, l2, ..., b]."""
    B, U = labels.shape
    ext = jnp.full((B, 2 * U + 1), blank, labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_loss(log_probs, labels, frame_lens, label_lens, blank=0):
    """Per-utterance CTC negative log-likelihood.

    log_probs: (B, T, V) log-softmax outputs. labels: (B, U).
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, V = log_probs.shape
    U = labels.shape[1]
    S = 2 * U + 1
    z = _extend_labels(labels.astype(jnp.int32), blank)  # (B, S)
    s_len = 2 * label_lens.astype(jnp.int32) + 1
    # lp_z[b, t, s] = log_probs[b, t, z[b, s]]
    lp_z = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(z[:, None, :], (B, T, S)), axis=2)

    # skip transition s-2 -> s allowed iff z[s] != blank and z[s] != z[s-2]
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, z.dtype), z[:, :-2]], axis=1)
    can_skip = (z != blank) & (z != z_prev2)  # (B, S)

    s_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
    alpha0 = jnp.where(s_ids < 2, lp_z[:, 0, :], NEG_INF)
    alpha0 = jnp.where(s_ids < s_len[:, None], alpha0, NEG_INF)

    def shift(a, k):
        return jnp.concatenate(
            [jnp.full((B, k), NEG_INF, a.dtype), a[:, :-k]], axis=1)

    def step(alpha, lp_t):
        stay = alpha
        diag = shift(alpha, 1)
        skip = jnp.where(can_skip, shift(alpha, 2), NEG_INF)
        m = jnp.maximum(jnp.maximum(stay, diag), skip)
        m_safe = jnp.maximum(m, NEG_INF)
        tot = m_safe + jnp.log(
            jnp.exp(stay - m_safe) + jnp.exp(diag - m_safe)
            + jnp.exp(skip - m_safe))
        tot = jnp.where(m <= NEG_INF * 0.5, NEG_INF, tot)
        return jnp.maximum(tot + lp_t, NEG_INF), None

    def masked_step(carry, xs):
        alpha, t = carry
        lp_t = xs
        new_alpha, _ = step(alpha, lp_t)
        alpha = jnp.where(
            (t < frame_lens.astype(jnp.int32))[:, None], new_alpha, alpha)
        return (alpha, t + 1), None

    (alpha, _), _ = jax.lax.scan(
        masked_step, (alpha0, jnp.int32(1)),
        jnp.moveaxis(lp_z[:, 1:, :], 1, 0), unroll=4)

    b_idx = jnp.arange(B)
    last = alpha[b_idx, s_len - 1]
    last2 = jnp.where(s_len >= 2, alpha[b_idx, jnp.maximum(s_len - 2, 0)],
                      NEG_INF)
    m = jnp.maximum(last, last2)
    m_safe = jnp.maximum(m, NEG_INF)
    total = m_safe + jnp.log(jnp.exp(last - m_safe) + jnp.exp(last2 - m_safe))
    return -jnp.where(m <= NEG_INF * 0.5, NEG_INF, total)


def ctc_loss_from_logits(logits, labels, frame_lens, label_lens, blank=0):
    return ctc_loss(jax.nn.log_softmax(logits.astype(jnp.float32), -1),
                    labels, frame_lens, label_lens, blank)
