"""CTC loss (Graves 2006) — pure JAX, TPU-friendly.

The reference repo family commonly ships a CTC head for encoder
pretraining alongside the transducer (SURVEY.md §B). Same design rules as
the RNN-T loss: static shapes, scan over time, fully vectorized over the
extended label axis, fp32 log-space, -inf masking for variable lengths.
Gradients via plain XLA autodiff through the scan (the CTC lattice is
small: S = 2U+1).
"""

from __future__ import annotations

import functools

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


def _lattice_tables(labels, label_lens, blank):
    """Extended-label lattice constants: z (B,S), can_skip (B,S), s_len."""
    z = _extend_labels(labels.astype(jnp.int32), blank)
    B = z.shape[0]
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), -1, z.dtype), z[:, :-2]], axis=1)
    can_skip = (z != blank) & (z != z_prev2)
    s_len = 2 * label_lens.astype(jnp.int32) + 1
    return z, can_skip, s_len


def _alpha_scan(lp_z, can_skip, frame_lens, s_len):
    """Forward recursion, SAVING every alpha_t.

    lp_z: (B, T, S) per-state frame log-probs. Returns (alphas (T,B,S),
    per-utterance loss (B,)). Semantics identical to ctc_loss() above:
    steps at t >= frame_len are identity, the total is read from the
    final alpha at states s_len-1 / s_len-2.
    """
    B, T, S = lp_z.shape
    s_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
    alpha0 = jnp.where(s_ids < 2, lp_z[:, 0, :], NEG_INF)
    alpha0 = jnp.where(s_ids < s_len[:, None], alpha0, NEG_INF)

    def shift(a, k):
        return jnp.concatenate(
            [jnp.full((B, k), NEG_INF, a.dtype), a[:, :-k]], axis=1)

    def masked_step(carry, lp_t_and_t):
        alpha, = carry
        lp_t, t = lp_t_and_t
        stay = alpha
        diag = shift(alpha, 1)
        skip = jnp.where(can_skip, shift(alpha, 2), NEG_INF)
        m = jnp.maximum(jnp.maximum(stay, diag), skip)
        m_safe = jnp.maximum(m, NEG_INF)
        tot = m_safe + jnp.log(
            jnp.exp(stay - m_safe) + jnp.exp(diag - m_safe)
            + jnp.exp(skip - m_safe))
        tot = jnp.where(m <= NEG_INF * 0.5, NEG_INF, tot)
        new_alpha = jnp.maximum(tot + lp_t, NEG_INF)
        alpha = jnp.where(
            (t < frame_lens.astype(jnp.int32))[:, None], new_alpha, alpha)
        return (alpha,), alpha

    (alpha_T,), alphas_rest = jax.lax.scan(
        masked_step, (alpha0,),
        (jnp.moveaxis(lp_z[:, 1:, :], 1, 0),
         jnp.arange(1, T, dtype=jnp.int32)), unroll=4)
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)

    b_idx = jnp.arange(B)
    last = alpha_T[b_idx, s_len - 1]
    last2 = jnp.where(s_len >= 2, alpha_T[b_idx, jnp.maximum(s_len - 2, 0)],
                      NEG_INF)
    m = jnp.maximum(last, last2)
    m_safe = jnp.maximum(m, NEG_INF)
    total = m_safe + jnp.log(jnp.exp(last - m_safe) + jnp.exp(last2 - m_safe))
    return alphas, -jnp.where(m <= NEG_INF * 0.5, NEG_INF, total)


def ctc_loss_from_logits(logits, labels, frame_lens, label_lens, blank=0):
    """Per-utterance CTC loss on raw joint-head logits, analytic backward.

    Forward value matches `ctc_loss(log_softmax(logits), ...)`. The custom
    VJP replaces autodiff-through-the-scan with the classic closed form
    dL/dlogits = softmax(logits) - occupancy, where the occupancy
    gamma_t(s) = exp(alpha_t(s) + beta_t(s) + loss) comes from one reverse
    beta scan, and the S->V scatter of gamma is an MXU one-hot matmul
    instead of an XLA scatter-add (the scatter backward of take_along_axis
    dominated the +86%/step multitask cost priced in docs/PERFORMANCE.md:
    the auxiliary head is the same lattice math as the RNN-T loss tiers,
    so it gets the same treatment).
    """
    return _ctc_vjp(logits.astype(jnp.float32), labels, frame_lens,
                    label_lens, blank)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_vjp(logits, labels, frame_lens, label_lens, blank):
    return _ctc_fwd(logits, labels, frame_lens, label_lens, blank)[0]


def _ctc_fwd(logits, labels, frame_lens, label_lens, blank):
    B, T, V = logits.shape
    z, can_skip, s_len = _lattice_tables(labels, label_lens, blank)
    log_zeta = jax.nn.logsumexp(logits, axis=-1)              # (B, T)
    lp_z = (jnp.take_along_axis(
        logits, jnp.broadcast_to(z[:, None, :], (B, T, z.shape[1])), axis=2)
        - log_zeta[:, :, None])                               # (B, T, S)
    alphas, loss = _alpha_scan(lp_z, can_skip, frame_lens, s_len)
    res = (logits, log_zeta, lp_z, alphas, loss, z, can_skip, s_len,
           frame_lens)
    return loss, res


def _ctc_bwd(blank, res, g):
    del blank
    (logits, log_zeta, lp_z, alphas, loss, z, can_skip, s_len,
     frame_lens) = res
    B, T, V = logits.shape
    S = z.shape[1]
    s_ids = jnp.arange(S, dtype=jnp.int32)[None, :]

    def shift_up(a, k):
        """a[s] -> a[s+k] (toward lower s), -inf fill past the end."""
        return jnp.concatenate(
            [a[:, k:], jnp.full((B, k), NEG_INF, a.dtype)], axis=1)

    # beta_{T-1}: 0 at the two final states, -inf elsewhere.
    beta_T = jnp.where(
        (s_ids == s_len[:, None] - 1) | (s_ids == s_len[:, None] - 2),
        0.0, NEG_INF)
    can_skip_to = jnp.concatenate(  # can_skip[s+2] viewed from s
        [can_skip[:, 2:], jnp.zeros((B, 2), bool)], axis=1)
    valid_T = frame_lens.astype(jnp.int32)

    def bstep(carry, xs):
        beta, = carry                      # beta_{t+1}
        lp_next, alpha_t, t = xs           # lp_z[:, t+1], alphas[t]
        bl = beta + lp_next
        stay = bl
        diag = shift_up(bl, 1)
        skip = jnp.where(can_skip_to, shift_up(bl, 2), NEG_INF)
        m = jnp.maximum(jnp.maximum(stay, diag), skip)
        m_safe = jnp.maximum(m, NEG_INF)
        tot = m_safe + jnp.log(
            jnp.exp(stay - m_safe) + jnp.exp(diag - m_safe)
            + jnp.exp(skip - m_safe))
        cand = jnp.where(m <= NEG_INF * 0.5, NEG_INF, tot)
        # steps at/after the end of the utterance are identity
        beta_t = jnp.where((t + 1 < valid_T)[:, None], cand, beta)
        occ_t = jnp.exp(jnp.minimum(
            alpha_t + beta_t + loss[:, None], 0.0))
        occ_t = jnp.where((t < valid_T)[:, None], occ_t, 0.0)
        return (beta_t,), occ_t

    occ_T = jnp.exp(jnp.minimum(alphas[T - 1] + beta_T + loss[:, None], 0.0))
    occ_T = jnp.where((T - 1 < valid_T)[:, None], occ_T, 0.0)
    ts = jnp.arange(T - 2, -1, -1, dtype=jnp.int32)
    (_,), occ_rest = jax.lax.scan(
        bstep, (beta_T,),
        (jnp.moveaxis(lp_z[:, 1:, :], 1, 0)[::-1],
         alphas[:-1][::-1], ts), unroll=4)
    occ = jnp.concatenate([occ_rest[::-1], occ_T[None]], axis=0)  # (T,B,S)
    occ = jnp.moveaxis(occ, 0, 1)                                 # (B,T,S)
    # the rare all-dead lattice (e.g. infeasible label len) has loss ~1e30;
    # its occupancies above are exp(>huge)->clamped, zero them instead.
    occ = jnp.where((loss < -NEG_INF * 0.5)[:, None, None], occ, 0.0)

    # scatter gamma over z as a one-hot matmul: (B,T,S) @ (B,S,V) on MXU.
    # HIGHEST precision: the TPU default would round occ to bf16 before
    # the product (measured 1.9e-3 grad error on chip); the occupancy
    # sums must stay f32-exact so fused-vs-XLA grad parity holds. The
    # matmul is tiny (~2 GFLOP at libri100 shapes), so the 6-pass f32
    # emulation costs well under the 4 ms budget.
    onehot = jax.nn.one_hot(z, V, dtype=occ.dtype)                # (B,S,V)
    occ_v = jnp.einsum("bts,bsv->btv", occ, onehot,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    softmax = jnp.exp(logits - log_zeta[:, :, None])
    t_valid = (jnp.arange(T, dtype=jnp.int32)[None, :]
               < frame_lens.astype(jnp.int32)[:, None])
    occ_sum = occ.sum(axis=2)                                     # (B,T)
    dlogits = (softmax * jnp.where(t_valid, occ_sum, 0.0)[:, :, None]
               - occ_v) * g[:, None, None]
    return dlogits, None, None, None


_ctc_vjp.defvjp(_ctc_fwd, _ctc_bwd)
