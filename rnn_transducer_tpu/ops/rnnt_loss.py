"""RNN-Transducer loss (Graves 2012) — pure-JAX, TPU-native formulation.

The reference (`chmenet/rnn-transducer`, unreadable this round — see
SURVEY.md §0) computes the RNN-T negative log-likelihood with a Python
alpha/beta loop or a warp-rnnt CUDA binding. This implementation is a
ground-up redesign for XLA/TPU:

  * the forward (alpha) lattice recursion runs as a `lax.scan` over time
    frames; the *within-row* dependency over label positions — a first-order
    log-semiring linear recurrence a[u] = logaddexp(b[u], a[u-1] + c[u]) —
    is solved in O(log U) depth with `lax.associative_scan`, so each scan
    step is fully vectorized over (batch, U) and maps onto the VPU;
  * the backward pass is a hand-derived occupancy-gradient (custom_vjp):
    beta is recomputed with the mirrored recursion (rematerialization — no
    (B,T,U,V) residuals are kept), and d loss/d logits is assembled from
    the blank/emit posterior occupancies in one fused elementwise graph;
  * everything is static-shape; variable frame/label lengths are handled
    with -inf masking of transition scores and a gather at the terminal
    lattice cell.

Semantics match the standard formulation used by warp-rnnt /
torchaudio.rnnt_loss: logits has shape (B, T, U+1, V), labels (B, U),
loss[b] = -log P(labels[b] | acoustics[b]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large-negative stand-in for -inf: keeps logaddexp/exp NaN-free on TPU.
NEG_INF = -1.0e30


def _logaddexp(a, b):
    # jnp.logaddexp is fine numerically, but guard the doubly-masked case so
    # NEG_INF + NEG_INF does not overflow to -inf - inf = nan inside exp.
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    return jnp.where(mx <= NEG_INF * 0.5, NEG_INF, out)


def _row_scan_op(x, y):
    """Associative composition of affine log-semiring maps.

    An element (c, b) represents the map  a_out = logaddexp(b, a_in + c).
    Composing "apply x then y" gives (c_x + c_y, logaddexp(b_y, b_x + c_y)).
    """
    cx, bx = x
    cy, by = y
    return cx + cy, _logaddexp(by, bx + cy)


def _solve_row(b_vec, c_vec):
    """Solve a[u] = logaddexp(b[u], a[u-1] + c[u]) with a[-1] = -inf.

    b_vec, c_vec: (..., U1) — scanned along the last axis in O(log U1) depth.
    c_vec[..., 0] must be NEG_INF (no predecessor for u=0).
    """
    _, a = jax.lax.associative_scan(_row_scan_op, (c_vec, b_vec), axis=-1)
    return a


def _gather_label_logprobs(log_probs, labels):
    """lp_y[b, t, u] = log_probs[b, t, u, labels[b, u]] for u < U; (B,T,U1)->pad."""
    B, T, U1, V = log_probs.shape
    U = U1 - 1
    # (B, U) -> (B, 1, U, 1) index into the V axis.
    idx = labels.astype(jnp.int32)[:, None, :, None]
    idx = jnp.broadcast_to(idx, (B, T, U, 1))
    lp_y = jnp.take_along_axis(log_probs[:, :, :U, :], idx, axis=-1)[..., 0]
    # Position u = U has no label to emit.
    pad = jnp.full((B, T, 1), NEG_INF, log_probs.dtype)
    return jnp.concatenate([lp_y, pad], axis=-1)  # (B, T, U1)


def _masked_transitions(lp_blank, lp_y, frame_lens, label_lens):
    """Apply length masks so the DP never leaves the valid lattice.

    emit (lp_y) is only legal while u < label_len; blank *within* the lattice
    is only legal while t + 1 < frame_len (the final blank is the acceptance
    transition, handled separately via the terminal gather/injection).
    """
    B, T, U1 = lp_blank.shape
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]  # (1, T, 1)
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, None, :]  # (1, 1, U1)
    t_len = frame_lens.astype(jnp.int32)[:, None, None]
    u_len = label_lens.astype(jnp.int32)[:, None, None]
    emit_ok = (u_ids < u_len) & (t_ids < t_len)
    blank_ok = (t_ids + 1 < t_len) & (u_ids <= u_len)
    lp_y_m = jnp.where(emit_ok, lp_y, NEG_INF)
    lp_blank_m = jnp.where(blank_ok, lp_blank, NEG_INF)
    return lp_blank_m, lp_y_m


def _alpha_scan(lp_blank_m, lp_y_m):
    """alpha: (B, T, U1) forward lattice scores via scan-over-T."""
    B, T, U1 = lp_blank_m.shape
    # Row 0: alpha[0, u] = sum_{j<u} lp_y[0, j].
    row0 = jnp.concatenate(
        [jnp.zeros((B, 1), lp_y_m.dtype),
         jnp.cumsum(lp_y_m[:, 0, :-1], axis=-1)],
        axis=-1,
    )
    row0 = jnp.maximum(row0, NEG_INF)  # cumsum over NEG_INF underflows; clamp

    def step(prev_row, xs):
        lpb_prev, lpy_t = xs  # lp_blank[t-1, :], lp_y[t, :]
        b_vec = prev_row + lpb_prev  # arrive from below (t-1, u)
        b_vec = jnp.maximum(b_vec, NEG_INF)
        c_vec = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF, lpy_t.dtype), lpy_t[:, :-1]], axis=-1
        )
        row = _solve_row(b_vec, c_vec)
        return row, row

    xs = (
        jnp.moveaxis(lp_blank_m[:, :-1, :], 1, 0),  # (T-1, B, U1)
        jnp.moveaxis(lp_y_m[:, 1:, :], 1, 0),
    )
    _, rows = jax.lax.scan(step, row0, xs, unroll=8)
    alpha = jnp.concatenate([row0[None], rows], axis=0)  # (T, B, U1)
    return jnp.moveaxis(alpha, 0, 1)  # (B, T, U1)


def _beta_scan(lp_blank_m, lp_y_m, accept):
    """beta: (B, T, U1) backward scores. `accept` injects the terminal blank.

    beta[t, u] = logaddexp(accept[t, u],
                           lp_blank[t, u] + beta[t+1, u],
                           lp_y[t, u] + beta[t, u+1])
    where accept[t, u] = lp_blank[t, u] iff (t, u) == (t_len-1, u_len).
    """
    B, T, U1 = lp_blank_m.shape

    def solve_row_rev(d_vec, c_vec):
        # a[u] = logaddexp(d[u], a[u+1] + c[u]); flip to reuse _solve_row.
        # After the flip the coefficient at position k is c[U1-1-k] — the
        # recurrence multiplies by c at the *destination* index, so no shift
        # (unlike alpha, where the coefficient is lp_y at u-1). k = 0 has no
        # predecessor: force its coefficient to NEG_INF.
        d_f = jnp.flip(d_vec, axis=-1)
        c_f = jnp.flip(c_vec, axis=-1)
        c_f = c_f.at[:, 0].set(NEG_INF)
        return jnp.flip(_solve_row(d_f, c_f), axis=-1)

    def step(next_row, xs):
        lpb_t, lpy_t, acc_t = xs
        d_vec = _logaddexp(acc_t, lpb_t + jnp.maximum(next_row, NEG_INF))
        d_vec = jnp.maximum(d_vec, NEG_INF)
        row = solve_row_rev(d_vec, lpy_t)
        return row, row

    xs = (
        jnp.moveaxis(lp_blank_m, 1, 0),
        jnp.moveaxis(lp_y_m, 1, 0),
        jnp.moveaxis(accept, 1, 0),
    )
    init = jnp.full((B, U1), NEG_INF, lp_blank_m.dtype)
    _, rows = jax.lax.scan(step, init, xs, reverse=True, unroll=8)
    return jnp.moveaxis(rows, 0, 1)  # (B, T, U1)


def _prepare(logits, labels, frame_lens, label_lens, blank):
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = log_probs[..., blank]  # (B, T, U1)
    lp_y = _gather_label_logprobs(log_probs, labels)  # (B, T, U1)
    lp_blank_m, lp_y_m = _masked_transitions(lp_blank, lp_y, frame_lens, label_lens)
    B, T, U1 = lp_blank.shape
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, None, :]
    is_terminal = (t_ids == frame_lens.astype(jnp.int32)[:, None, None] - 1) & (
        u_ids == label_lens.astype(jnp.int32)[:, None, None]
    )
    accept = jnp.where(is_terminal, lp_blank, NEG_INF)
    return log_probs, lp_blank, lp_y, lp_blank_m, lp_y_m, accept


def _accept_scores(lp_blank, frame_lens, label_lens):
    """The acceptance (terminal blank) score injected at (t_len-1, u_len)."""
    B, T, U1 = lp_blank.shape
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, None, :]
    is_terminal = (t_ids == frame_lens.astype(jnp.int32)[:, None, None] - 1) & (
        u_ids == label_lens.astype(jnp.int32)[:, None, None]
    )
    return jnp.where(is_terminal, lp_blank, NEG_INF)


def _use_wavefront() -> bool:
    """Whether to use the Pallas diagonal-wavefront lattice kernel
    (ops/rnnt_lattice_pallas.py) instead of the scan+associative-solve path.

    Measured on v5e (B=32, T=200, U=40): scan alpha 2.3 ms / beta 0.2 ms vs
    wavefront ~12 ms each — the T+U sequential fori steps with dynamic
    sublane indexing dominate, so the wavefront stays off by default and is
    kept as a tested alternative implementation (SURVEY.md §7.6). Set
    RNNT_TPU_WAVEFRONT=1 to opt in without editing source (VERDICT r2)."""
    import os
    return os.environ.get("RNNT_TPU_WAVEFRONT", "0") == "1"


def _alpha(lp_blank_m, lp_y_m):
    if _use_wavefront():
        from rnn_transducer_tpu.ops.rnnt_lattice_pallas import alpha_wavefront
        return alpha_wavefront(lp_blank_m, lp_y_m)
    return _alpha_scan(lp_blank_m, lp_y_m)


def _beta(lp_blank_m, lp_y_m, accept):
    if _use_wavefront():
        from rnn_transducer_tpu.ops.rnnt_lattice_pallas import beta_wavefront
        return beta_wavefront(lp_blank_m, lp_y_m, accept)
    return _beta_scan(lp_blank_m, lp_y_m, accept)


def forward_from_lp(lp_blank, lp_y, frame_lens, label_lens):
    """Loss from pre-extracted blank/label log-probs (B, T, U1)."""
    loss, _ = forward_from_lp_with_alpha(lp_blank, lp_y, frame_lens,
                                         label_lens)
    return loss


def forward_from_lp_with_alpha(lp_blank, lp_y, frame_lens, label_lens):
    """Like forward_from_lp, also returning alpha so a custom backward can
    reuse it instead of re-running the forward recursion."""
    lp_blank_m, lp_y_m = _masked_transitions(lp_blank, lp_y, frame_lens,
                                             label_lens)
    alpha = _alpha(lp_blank_m, lp_y_m)
    B = lp_blank.shape[0]
    b_idx = jnp.arange(B)
    # frame_lens == 0 (empty utterance) has no valid alignment: define its
    # loss as 0 with zero gradient instead of gathering at t = -1.
    valid = frame_lens.astype(jnp.int32) >= 1
    t_last = jnp.maximum(frame_lens.astype(jnp.int32), 1) - 1
    u_last = label_lens.astype(jnp.int32)
    log_z = alpha[b_idx, t_last, u_last] + lp_blank[b_idx, t_last, u_last]
    return jnp.where(valid, -log_z, 0.0), alpha


def occupancies_from_lp(lp_blank, lp_y, frame_lens, label_lens, alpha=None):
    """Blank/emit arc posteriors g_blank, g_y: (B, T, U1) each.

    d(-logZ)/d lp_blank = -g_blank; d(-logZ)/d lp_y = -g_y.
    Pass `alpha` (saved from the forward) to skip re-running its recursion.
    """
    lp_blank_m, lp_y_m = _masked_transitions(lp_blank, lp_y, frame_lens,
                                             label_lens)
    accept = _accept_scores(lp_blank, frame_lens, label_lens)
    if alpha is None:
        alpha = _alpha(lp_blank_m, lp_y_m)
    beta = _beta(lp_blank_m, lp_y_m, accept)
    B, T, U1 = lp_blank.shape
    log_z = beta[:, 0, 0]
    beta_down = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((B, 1, U1), NEG_INF, beta.dtype)], axis=1
    )
    arc_blank = _logaddexp(lp_blank_m + beta_down, accept)
    # Empty utterances (frame_lens == 0) have log_z = -inf; their loss is
    # defined as 0 (see forward_from_lp_with_alpha), so zero occupancies.
    valid = (frame_lens.astype(jnp.int32) >= 1)[:, None, None]
    g_blank = jnp.where(
        valid, jnp.exp(alpha + arc_blank - log_z[:, None, None]), 0.0)
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((B, T, 1), NEG_INF, beta.dtype)], axis=2
    )
    g_y = jnp.where(
        valid, jnp.exp(alpha + lp_y_m + beta_right - log_z[:, None, None]),
        0.0)
    return g_blank, g_y


def _forward(logits, labels, frame_lens, label_lens, blank):
    _, lp_blank, lp_y, *_ = _prepare(
        logits, labels, frame_lens, label_lens, blank
    )
    return forward_from_lp(lp_blank, lp_y, frame_lens, label_lens)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rnnt_loss(logits, labels, frame_lens, label_lens, blank=0,
              fastemit_lambda=0.0):
    """Per-utterance RNN-T negative log-likelihood.

    Args:
      logits: (B, T, U+1, V) joint-network outputs (any float dtype; the
        lattice runs in fp32).
      labels: (B, U) int target label ids (excluding blank).
      frame_lens: (B,) valid encoder frames per utterance.
      label_lens: (B,) valid labels per utterance.
      blank: blank label id (static).
      fastemit_lambda: FastEmit (Yu et al. 2021) low-latency streaming
        regularization strength (static). The loss VALUE is unchanged;
        in the backward the label-arc posterior gradient is scaled by
        (1 + lambda) while the blank-arc gradient is untouched, pushing
        probability mass toward earlier emission. 0.0 = exact NLL grad.

    Returns:
      (B,) fp32 losses. Mirrors the reference public API
      (`transducer_loss` per SURVEY.md §A) with per-utterance reduction.
    """
    return _forward(logits, labels, frame_lens, label_lens, blank)


def _fwd(logits, labels, frame_lens, label_lens, blank, fastemit_lambda):
    loss = _forward(logits, labels, frame_lens, label_lens, blank)
    return loss, (logits, labels, frame_lens, label_lens)


def _bwd(blank, fastemit_lambda, res, g):
    logits, labels, frame_lens, label_lens = res
    log_probs, lp_blank, lp_y, *_ = _prepare(
        logits, labels, frame_lens, label_lens, blank
    )
    g_blank, g_y = occupancies_from_lp(lp_blank, lp_y, frame_lens, label_lens)
    if fastemit_lambda:
        g_y = g_y * (1.0 + fastemit_lambda)
    B, T, U1, V = log_probs.shape

    # d(-logZ)/d logits[t,u,v] = p_v * (g_blank + g_y) - onehot contributions.
    occ = g_blank + g_y  # (B, T, U1)
    probs = jnp.exp(log_probs)
    grad = probs * occ[..., None]
    grad = grad.at[..., blank].add(-g_blank)
    # Scatter -g_y onto each position's target label (u < U only).
    U = U1 - 1
    lab = labels.astype(jnp.int32)[:, None, :]  # (B, 1, U)
    lab = jnp.broadcast_to(lab, (B, T, U))[..., None]  # (B, T, U, 1)
    upd = -g_y[:, :, :U, None]
    grad_head = grad[:, :, :U, :]
    grad_head = jnp.take_along_axis(grad_head, lab, axis=-1) + upd
    grad = grad.at[:, :, :U, :].set(
        jnp.put_along_axis(grad[:, :, :U, :], lab, grad_head, axis=-1,
                           inplace=False)
    )
    grad = grad * g[:, None, None, None]
    return grad.astype(logits.dtype), None, None, None


rnnt_loss.defvjp(_fwd, _bwd)


def rnnt_loss_mean(logits, labels, frame_lens, label_lens, blank=0,
                   fastemit_lambda=0.0):
    """Batch-mean RNN-T loss (training objective)."""
    return jnp.mean(rnnt_loss(logits, labels, frame_lens, label_lens, blank,
                              fastemit_lambda))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss_from_lp(lp_blank, lp_y, frame_lens, label_lens,
                      fastemit_lambda=0.0):
    """Per-utterance RNN-T loss from pre-extracted blank/label log-probs.

    Differentiable entry point for callers that build lp_blank/lp_y
    (B, T, U1) themselves — e.g. the vocab-parallel (TP) and
    frame-parallel (SP) joint+loss paths in parallel/tp.py, where the
    O(T·U·V) score extraction is sharded over the model axis and only
    these tiny score tensors reach the (replicated) lattice recursion.
    The backward is the occupancy gradient (no differentiation through
    the alpha scan): d(-logZ)/d lp_blank = -g_blank, d/d lp_y = -g_y.
    fastemit_lambda (static) scales the emit-arc gradient by (1 + lambda)
    — FastEmit regularization; the loss value itself is unchanged.
    """
    return forward_from_lp(lp_blank, lp_y, frame_lens, label_lens)


def _from_lp_fwd(lp_blank, lp_y, frame_lens, label_lens, fastemit_lambda):
    loss, alpha = forward_from_lp_with_alpha(lp_blank, lp_y, frame_lens,
                                             label_lens)
    return loss, (lp_blank, lp_y, frame_lens, label_lens, alpha)


def _from_lp_bwd(fastemit_lambda, res, g):
    lp_blank, lp_y, frame_lens, label_lens, alpha = res
    g_blank, g_y = occupancies_from_lp(lp_blank, lp_y, frame_lens,
                                       label_lens, alpha=alpha)
    if fastemit_lambda:
        g_y = g_y * (1.0 + fastemit_lambda)
    scale = g[:, None, None]
    return -g_blank * scale, -g_y * scale, None, None


rnnt_loss_from_lp.defvjp(_from_lp_fwd, _from_lp_bwd)
