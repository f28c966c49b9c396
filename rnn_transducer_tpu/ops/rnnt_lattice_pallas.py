"""Diagonal-wavefront Pallas kernel for the RNN-T alpha/beta recursions.

The XLA implementation (rnnt_loss.py) scans over T frames and solves each
row's label recurrence with an associative scan — ~T sequential XLA steps
with O(log U) depth each. This kernel runs the classic anti-diagonal
wavefront instead (SURVEY.md §7.6): in skewed coordinates A[d, u] =
alpha[d-u, u] every cell of diagonal d depends only on diagonal d-1,

    A[d] = logaddexp(inj[d], cb[d] + A[d-1], cy[d] + shift_u(A[d-1])),

so the whole lattice is T+U exact logaddexp steps of (B, U+1)-wide VPU
work with all operands VMEM-resident — no per-step dispatch, no
log-domain cumsum cancellation. The same kernel body serves beta: with
both axes reversed the backward recursion has the identical
diagonal-to-previous-diagonal shape, with the acceptance term entering
through the per-cell injection input. The skew/de-skew index gymnastics
are plain XLA gathers on the ~1 MB extracted score arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_transducer_tpu.ops.rnnt_loss import NEG_INF

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.maximum(m, NEG_INF)
    out = m_safe + jnp.log(
        jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    return jnp.where(m <= NEG_INF * 0.5, NEG_INF, out)


def _wavefront_kernel(D, cb_ref, cy_ref, inj_ref, a_ref):
    B_t = cb_ref.shape[0]
    U1p = cb_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (B_t, U1p), 1)

    def body(d, a_prev):
        cb = cb_ref[:, d, :]
        cy = cy_ref[:, d, :]
        inj = inj_ref[:, d, :]
        shifted = pltpu.roll(a_prev, 1, 1)
        shifted = jnp.where(col == 0, NEG_INF, shifted)
        a_new = _logaddexp3(inj, cb + a_prev, cy + shifted)
        a_ref[:, d, :] = a_new
        return a_new

    init = jnp.full((B_t, U1p), NEG_INF, jnp.float32)
    jax.lax.fori_loop(0, D, body, init)


def wavefront(cb_skew, cy_skew, inj_skew):
    """Run A[d] = logaddexp(inj[d], cb[d]+A[d-1], cy[d]+shift(A[d-1])).

    All inputs (B, D, U1p) fp32 in skewed coordinates; returns A with the
    same shape. D is padded to the sublane boundary by the caller.
    """
    B, D, U1p = cb_skew.shape
    B_t = B if B <= 32 else 32
    while B % B_t:
        B_t //= 2
    nB = B // B_t
    spec = pl.BlockSpec((B_t, D, U1p), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wavefront_kernel, D),
        grid=(nB,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, D, U1p), jnp.float32),
        interpret=_interpret(),
    )(cb_skew, cy_skew, inj_skew)


def _pad_lanes_u(x, U1p):
    U1 = x.shape[-1]
    if U1p == U1:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, U1p - U1)),
                   constant_values=NEG_INF)


def _gather_t(x, t_idx):
    """x: (B, T, U1p); t_idx: (D, U1p) -> (B, D, U1p), NEG_INF out of range."""
    B, T, U1p = x.shape
    ok = (t_idx >= 0) & (t_idx < T)
    idx = jnp.clip(t_idx, 0, T - 1)[None].astype(jnp.int32)
    idx = jnp.broadcast_to(idx, (B,) + t_idx.shape)
    out = jnp.take_along_axis(x, idx, axis=1)
    return jnp.where(ok[None], out, NEG_INF)


def alpha_wavefront(lp_blank_m, lp_y_m):
    """alpha (B, T, U1) via the wavefront kernel. Exact logaddexp math."""
    B, T, U1 = lp_blank_m.shape
    U1p = U1  # lanes: block covers the full (padded) label axis
    D = T + U1 - 1
    Dp = -(-D // 8) * 8
    d_ids = jnp.arange(Dp, dtype=jnp.int32)[:, None]
    u_ids = jnp.arange(U1p, dtype=jnp.int32)[None, :]
    # cb[d, u] = lp_blank_m[d-1-u, u] ; cy[d, u] = lp_y_m[d-u, u-1]
    cb = _gather_t(lp_blank_m, d_ids - 1 - u_ids)
    lpy_sh = jnp.pad(lp_y_m[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                     constant_values=NEG_INF)
    cy = _gather_t(lpy_sh, d_ids - u_ids)
    inj = jnp.where((d_ids == 0) & (u_ids == 0), 0.0, NEG_INF)
    inj = jnp.broadcast_to(inj[None], (B, Dp, U1p))
    A = wavefront(cb, cy, inj)
    # de-skew: alpha[t, u] = A[t+u, u]
    t_ids = jnp.arange(T, dtype=jnp.int32)[:, None]
    d_of = jnp.broadcast_to((t_ids + jnp.arange(U1)[None, :])[None],
                            (B, T, U1)).astype(jnp.int32)
    return jnp.take_along_axis(A, d_of, axis=1)


def beta_wavefront(lp_blank_m, lp_y_m, accept):
    """beta (B, T, U1): both axes reversed -> same diagonal structure."""
    B, T, U1 = lp_blank_m.shape
    rev = lambda x: jnp.flip(jnp.flip(x, axis=1), axis=2)
    lpb_r = rev(lp_blank_m)
    lpy_r = rev(lp_y_m)
    acc_r = rev(accept)
    D = T + U1 - 1
    Dp = -(-D // 8) * 8
    d_ids = jnp.arange(Dp, dtype=jnp.int32)[:, None]
    u_ids = jnp.arange(U1, dtype=jnp.int32)[None, :]
    # Coefficients sit at the destination cell (unlike alpha, where the
    # emit coefficient is indexed at the source u-1): cb[d,v] = lpb'[d-v,v],
    # cy[d,v] = lpy'[d-v,v] pairing with A[d-1, v-1].
    cb = _gather_t(lpb_r, d_ids - u_ids)
    cy = _gather_t(lpy_r, d_ids - u_ids)
    inj = _gather_t(acc_r, d_ids - u_ids)
    A = wavefront(cb, cy, inj)
    t_ids = jnp.arange(T, dtype=jnp.int32)[:, None]
    d_of = jnp.broadcast_to((t_ids + jnp.arange(U1)[None, :])[None],
                            (B, T, U1)).astype(jnp.int32)
    beta_rev = jnp.take_along_axis(A, d_of, axis=1)
    return rev(beta_rev)
