"""Fused LayerNorm Pallas kernels for the conformer's LN chain.

The conformer block normalizes six times (five block LNs + the conv
module's), each over the f32 residual stream. XLA lowers each `_ln` +
its backward as several full (B, T, D) HBM passes; at libri100_conformer
B=64 the elementwise loop-fusion category measures 8.8 ms of the 33.5 ms
step, with the LN chain priced at ~3-4 MFU points (docs/PERFORMANCE.md
round-4 HLO breakdown). These kernels cut each LN to the minimum
traffic: forward = one read + one write (+ two (N,1) stat sidecars);
backward = read x/dy, write dx, with dgamma/dbeta accumulated in VMEM
across the sequential grid. An optional fused silu epilogue serves the
conv module's LN -> swish pair without materializing the pre-activation.

OPT-IN via `RNNT_FUSED_LN=1` (see `fused_ln_enabled`): the round-5
order-controlled A/B measured the kernel slightly SLOWER end-to-end
(conformer step 34.1 ms vs 33.1 ms, controlled reps) — the per-LN
pallas_call boundary costs XLA the producer/consumer fusions it
otherwise builds around each LN, which outweighs the kernel's saved
HBM passes at these shapes. Kept as a
tested, numerically-exact alternative (the same trade could flip for
much larger d_model or longer chains). CPU tests exercise the kernels
in interpret mode via the dedicated parity tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
ROWS = 256  # rows (B*T) per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_ln_enabled(d: int) -> bool:
    """OPT-IN (RNNT_FUSED_LN=1) after the round-5 A/B: the kernel is
    numerically exact on chip (bitwise forward vs the XLA form) but the
    conformer step measured 34.1 ms with it vs 33.1 ms without
    (controlled reps) — the pallas_call boundaries around every LN stop
    XLA from fusing the LN chain into its elementwise/matmul neighbors,
    and that lost fusion slightly outweighs the kernel's saved passes.
    Recorded in docs/PERFORMANCE.md (round-5 failed experiment)."""
    if os.environ.get("RNNT_FUSED_LN", "0") != "1":
        return False
    return jax.default_backend() == "tpu" and d % 128 == 0


def _fwd_kernel(act, x_ref, g_ref, b_ref, y_ref, mu_ref, rs_ref):
    x = x_ref[:]                                   # (ROWS, D) f32
    d = x.shape[1]
    mu = jnp.mean(x, axis=1, keepdims=True)        # (ROWS, 1)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + EPS)
    y = xc * rstd * g_ref[0][None, :] + b_ref[0][None, :]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    y_ref[:] = y
    mu_ref[:] = mu
    rs_ref[:] = rstd


def _bwd_kernel(act, x_ref, g_ref, b_ref, mu_ref, rs_ref, dy_ref,
                dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)
    x = x_ref[:]
    g = g_ref[0][None, :]
    mu = mu_ref[:]
    rstd = rs_ref[:]
    xhat = (x - mu) * rstd
    dy = dy_ref[:]
    if act == "silu":
        # recompute the pre-activation y (VPU, no extra HBM) and chain
        # dsilu(y) = sigmoid(y) * (1 + y * (1 - sigmoid(y)))
        y = xhat * g + b_ref[0][None, :]
        s = jax.nn.sigmoid(y)
        dy = dy * (s * (1.0 + y * (1.0 - s)))

    @pl.when(i == 0)
    def _():
        dg_ref[:] = jnp.zeros_like(dg_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    dg_ref[0] += jnp.sum(dy * xhat, axis=0)
    db_ref[0] += jnp.sum(dy, axis=0)
    a = dy * g
    m1 = jnp.mean(a, axis=1, keepdims=True)
    m2 = jnp.mean(a * xhat, axis=1, keepdims=True)
    dx_ref[:] = rstd * (a - m1 - xhat * m2)


def _rows_pad(x2, rows):
    n = x2.shape[0]
    np_ = -(-n // rows) * rows
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))
    return x2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, g, b, act="none"):
    """LayerNorm over the last axis (optionally fused with silu).

    x: (..., D) float32; g/b: (D,). Matches `(x - mean) * rsqrt(var +
    1e-6) * g + b` (then silu when act="silu") to fp32 tolerance.
    """
    return _fln_fwd(x, g, b, act)[0]


def _fln_call_fwd(x2, g, b, act):
    n, d = x2.shape
    grid = (n // ROWS,)
    row_spec = pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=(row_spec, stat_spec, stat_spec),
        out_shape=(jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        interpret=_interpret(),
    )(x2, g.reshape(1, d), b.reshape(1, d))


def _fln_fwd(x, g, b, act):
    shape = x.shape
    d = shape[-1]
    x2 = _rows_pad(x.astype(jnp.float32).reshape(-1, d), ROWS)
    y, mu, rstd = _fln_call_fwd(x2, g.astype(jnp.float32),
                                b.astype(jnp.float32), act)
    n = 1
    for s in shape[:-1]:
        n *= s
    out = y[:n].reshape(shape)
    return out, (x2, g, b, mu, rstd, shape)


def _fln_bwd(act, res, dy):
    x2, g, b, mu, rstd, shape = res
    d = shape[-1]
    n = x2.shape[0]
    dy2 = _rows_pad(dy.astype(jnp.float32).reshape(-1, d), ROWS)
    grid = (n // ROWS,)
    row_spec = pl.BlockSpec((ROWS, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, act),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec, stat_spec, stat_spec,
                  row_spec],
        out_specs=(row_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((n, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=_interpret(),
    )(x2, g.astype(jnp.float32).reshape(1, d),
      b.astype(jnp.float32).reshape(1, d), mu, rstd, dy2)
    ntrue = 1
    for s in shape[:-1]:
        ntrue *= s
    return (dx[:ntrue].reshape(shape), dg[0].astype(g.dtype),
            db[0].astype(b.dtype))


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
