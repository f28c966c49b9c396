"""Fused band joint for pruned RNN-T training: Pallas kernels.

The XLA pruned path (ops/rnnt_pruned.py) is bound by HBM round-trips of
the (B, T, S, V) band logits (written by the joint matmul, re-read by
log-softmax and the picks, recomputed + re-written as dlogits in the
backward). These kernels never materialize them: each (batch, time-tile)
grid step builds its (TILE_T, Sp, Vp) logits tile in VMEM from

    z = tanh(f[t] + g_w[t, s]),   logits = z @ W + b

and immediately reduces it to the (TILE_T, Sp) blank/label scores and
softmax normalizer the banded lattice needs. Only the tiny lp arrays and
the (B, T, Sp, J) gathered-predictor activations touch HBM.

Backward splits in two (VMEM discipline at large V):
  * kernel A — df, dg_w: W stays whole-resident (cdtype); dlogits is
    rebuilt per tile from the saved normalizer + the (TILE_T, Sp) loss
    cotangents and consumed by the dz matmul in-register.
  * kernel B — dW, db: the vocab axis is tiled and runs as the OUTER
    grid dimension, so each (J, V_tile) fp32 dW accumulator stays VMEM-
    resident across all (b, t) steps of its epoch and is flushed once.

Structure mirrors ops/rnnt_joint_fused.py (same Mosaic idioms: collapsed
sublane-aligned matmuls, iota-compare label selection, full-array minor
blocks for the (B, T, Sp) sidecars) with the band width Sp in the U1p
role and per-tile g_w instead of a shared g.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_transducer_tpu.ops.rnnt_joint_fused import _pad_axis, _prep_wb

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_t(sp: int, j: int, vp: int, w_bytes: int) -> int:
    """Largest time tile whose fwd/bwd-A VMEM footprint fits ~13 MB."""
    for tt in (16, 8, 4, 2, 1):
        tiles = 4 * tt * sp * vp * 4  # logits/probs/dlogits/epilogue f32
        if w_bytes + tiles + 2 * tt * sp * j * 4 < 13 * 1024 * 1024:
            return tt
    return 1


def band_fused_supported(sp: int, j: int, v: int,
                         compute_dtype=jnp.bfloat16) -> bool:
    vp = -(-v // LANE) * LANE
    w_bytes = j * vp * jnp.dtype(compute_dtype).itemsize
    return (_tile_t(sp, j, vp, w_bytes) >= 2
            and w_bytes + 4 * 2 * sp * vp * 4 < 13 * 1024 * 1024)


# ------------------------------ forward ----------------------------------

def _fwd_kernel(blank, cdtype, f_ref, gw_ref, lab_ref, w_ref, b_ref,
                lpb_ref, lpy_ref, base_ref):
    f = f_ref[0, 0]         # (TT, J)
    gw = gw_ref[0, 0]       # (TT, Sp, J)
    TT, Sp, J = gw.shape
    Vp = w_ref.shape[1]
    z = jnp.tanh(f[:, None, :] + gw)
    logits2 = jnp.dot(z.astype(cdtype).reshape(TT * Sp, J), w_ref[:],
                      preferred_element_type=jnp.float32)
    logits = logits2.reshape(TT, Sp, Vp) + b_ref[0][None, None, :]
    m = jnp.max(logits, axis=2, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=2, keepdims=True))
    base = (m + lse)[:, :, 0]                       # (TT, Sp)
    lab = lab_ref[0, 0]                             # (TT, Sp)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    sel = jnp.sum(jnp.where(col == lab[:, :, None], logits, 0.0), axis=2)
    lpb_ref[0, 0] = logits[:, :, blank] - base
    lpy_ref[0, 0] = sel - base
    base_ref[0, 0] = base


def _split_t(x, nT, tile_t):
    """(B, Tp, ...) -> (B, nT, tile_t, ...): the time tile moves onto a
    block-covered axis, so ANY tile_t satisfies Mosaic's (8, 128)
    last-two-dims rule (a block dim equal to the full array dim is
    always legal). Row-major contiguous — the reshape is free."""
    return x.reshape((x.shape[0], nT, tile_t) + x.shape[2:])


def band_lp_fwd(f, g_w, lab_w, w, b, blank, cdtype, tile_t):
    B, Tp, Sp, J = g_w.shape
    Vp = w.shape[1]
    nT = Tp // tile_t
    out_shape = jax.ShapeDtypeStruct((B, nT, tile_t, Sp), jnp.float32)
    out_spec = pl.BlockSpec((1, 1, tile_t, Sp), lambda b_, t: (b_, t, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, blank, cdtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, J), lambda b_, t: (b_, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, Sp, J),
                         lambda b_, t: (b_, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, Sp), lambda b_, t: (b_, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(_split_t(f, nT, tile_t), _split_t(g_w, nT, tile_t),
      _split_t(lab_w, nT, tile_t), w, b)
    return tuple(x.reshape(B, Tp, Sp) for x in outs)


# ---------------------- backward A: df, dg_w -----------------------------

def _bwd_a_kernel(blank, cdtype, f_ref, gw_ref, lab_ref, w_ref, b_ref,
                  base_ref, cb_ref, cy_ref, df_ref, dgw_ref):
    f = f_ref[0, 0]
    gw = gw_ref[0, 0]
    TT, Sp, J = gw.shape
    Vp = w_ref.shape[1]
    z = jnp.tanh(f[:, None, :] + gw)
    logits2 = jnp.dot(z.astype(cdtype).reshape(TT * Sp, J), w_ref[:],
                      preferred_element_type=jnp.float32)
    logits = logits2.reshape(TT, Sp, Vp) + b_ref[0][None, None, :]
    probs = jnp.exp(logits - base_ref[0, 0][:, :, None])
    lab = lab_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    cb = cb_ref[0, 0][:, :, None]   # d loss / d lpb  (TT, Sp, 1)
    cy = cy_ref[0, 0][:, :, None]
    # lp = logits[k] - lse: dlogits = cb*(onehot_blank - p) + cy*(onehot_lab - p)
    dlogits = (cb + cy) * (-probs)
    dlogits = dlogits + jnp.where(col == blank, cb, 0.0)
    dlogits = dlogits + jnp.where(col == lab[:, :, None], cy, 0.0)
    dl_c = dlogits.astype(cdtype)
    dz2 = jax.lax.dot_general(
        dl_c.reshape(TT * Sp, Vp), w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = dz2.reshape(TT, Sp, J) * (1.0 - z * z)
    df_ref[0, 0] = jnp.sum(dz, axis=1)
    dgw_ref[0, 0] = dz


def band_lp_bwd_a(f, g_w, lab_w, w, b, base, cb, cy, blank, cdtype, tile_t):
    B, Tp, Sp, J = g_w.shape
    Vp = w.shape[1]
    nT = Tp // tile_t
    side = pl.BlockSpec((1, 1, tile_t, Sp), lambda b_, t: (b_, t, 0, 0),
                        memory_space=pltpu.VMEM)
    df, dgw = pl.pallas_call(
        functools.partial(_bwd_a_kernel, blank, cdtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, J), lambda b_, t: (b_, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, Sp, J),
                         lambda b_, t: (b_, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            side,
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            side, side, side,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile_t, J), lambda b_, t: (b_, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, Sp, J),
                         lambda b_, t: (b_, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nT, tile_t, J), jnp.float32),
            jax.ShapeDtypeStruct((B, nT, tile_t, Sp, J), jnp.float32),
        ),
        interpret=_interpret(),
    )(_split_t(f, nT, tile_t), _split_t(g_w, nT, tile_t),
      _split_t(lab_w, nT, tile_t), w, b, _split_t(base, nT, tile_t),
      _split_t(cb, nT, tile_t), _split_t(cy, nT, tile_t))
    return df.reshape(B, Tp, J), dgw.reshape(B, Tp, Sp, J)


# ---------------------- backward B: dW, db (V-tiled) ----------------------

V_TILE = 2048


def _bwd_b_kernel(blank, cdtype, v_tile, f_ref, gw_ref, lab_ref, w_ref,
                  b_ref, base_ref, cb_ref, cy_ref, dw_ref, db_ref):
    v_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    t_idx = pl.program_id(2)
    f = f_ref[0, 0]
    gw = gw_ref[0, 0]
    TT, Sp, J = gw.shape
    Vt = w_ref.shape[1]
    z = jnp.tanh(f[:, None, :] + gw)
    z2 = z.astype(cdtype).reshape(TT * Sp, J)
    logits2 = jnp.dot(z2, w_ref[:], preferred_element_type=jnp.float32)
    logits = logits2.reshape(TT, Sp, Vt) + b_ref[0][None, None, :]
    probs = jnp.exp(logits - base_ref[0, 0][:, :, None])
    lab = lab_ref[0, 0]
    v0 = v_idx * v_tile
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2) + v0
    cb = cb_ref[0, 0][:, :, None]
    cy = cy_ref[0, 0][:, :, None]
    dlogits = (cb + cy) * (-probs)
    dlogits = dlogits + jnp.where(col == blank, cb, 0.0)
    dlogits = dlogits + jnp.where(col == lab[:, :, None], cy, 0.0)
    dl_c = dlogits.astype(cdtype)

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    dw_ref[:] += jax.lax.dot_general(
        z2, dl_c.reshape(TT * Sp, Vt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dlogits, axis=(0, 1), dtype=jnp.float32)


def band_lp_bwd_b(f, g_w, lab_w, w, b, base, cb, cy, blank, cdtype, tile_t):
    B, Tp, Sp, J = g_w.shape
    Vp = w.shape[1]
    vt = next(c for c in (V_TILE, 1024, 512, 256, 128) if Vp % c == 0) \
        if Vp > V_TILE else Vp
    nV = Vp // vt
    nT = Tp // tile_t
    side = pl.BlockSpec((1, 1, tile_t, Sp), lambda v_, b_, t: (b_, t, 0, 0),
                        memory_space=pltpu.VMEM)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_b_kernel, blank, cdtype, vt),
        grid=(nV, B, nT),
        in_specs=[
            pl.BlockSpec((1, 1, tile_t, J), lambda v_, b_, t: (b_, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t, Sp, J),
                         lambda v_, b_, t: (b_, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            side,
            pl.BlockSpec((J, vt), lambda v_, b_, t: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda v_, b_, t: (0, v_),
                         memory_space=pltpu.VMEM),
            side, side, side,
        ],
        out_specs=(
            pl.BlockSpec((J, vt), lambda v_, b_, t: (0, v_),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vt), lambda v_, b_, t: (0, v_),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((J, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        interpret=_interpret(),
    )(_split_t(f, nT, tile_t), _split_t(g_w, nT, tile_t),
      _split_t(lab_w, nT, tile_t), w, b, _split_t(base, nT, tile_t),
      _split_t(cb, nT, tile_t), _split_t(cy, nT, tile_t))
    return dw, db


# ------------------------------ public op --------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def band_lp_fused(f, g_w, w, b, lab_w, blank=0,
                  compute_dtype=jnp.bfloat16):
    """(lp_blank_w, lp_y_w): (B, T, Sp) band scores; logits never stored.

    f: (B, T, J); g_w: (B, T, Sp, J) predictor rows gathered per frame
    (Sp multiple of 8); w: (J, V); b: (V,); lab_w: (B, T, Sp) int32
    label id at each band cell (any id for cells the caller masks).
    Differentiable in f, g_w, w, b.
    """
    out, _ = _fused_fwd(f, g_w, w, b, lab_w, blank, compute_dtype)
    return out


def _prep(f, g_w, lab_w, w, b, compute_dtype, tile_t):
    f32 = _pad_axis(f.astype(jnp.float32), 1, tile_t)
    gw32 = _pad_axis(g_w.astype(jnp.float32), 1, tile_t)
    lab = _pad_axis(lab_w.astype(jnp.int32), 1, tile_t, value=-1)
    w_p, b_p = _prep_wb(w, b)
    return f32, gw32, lab, w_p.astype(compute_dtype), b_p


def _fused_fwd(f, g_w, w, b, lab_w, blank, compute_dtype):
    B, T, Sp, J = g_w.shape
    Vp = -(-w.shape[1] // LANE) * LANE
    tile_t = _tile_t(Sp, J, Vp, J * Vp * jnp.dtype(compute_dtype).itemsize)
    f32, gw32, lab, w_c, b_p = _prep(f, g_w, lab_w, w, b, compute_dtype,
                                     tile_t)
    lpb, lpy, base = band_lp_fwd(f32, gw32, lab, w_c, b_p, blank,
                                 compute_dtype, tile_t)
    markers = (jnp.zeros((0,), f.dtype), jnp.zeros((0,), g_w.dtype),
               jnp.zeros((0,), w.dtype), b)
    res = (f32, gw32, lab, w_c, b_p, base, markers)
    return (lpb[:, :T], lpy[:, :T]), res


def _fused_bwd(blank, compute_dtype, res, cts):
    f32, gw32, lab, w_c, b_p, base, markers = res
    f_mk, g_mk, w_mk, b_orig = markers
    cb, cy = cts
    B, Tp, Sp, J = gw32.shape
    T = cb.shape[1]
    V = b_orig.shape[0]
    tile_t = _tile_t(Sp, J, w_c.shape[1],
                     w_c.shape[1] * J * w_c.dtype.itemsize)
    cb = _pad_axis(cb.astype(jnp.float32), 1, tile_t)
    cy = _pad_axis(cy.astype(jnp.float32), 1, tile_t)
    df, dgw = band_lp_bwd_a(f32, gw32, lab, w_c, b_p, base, cb, cy,
                            blank, compute_dtype, tile_t)
    dw, db = band_lp_bwd_b(f32, gw32, lab, w_c, b_p, base, cb, cy,
                           blank, compute_dtype, tile_t)
    return (df[:, :T].astype(f_mk.dtype), dgw[:, :T].astype(g_mk.dtype),
            dw[:, :V].astype(w_mk.dtype), db[0, :V].astype(b_orig.dtype),
            None)


band_lp_fused.defvjp(_fused_fwd, _fused_bwd)
