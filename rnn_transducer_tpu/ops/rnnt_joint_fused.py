"""Fully-fused joint-network + RNN-T loss Pallas kernels.

The lattice logits (B, T, U+1, V) are the largest tensor in RNN-T training
(~1 GB at LibriSpeech shapes) and, in the unfused pipeline, are written by
the joint matmul, re-read by the loss forward, and re-read + re-written by
the loss backward — 4+ lattice-sized HBM passes. These kernels never
materialize them: each (batch, time-tile) grid step builds its logits tile
in VMEM from the per-side joint activations

    z = tanh(f[t] + g[u]),   logits = z @ W + b

and immediately reduces it to what the lattice recursion needs
(log-sum-exp + blank/label scores, forward) or consumes the occupancy
posteriors to emit df, dg, dW, db directly (backward) — dW/dg/db are
accumulated in VMEM across the sequentially-executed grid steps. Total HBM
traffic drops from ~4 lattice passes to the (B,T,J)+(B,U,J) activations.

f: (B, T, J) = enc_proj(enc_out) + b_enc;  g: (B, U1p, J) = pred_proj(...)
with U1p = U+1 padded to a multiple of 8 (sublane alignment; pad rows
carry label id -1 and zero occupancy). V is padded to the 128-lane
boundary (zero weights, -inf bias, so pad vocab never scores). The
(T+U)-step alpha/beta recursions stay in XLA on the tiny extracted
(B, T, U1) arrays (rnnt_loss.py).

Replaces the reference's joint `nn.Linear` + warp-rnnt pairing
(SURVEY.md §2 rows 4-5) with a single TPU-native fused op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_transducer_tpu.ops.rnnt_loss import (
    NEG_INF,
    forward_from_lp_with_alpha,
    occupancies_from_lp,
)

TILE_T = 8       # backward tile
TILE_T_FWD = 16  # forward tile (separate: fwd VMEM footprint is smaller)
LANE = 128

# Backward-kernel variant. Round-5 default is "pipe": the grid runs one
# step longer and each step overlaps tile t's VPU epilogue with tile
# t-1's dz/dW matmuls through double-buffered VMEM scratch
# (_bwd_kernel_pipe). Order-controlled A/B on the libri100 headline
# (fresh process per variant, both orders, idle chip — the CLAUDE.md
# protocol): pipe 13.2/13.3 ms (47.1/46.8% MFU) vs v1 13.4/13.5 ms
# (46.4/46.3%) — a consistent ~0.2 ms win with BITWISE-identical
# grads on chip (same per-tile partials accumulated in the same
# order). The modest size of the win is itself informative: the
# serialized-VPU term the round-2 roofline priced at ~3 ms is mostly
# gone since the saved-normalizer change, so the backward now sits
# near its MXU floor (docs/PERFORMANCE.md round-5 log).
# Round-4's "t8v2"/"t16v2" vocab-chunked variants measured SLOWER
# (44-45%: per-chunk W re-streams) and remain env-selectable; vocabs
# whose Vp/2 is not lane-aligned fall back to v1 automatically
# (joint_lp_bwd) — a 64-wide lane slice does not lower on hardware.
import os as _os

_BWD_VARIANT = _os.environ.get("RNNT_FUSED_BWD", "pipe")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fused_supported(u1: int, j: int, v: int) -> bool:
    """Rough VMEM feasibility check for the fused kernels.

    The backward holds ~4 (TILE_T, U1p, Vp) f32 tiles (logits/probs/
    dlogits + epilogue) plus z and the weights; reject configs that cannot
    fit so callers fall back to the two-pass Pallas loss.
    """
    u1p = -(-u1 // 8) * 8
    vp = -(-v // LANE) * LANE
    jbytes = j * vp * 4 + j * vp * 4  # W (compute) + dW accumulator
    tile_bytes = 4 * TILE_T * u1p * vp * 4 + 2 * TILE_T * u1p * j * 4
    return jbytes + tile_bytes < 12 * 1024 * 1024


def _pad_axis(x, axis, mult, value=0.0):
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)


def _joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype):
    """z (tile, U1p, J) f32 and logits (tile, U1p, Vp) f32 in VMEM.

    The matmul runs on the sublane-collapsed 2D view (tile*U1p, J) — U1p is
    a multiple of 8, so the collapse/split are free relayouts and the MXU
    sees one tall matmul instead of a batched 3D contraction.
    """
    f = f_ref[0]  # (tile, J)
    g = g_ref[0]  # (U1p, J)
    tile, U1p, J = f.shape[0], g.shape[0], g.shape[1]
    Vp = w_ref.shape[1]
    z = jnp.tanh(f[:, None, :] + g[None, :, :])
    logits2 = jnp.dot(z.astype(cdtype).reshape(tile * U1p, J), w_ref[:],
                      preferred_element_type=jnp.float32)
    logits = logits2.reshape(tile, U1p, Vp)
    return z, logits + b_ref[0][None, None, :]


# --------------------------- forward kernel ------------------------------

def _fwd_kernel(blank, cdtype, f_ref, g_ref, lab_ref, w_ref, b_ref,
                lpb_ref, lpy_ref, base_ref):
    _, logits = _joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
    m = jnp.max(logits, axis=2, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=2, keepdims=True))
    base = (m + lse)[:, :, 0]  # (TILE_T, U1p)
    lab = lab_ref[0, 0, :]  # (U1p,)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    onehot = col == lab[None, :, None]
    sel = jnp.sum(jnp.where(onehot, logits, 0.0), axis=2)  # (TILE_T, U1p)
    lpb_ref[0] = logits[:, :, blank] - base
    lpy_ref[0] = jnp.where(lab[None, :] >= 0, sel - base, NEG_INF)
    base_ref[0] = base  # saved for the backward: probs = exp(logits - base)


def joint_lp_fwd(f, g, labels_pad, w, b, blank, cdtype):
    """-> (lp_blank, lp_y, base): (B, Tp, U1p) f32; logits never stored.

    base = log-sum-exp of each cell's logits row — the softmax
    normalizer, saved so the backward kernel skips the max/sum/divide
    recomputation (two full 128-lane reductions per tile on the VPU).
    """
    B, T, J = f.shape
    U1p = g.shape[1]
    Vp = w.shape[1]
    nT = -(-T // TILE_T_FWD)
    out_shape = jax.ShapeDtypeStruct((B, nT * TILE_T_FWD, U1p), jnp.float32)
    out_spec = pl.BlockSpec((1, TILE_T_FWD, U1p), lambda b_, t: (b_, t, 0),
                            memory_space=pltpu.VMEM)
    lpb, lpy, base = pl.pallas_call(
        functools.partial(_fwd_kernel, blank, cdtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, TILE_T_FWD, J), lambda b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(f, g, labels_pad, w, b)
    return lpb[:, :T], lpy[:, :T], base[:, :T]


# --------------------------- backward kernel -----------------------------

def _bwd_kernel_vc(blank, cdtype, tile_t, nvc, f_ref, g_ref, lab_ref,
                   w_ref, b_ref, gb_ref, gy_ref, base_ref, gbar_ref,
                   df_ref, dg_ref, dw_ref, db_ref):
    """Vocab-chunked backward tile (round-4 experiment).

    Identical math to _bwd_kernel, but the (tile_t, U1p, Vp) epilogue is
    split into `nvc` static vocab chunks. Two effects under test:
    (a) halved VMEM residency per chunk lets tile_t grow 8 -> 16, halving
    the sequential grid (and the per-grid-step W re-streams of the logits
    and dz matmuls); (b) chunk c+1's VPU epilogue (exp + dlogits
    assembly) is data-independent of chunk c's dz/dW matmuls, giving
    Mosaic's scheduler two chains to overlap where the monolithic tile
    serializes VPU and MXU by data dependence.
    """
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    f = f_ref[0]  # (tile_t, J)
    g = g_ref[0]  # (U1p, J)
    U1p, J = g.shape
    Vp = w_ref.shape[1]
    Vc = Vp // nvc
    z = jnp.tanh(f[:, None, :] + g[None, :, :])
    z2 = z.astype(cdtype).reshape(tile_t * U1p, J)
    s = gbar_ref[0, 0, 0]
    occ_s = ((gb_ref[0] + gy_ref[0]) * s)[:, :, None]
    gb_s = (gb_ref[0] * s)[:, :, None]
    gy_s = (gy_ref[0] * s)[:, :, None]
    lab = lab_ref[0, 0, :]
    base = base_ref[0][:, :, None]

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    dz2 = jnp.zeros((tile_t * U1p, J), jnp.float32)
    for c in range(nvc):
        sl = slice(c * Vc, (c + 1) * Vc)
        w_c = w_ref[:, sl]
        # b_ref[0][..., sl] would partial-slice a rank-1 vector, which
        # Mosaic lowers as a 1D gather ("Only 2D gather is supported");
        # slice the 2D ref instead and broadcast the (1, Vc) row.
        logits = (jnp.dot(z2, w_c, preferred_element_type=jnp.float32)
                  .reshape(tile_t, U1p, Vc) + b_ref[:, sl][None])
        probs = jnp.exp(logits - base)
        col = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 2) + c * Vc
        dlogits = probs * occ_s
        dlogits = dlogits - jnp.where(col == blank, gb_s, 0.0)
        dlogits = dlogits - jnp.where(col == lab[None, :, None], gy_s, 0.0)
        dl2 = dlogits.astype(cdtype).reshape(tile_t * U1p, Vc)
        dz2 = dz2 + jax.lax.dot_general(
            dl2, w_c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_ref[:, sl] += jax.lax.dot_general(
            z2, dl2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # rank-2 access: db_ref[0, sl] would lower as a 1D gather, which
        # Mosaic rejects ("Only 2D gather is supported")
        db_ref[:, sl] += jnp.sum(dlogits, axis=(0, 1),
                                 dtype=jnp.float32)[None, :]

    dz = dz2.reshape(tile_t, U1p, J) * (1.0 - z * z)
    df_ref[0] = jnp.sum(dz, axis=1)

    @pl.when(t_idx == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dg_ref[0] += jnp.sum(dz, axis=0)


def _bwd_kernel_pipe(blank, cdtype, nT, f_ref, g_ref, lab_ref, w_ref,
                     b_ref, gb_ref, gy_ref, base_ref, gbar_ref,
                     df_ref, dg_ref, dw_ref, db_ref, z_s, dl_s):
    """Software-pipelined backward (round-5, the lever named in
    docs/PERFORMANCE.md's round-4 floor analysis).

    The monolithic tile serializes VPU and MXU by data dependence:
    tanh -> logits matmul -> exp/dlogits assembly (VPU) -> dz/dW matmuls.
    Here the grid runs one step longer (nT+1) and each step t executes
    two data-INDEPENDENT stages Mosaic's scheduler can interleave:

      stage A (t < nT): tile t's logits matmul + VPU epilogue; the f32
        z and bf16 dlogits land in double-buffered VMEM scratch.
      stage B (t > 0): tile t-1's dz and dW matmuls straight from
        scratch — no VPU dependence inside this step.

    Stage A's big VPU chain (exp + dlogits assembly, the ~3 ms the
    roofline charges as serialized) overlaps stage B's MXU work. Every
    per-tile partial is accumulated in the same t order as v1, so
    df/dg/dw/db are bitwise identical. Costs 2 extra scratch buffers
    (~3 MB at libri100 shapes) and one drain step per batch row.
    """
    t_idx = pl.program_id(1)
    b_idx = pl.program_id(0)
    U1p, J = g_ref.shape[1], g_ref.shape[2]
    Vp = w_ref.shape[1]
    tile_t = f_ref.shape[1]

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    @pl.when(t_idx == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    @pl.when(t_idx < nT)
    def _stage_a():
        p = jax.lax.rem(t_idx, 2)
        z, logits = _joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
        probs = jnp.exp(logits - base_ref[0][:, :, None])
        lab = lab_ref[0, 0, :]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        s = gbar_ref[0, 0, 0]
        occ_s = ((gb_ref[0] + gy_ref[0]) * s)[:, :, None]
        gb_s = (gb_ref[0] * s)[:, :, None]
        gy_s = (gy_ref[0] * s)[:, :, None]
        dlogits = probs * occ_s
        dlogits = dlogits - jnp.where(col == blank, gb_s, 0.0)
        dlogits = dlogits - jnp.where(col == lab[None, :, None], gy_s, 0.0)
        db_ref[0] += jnp.sum(dlogits, axis=(0, 1), dtype=jnp.float32)
        z_s[p] = z
        dl_s[p] = dlogits.astype(cdtype)

    @pl.when(t_idx > 0)
    def _stage_b():
        q = jax.lax.rem(t_idx + 1, 2)  # (t-1) % 2
        z = z_s[q]
        dl2 = dl_s[q].reshape(tile_t * U1p, Vp)
        dz2 = jax.lax.dot_general(
            dl2, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = dz2.reshape(tile_t, U1p, J) * (1.0 - z * z)
        df_ref[0] = jnp.sum(dz, axis=1)
        dg_ref[0] += jnp.sum(dz, axis=0)
        z2 = z.astype(cdtype).reshape(tile_t * U1p, J)
        dw_ref[:] += jax.lax.dot_general(
            z2, dl2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_kernel(blank, cdtype, f_ref, g_ref, lab_ref, w_ref, b_ref,
                gb_ref, gy_ref, base_ref, gbar_ref,
                df_ref, dg_ref, dw_ref, db_ref):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    z, logits = _joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
    # softmax from the forward's saved normalizer: no max/sum reductions
    # or divide on the (TILE_T, U1p, Vp) tile here
    probs = jnp.exp(logits - base_ref[0][:, :, None])
    lab = lab_ref[0, 0, :]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
    # the loss cotangent enters on the tiny (TILE_T, U1p) sidecars, not
    # as pre-scaled full arrays (saves three XLA passes + one lattice-
    # sidecar HBM input per step). The dlogits assembly stays f32: Mosaic
    # cannot broadcast a 16-bit (T, U, 1) vector against the i1 select
    # masks ("Invalid relayout ... replicated in destination but not in
    # source"), so a bf16 epilogue does not lower; only the final matmul
    # operand cast is in cdtype.
    s = gbar_ref[0, 0, 0]
    occ_s = ((gb_ref[0] + gy_ref[0]) * s)[:, :, None]   # (TILE_T, U1p, 1)
    gb_s = (gb_ref[0] * s)[:, :, None]
    gy_s = (gy_ref[0] * s)[:, :, None]
    dlogits = probs * occ_s
    dlogits = dlogits - jnp.where(col == blank, gb_s, 0.0)
    dlogits = dlogits - jnp.where(col == lab[None, :, None], gy_s, 0.0)
    dl_c = dlogits.astype(cdtype)
    # dz = (dlogits @ W^T) * (1 - z^2), on the collapsed 2D view
    U1p_, J_ = z.shape[1], z.shape[2]
    Vp_ = dl_c.shape[2]
    dz2 = jax.lax.dot_general(
        dl_c.reshape(TILE_T * U1p_, Vp_), w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = dz2.reshape(TILE_T, U1p_, J_) * (1.0 - z * z)
    df_ref[0] = jnp.sum(dz, axis=1)

    @pl.when(t_idx == 0)
    def _():
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dg_ref[0] += jnp.sum(dz, axis=0)

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    # dW += z^T @ dlogits over the (t, u) tile. Mosaic only supports a
    # single contracting dim; collapse the sublane-aligned (t, u) dims
    # (U1p is a multiple of 8) into one contraction axis.
    U1p = z.shape[1]
    J = z.shape[2]
    Vp = dl_c.shape[2]
    z2 = z.astype(cdtype).reshape(TILE_T * U1p, J)
    dl2 = dl_c.reshape(TILE_T * U1p, Vp)
    dw_ref[:] += jax.lax.dot_general(
        z2, dl2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[0] += jnp.sum(dlogits, axis=(0, 1), dtype=jnp.float32)


def joint_lp_bwd(f, g, labels_pad, w, b, gb, gy, base, gbar, blank, cdtype):
    """-> (df, dg, dw, db); dW/dg/db accumulate across the sequential grid.

    gb/gy are the UNSCALED blank/emit occupancies; `gbar` (B,) is the loss
    cotangent, applied inside the kernel on the (TILE_T, U1p) sidecars.
    """
    B, T, J = f.shape
    U1p = g.shape[1]
    Vp = w.shape[1]
    variant = _BWD_VARIANT
    if variant == "pipe":
        # the pipeline's double-buffered z/dlogits scratch rides on top
        # of the v1 working set; the libri100 total (15.0 MB by this
        # estimate) is measured to fit scoped VMEM, so 15.5 MB is the
        # calibrated ceiling — bigger (U1p, J, Vp) products fall back
        # to the monolithic tile rather than OOM.
        v1_est = (2 * J * Vp * 4 + 4 * TILE_T * U1p * Vp * 4
                  + 2 * TILE_T * U1p * J * 4)
        scratch = 2 * TILE_T * U1p * (J * 4 + Vp * 2)
        if v1_est + scratch > 15.5 * 1024 * 1024:
            variant = "v1"
    if variant in ("t8v2", "t16v2") and not (
            Vp % 2 == 0 and (Vp // 2) % LANE == 0):
        # Vocab too small to chunk: each chunk's lane slice of w/b (and
        # the per-chunk dlogits matmul operands) must be 128-lane-aligned
        # or Mosaic rejects the lowering on hardware. Vp <= 128 also gains
        # nothing from chunking. Fall back to the monolithic tile.
        variant = "v1"
    tile_t = 16 if variant == "t16v2" else TILE_T
    nvc = {"t16v2": 2, "t8v2": 2}.get(variant)
    kern = (functools.partial(_bwd_kernel_vc, blank, cdtype, tile_t, nvc)
            if nvc else functools.partial(_bwd_kernel, blank, cdtype))
    nT = -(-T // tile_t)
    if T % tile_t:
        # zero-pad time so tail tiles contribute zero occupancy; pad base
        # LARGE so exp(logits - base) underflows to exactly 0 there
        f = _pad_axis(f, 1, tile_t)
        gb = _pad_axis(gb, 1, tile_t)
        gy = _pad_axis(gy, 1, tile_t)
        base = _pad_axis(base, 1, tile_t, value=1.0e9)
    Tp = f.shape[1]
    if variant == "pipe":
        return _joint_lp_bwd_pipe(f, g, labels_pad, w, b, gb, gy, base,
                                  gbar, blank, cdtype, nT, T)
    occ_spec = pl.BlockSpec((1, tile_t, U1p), lambda b_, t: (b_, t, 0),
                            memory_space=pltpu.VMEM)
    df, dg, dw, db = pl.pallas_call(
        kern,
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, tile_t, J), lambda b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            occ_spec, occ_spec, occ_spec,
            pl.BlockSpec((1, 1, 1), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_t, J), lambda b_, t: (b_, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, J), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, J), jnp.float32),
            jax.ShapeDtypeStruct((J, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        interpret=_interpret(),
    )(f, g, labels_pad, w, b, gb, gy, base,
      gbar.astype(jnp.float32).reshape(B, 1, 1))
    return df[:, :T], dg, dw, db


def _joint_lp_bwd_pipe(f, g, labels_pad, w, b, gb, gy, base, gbar, blank,
                       cdtype, nT, T):
    """pallas_call plumbing for the software-pipelined backward.

    Grid is (B, nT+1): step nT only drains the pipeline (stage B for the
    last tile). Stage-A input blocks clamp to tile nT-1 on the drain
    step; the df output block lags one step behind the grid index.
    """
    B = f.shape[0]
    J = f.shape[2]
    U1p = g.shape[1]
    Vp = w.shape[1]
    tile_t = TILE_T
    Tp = f.shape[1]
    a_idx = lambda b_, t: (b_, jnp.minimum(t, nT - 1), 0)
    occ_spec = pl.BlockSpec((1, tile_t, U1p), a_idx,
                            memory_space=pltpu.VMEM)
    df, dg, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel_pipe, blank, cdtype, nT),
        grid=(B, nT + 1),
        in_specs=[
            pl.BlockSpec((1, tile_t, J), a_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            occ_spec, occ_spec, occ_spec,
            pl.BlockSpec((1, 1, 1), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_t, J),
                         lambda b_, t: (b_, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b_, t: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, J), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, J), jnp.float32),
            jax.ShapeDtypeStruct((J, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_t, U1p, J), jnp.float32),
            pltpu.VMEM((2, tile_t, U1p, Vp), cdtype),
        ],
        interpret=_interpret(),
    )(f, g, labels_pad, w, b, gb, gy, base,
      gbar.astype(jnp.float32).reshape(B, 1, 1))
    return df[:, :T], dg, dw, db


# ------------------------------ public op --------------------------------

def _prep_labels(labels, U1p):
    """(B, U) labels -> (B, 1, U1p) padded with -1 at u >= U."""
    B, U = labels.shape
    return jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.full((B, U1p - U), -1, jnp.int32)], axis=1)[:, None, :]


def _prep_wb(w, b):
    V = w.shape[1]
    w_p = _pad_axis(w.astype(jnp.float32), 1, LANE, 0.0)
    b_p = _pad_axis(b.astype(jnp.float32).reshape(1, V), 1, LANE, NEG_INF)
    return w_p, b_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def rnnt_loss_fused(f, g, w, b, labels, frame_lens, label_lens, blank=0,
                    compute_dtype=jnp.bfloat16, fastemit_lambda=0.0):
    """Per-utterance RNN-T loss from joint activations; logits never stored.

    f: (B, T, J) encoder-side joint activation (projection + bias applied).
    g: (B, U+1, J) predictor-side activation. w: (J, V), b: (V,).
    fastemit_lambda (static): FastEmit regularization — the emit-arc
    posteriors feeding the backward kernel are scaled by (1 + lambda) in
    the XLA glue (kernel unchanged); the loss value is the exact NLL.
    """
    loss, _ = _fused_fwd(f, g, w, b, labels, frame_lens, label_lens, blank,
                         compute_dtype, fastemit_lambda)
    return loss


def _fused_fwd(f, g, w, b, labels, frame_lens, label_lens, blank,
               compute_dtype, fastemit_lambda=0.0):
    U1 = g.shape[1]
    U1p = -(-U1 // 8) * 8
    f32 = f.astype(jnp.float32)
    g_p = _pad_axis(g.astype(jnp.float32), 1, 8)
    w_p, b_p = _prep_wb(w, b)
    lab = _prep_labels(labels, U1p)
    w_c = w_p.astype(compute_dtype)
    lpb, lpy, base = joint_lp_fwd(f32, g_p, lab, w_c, b_p, blank,
                                  compute_dtype)
    lpb = lpb[:, :, :U1]
    lpy = lpy[:, :, :U1]
    loss, alpha = forward_from_lp_with_alpha(lpb, lpy, frame_lens,
                                             label_lens)
    # dtype markers: residuals must be arrays, so carry zero-size tagged
    # arrays instead of raw dtypes; b (unpadded, tiny) also records V.
    markers = (jnp.zeros((0,), f.dtype), jnp.zeros((0,), g.dtype),
               jnp.zeros((0,), w.dtype), b)
    residuals = (f32, g_p, w_c, b_p, lab, frame_lens, label_lens, lpb, lpy,
                 base, alpha, markers)
    return loss, residuals


def _fused_bwd(blank, compute_dtype, fastemit_lambda, res, gbar):
    (f32, g_p, w_c, b_p, lab, frame_lens, label_lens, lpb, lpy, base,
     alpha, markers) = res
    f_mk, g_mk, w_mk, b_orig = markers
    f_dt, g_dt, w_dt, b_dt = (f_mk.dtype, g_mk.dtype, w_mk.dtype,
                              b_orig.dtype)
    V = b_orig.shape[0]
    U1 = lpb.shape[2]
    U1p = g_p.shape[1]
    g_blank, g_y = occupancies_from_lp(lpb, lpy, frame_lens, label_lens,
                                       alpha=alpha)
    if fastemit_lambda:
        g_y = g_y * (1.0 + fastemit_lambda)
    pad_u = [(0, 0), (0, 0), (0, U1p - U1)]
    gb = jnp.pad(g_blank, pad_u)
    gy = jnp.pad(g_y, pad_u)
    df, dg, dw, db = joint_lp_bwd(f32, g_p, lab, w_c, b_p, gb, gy,
                                  base, gbar, blank, compute_dtype)
    return (df.astype(f_dt), dg[:, :U1].astype(g_dt),
            dw[:, :V].astype(w_dt), db[0, :V].astype(b_dt),
            None, None, None)


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)
