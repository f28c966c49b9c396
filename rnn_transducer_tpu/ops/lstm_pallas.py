"""Fused Pallas LSTM layer: the whole time recurrence runs on-chip.

The XLA `lax.scan` LSTM (ops/lstm.py) pays per-step dispatch overhead and
streams h/c through HBM every step. This kernel keeps W_hh and the (h, c)
carry resident in VMEM across a time-tiled sequential grid: each grid step
DMAs one (B_tile, TILE_T, 4H) slab of the precomputed input projections,
runs TILE_T recurrent-matmul + gate updates entirely on-chip, and writes
back only the (B_tile, TILE_T, H) outputs. Large layers additionally tile
the batch (grid = (nB, nT), time innermost so the carry stays coherent).

Backward is hand-derived BPTT over gate activations SAVED by the forward
(fp32 (B, T, 4H) post-nonlinearity values [i_s, f_s, g_t, o_s]): the
time-reversed grid assembles dgates and the dh/dc carries directly from
them — no gates-recompute matmul and no sigmoid/tanh on the backward's
serial critical path (r3: cut the v2 backward from ~9.9 to ~5 us/step).
Saving acts is HBM-residency-neutral: it replaces x_proj in the VJP
residuals (x_proj is dead after the forward kernel consumes it; the
backward no longer reads it). The weight gradients dW_ih/dW_hh/db fall
out of large batched XLA matmuls over the emitted dgates tensor —
MXU-shaped work XLA already does optimally.

Used automatically for lane-aligned layer sizes (H % 128 == 0, B % 8 == 0);
other shapes fall back to the scan implementation. Gate order matches
torch (i, f, g, o) like ops/lstm.py, so the same parity tests apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE_T = 8  # sublane constraint: time tile must be a multiple of 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_b(B: int, H: int) -> int:
    # Keep the working set (x slab + 4-5 H-sized tiles + resident W_hh)
    # under VMEM with double buffering; large layers tile the batch.
    # BT=32 at H=512 does NOT fit this batch-major layout (the backward's
    # working set lands 428 KB over the 16 MB scoped limit, and TILE_T
    # cannot shrink below the 8-sublane minimum here) — wide-batch H=512
    # shapes dispatch to the time-major v2 kernels instead (_use_v2).
    if H <= 256:
        return B
    if H <= 512:
        return min(B, 16)
    return min(B, 8)


def supported(B: int, H: int) -> bool:
    """Lane-aligned shapes; H > 512 uses the time-major (v2) kernels."""
    return H % LANE == 0 and H <= 2048 and B % 8 == 0


def _use_v2(B: int, H: int) -> bool:
    """Time-major (v2) kernel dispatch.

    H > 512: W_hh alone is >=8 MB bf16, so the batch-major (v1) unrolled
    inner loop's live intermediates blow VMEM. The v2 kernels use
    time-major tiles (1, TILE_T, BT, H*) — the loop index lands on an
    untiled leading dim, which makes lax.fori_loop indexing legal and
    keeps only one step's intermediates live.

    H == 512 with B % 32 == 0: v1 is capped at BT=16 by the same VMEM
    wall (its TILE_T cannot shrink below 8 sublanes), so wide batches
    take v2, whose free tile_t lets BT=32/64 fit — halving the number of
    sequential batch passes on the critical path."""
    return H > 512 or (H == 512 and B % 32 == 0)


def _split4(gates, H):
    return (gates[:, 0:H], gates[:, H:2 * H], gates[:, 2 * H:3 * H],
            gates[:, 3 * H:4 * H])


# ------------------------------- forward ---------------------------------

def _fwd_kernel(cdtype, with_acts, x_ref, h0_ref, c0_ref, w_ref, hs_ref,
                cs_ref, *rest):
    acts_ref = rest[0] if with_acts else None
    h_s, c_s = rest[-2], rest[-1]
    t_idx = pl.program_id(1)
    H = h0_ref.shape[1]

    @pl.when(t_idx == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    c = c_s[:]
    for i in range(TILE_T):
        gates = x_ref[0, :, i, :] + jnp.dot(
            h.astype(cdtype), w_ref[:], preferred_element_type=jnp.float32)
        i_, f_, g_, o_ = _split4(gates, H)
        i_s = jax.nn.sigmoid(i_)
        f_s = jax.nn.sigmoid(f_)
        g_t = jnp.tanh(g_)
        o_s = jax.nn.sigmoid(o_)
        c = f_s * c + i_s * g_t
        h = o_s * jnp.tanh(c)
        hs_ref[0, :, i, :] = h
        cs_ref[0, :, i, :] = c
        if with_acts:
            acts_ref[0, :, i, :] = jnp.concatenate(
                [i_s, f_s, g_t, o_s], axis=1).astype(acts_ref.dtype)
    h_s[:] = h
    c_s[:] = c


def _lstm_core_fwd(x_proj, w_hh, h0, c0, cdtype, with_acts=True):
    B, T, H4 = x_proj.shape
    H = H4 // 4
    BT = _tile_b(B, H)
    nB = B // BT
    nT = -(-T // TILE_T)
    Tp = nT * TILE_T
    if Tp != T:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, Tp - T), (0, 0)))
    # reshape to (nB, BT, Tp, .) so the batch tile is a leading block dim
    x_proj = x_proj.reshape(nB, BT, Tp, H4)
    w_c = w_hh.astype(cdtype)
    out_shape = jax.ShapeDtypeStruct((nB, BT, Tp, H), jnp.float32)
    out_spec = pl.BlockSpec((1, BT, TILE_T, H), lambda b, t: (b, 0, t, 0),
                            memory_space=pltpu.VMEM)
    acts_spec = (pl.BlockSpec((1, BT, TILE_T, H4),
                              lambda b, t: (b, 0, t, 0),
                              memory_space=pltpu.VMEM),) if with_acts else ()
    acts_shape = ((jax.ShapeDtypeStruct((nB, BT, Tp, H4), x_proj.dtype),)
                  if with_acts else ())
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, cdtype, with_acts),
        grid=(nB, nT),  # time innermost: the (h, c) carry stays coherent
        in_specs=[
            pl.BlockSpec((1, BT, TILE_T, H4), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec) + acts_spec,
        out_shape=(out_shape, out_shape) + acts_shape,
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x_proj, h0, c0, w_c)
    hs, cs = outs[0], outs[1]
    acts = outs[2] if with_acts else None
    hs = hs.reshape(B, Tp, H)[:, :T]
    cs = cs.reshape(B, Tp, H)[:, :T]
    return hs, cs, acts


# ------------------------------- backward --------------------------------

def _bwd_kernel(T, nT, cdtype, acts_ref, cp_ref, dhs_ref,
                dcT_ref, w_ref, dx_ref, dh0_ref, dc0_ref, dh_s, dc_s):
    t_idx = pl.program_id(1)
    H = dcT_ref.shape[1]

    @pl.when(t_idx == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s[:])
        dc_s[:] = dcT_ref[:]

    def step(i, carry):
        dh, dc_carry = carry
        # Steps past the true sequence end (time padding in the last tile)
        # must leave the dh/dc carries untouched — the dcT init would
        # otherwise decay through the pad before reaching the real T-1.
        t_global = (nT - 1 - t_idx) * TILE_T + i
        valid = t_global < T
        # gate activations saved by the forward (exact fp32 values): no
        # recompute matmul, no sigmoid/tanh on the serial critical path;
        # c_t from c_{t-1} + saved activations (the forward formula —
        # bit-identical), so the cs trajectory is not streamed either.
        i_s, f_s, g_t, o_s = _split4(acts_ref[0, :, i, :], H)
        cp = cp_ref[0, :, i, :]
        tc = jnp.tanh(f_s * cp + i_s * g_t)
        dh_tot = dhs_ref[0, :, i, :] + dh
        do = dh_tot * tc
        dc = dc_carry + dh_tot * o_s * (1.0 - tc * tc)
        di = dc * g_t
        dg = dc * i_s
        df = dc * cp
        dgates = jnp.concatenate(
            [di * i_s * (1.0 - i_s), df * f_s * (1.0 - f_s),
             dg * (1.0 - g_t * g_t), do * o_s * (1.0 - o_s)], axis=1)
        dx_ref[0, :, i, :] = dgates.astype(dx_ref.dtype)
        dc_carry = jnp.where(valid, dc * f_s, dc_carry)
        # dh[t-1] = dgates @ W^T : contract the 4H dim of both
        dh_new = jax.lax.dot_general(
            dgates.astype(cdtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jnp.where(valid, dh_new, dh)
        return dh, dc_carry

    carry = (dh_s[:], dc_s[:])
    for i in reversed(range(TILE_T)):  # static unroll: aligned indexing
        carry = step(i, carry)
    dh, dc_carry = carry
    dh_s[:] = dh
    dc_s[:] = dc_carry
    dh0_ref[:] = dh
    dc0_ref[:] = dc_carry


def _lstm_core_bwd(acts, w_hh, h0, c0, hs, cs, dhs, dhT, dcT, cdtype):
    B, T, H = hs.shape
    H4 = 4 * H
    BT = _tile_b(B, H)
    nB = B // BT
    nT = -(-T // TILE_T)
    Tp = nT * TILE_T
    # fold the final-state cotangent into the last step's output cotangent
    dhs = dhs.at[:, T - 1, :].add(dhT)
    hs_prev = jnp.concatenate([h0[:, None, :], hs[:, :-1, :]], axis=1)
    cs_prev = jnp.concatenate([c0[:, None, :], cs[:, :-1, :]], axis=1)

    def padt(a):
        return (jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0)))
                if Tp != T else a)

    def shape4(a):
        return padt(a).reshape(nB, BT, Tp, a.shape[-1])

    # acts is already in the kernel's (nB, BT, Tp, H4) layout
    cp4 = shape4(cs_prev)
    dhs4 = shape4(dhs)
    dcT2 = dcT
    w_c = w_hh.astype(cdtype)
    rev = lambda b, t, nT=nT: (b, 0, nT - 1 - t, 0)
    tile = lambda h: pl.BlockSpec((1, BT, TILE_T, h), rev,
                                  memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((BT, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    dx, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, T, nT, cdtype),
        grid=(nB, nT),
        in_specs=[tile(H4), tile(H), tile(H), vec,
                  pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(tile(H4), vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((nB, BT, Tp, H4), acts.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(acts, cp4, dhs4, dcT2, w_c)
    dx = dx.reshape(B, Tp, H4)[:, :T]
    # Weight grad as one large XLA matmul over dgates — compute-dtype
    # operands, fp32 accumulate (fp32 MXU matmuls run far below peak).
    dw_hh = jnp.einsum("bth,btk->hk", hs_prev.astype(cdtype),
                       dx.astype(cdtype),
                       preferred_element_type=jnp.float32)
    return dx, dw_hh, dh0, dc0


# --------------------- v2: time-major tiles (large H) --------------------
#
# Tiles are (1, TILE_T, BT, H*): the time index lands on an UNTILED leading
# dim, so (a) lax.fori_loop indexing is legal and (b) TILE_T is not bound
# by the 8-sublane constraint (that applies to the trailing (BT, H*) dims).
# The MXU cares about the batch tile: the per-step recurrent matmul is
# (BT, H) x (H, 4H), so BT is pushed as wide as VMEM allows (W_hh bf16 is
# 8 MB resident at H=1024) and TILE_T shrinks to compensate — the total
# number of sequential time steps is TILE_T-independent, but nB = B/BT
# batch passes are sequential, so doubling BT halves the critical path.

def _tile_bt_v2(B: int, H: int) -> tuple[int, int]:
    """(BT, TILE_T): widest batch tile that fits VMEM next to W_hh.

    The per-step recurrent matmul (BT, H) x (H, 4H) streams the same
    H/128 * 4H/128 weight tiles through the MXU for any BT <= 128 rows,
    so its wall time is ~BT-independent — doubling BT halves the number
    of sequential batch passes (nB = B/BT) for free. TILE_T shrinks as
    BT grows to keep the double-buffered (TILE_T, BT, 4H) slabs inside
    VMEM next to the resident bf16 W_hh (8 MB at H=1024).
    """
    if B % 64 == 0 and H <= 1024:
        return 64, 1
    if B % 32 == 0 and H <= 1024:
        return 32, 2
    if B % 16 == 0 and H <= 1024:
        return 16, 4
    return min(B, 8), 8


def _fwd_kernel_v2(tile_t, cdtype, with_acts, x_ref, h0_ref, c0_ref,
                   w_ref, hs_ref, cs_ref, *rest):
    acts_ref = rest[0] if with_acts else None
    h_s, c_s = rest[-2], rest[-1]
    t_idx = pl.program_id(1)
    H = h0_ref.shape[1]

    @pl.when(t_idx == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    def step(i, carry):
        h, c = carry
        gates = x_ref[0, i, :, :] + jnp.dot(
            h.astype(cdtype), w_ref[:], preferred_element_type=jnp.float32)
        i_, f_, g_, o_ = _split4(gates, H)
        i_s = jax.nn.sigmoid(i_)
        f_s = jax.nn.sigmoid(f_)
        g_t = jnp.tanh(g_)
        o_s = jax.nn.sigmoid(o_)
        c = f_s * c + i_s * g_t
        h = o_s * jnp.tanh(c)
        hs_ref[0, i, :, :] = h
        cs_ref[0, i, :, :] = c
        if with_acts:
            acts_ref[0, i, :, :] = jnp.concatenate(
                [i_s, f_s, g_t, o_s], axis=1).astype(acts_ref.dtype)
        return h, c

    h, c = jax.lax.fori_loop(0, tile_t, step, (h_s[:], c_s[:]))
    h_s[:] = h
    c_s[:] = c


def _lstm_core_fwd_v2(x_proj, w_hh, h0, c0, cdtype, with_acts=True):
    B, T, H4 = x_proj.shape
    H = H4 // 4
    BT, tile_t = _tile_bt_v2(B, H)
    nB = B // BT
    nT = -(-T // tile_t)
    Tp = nT * tile_t
    if Tp != T:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, Tp - T), (0, 0)))
    # time-major tiles: (nB, Tp, BT, H4); batch tile = sublane dim
    x4 = x_proj.reshape(nB, BT, Tp, H4).transpose(0, 2, 1, 3)
    w_c = w_hh.astype(cdtype)
    out_shape = jax.ShapeDtypeStruct((nB, Tp, BT, H), jnp.float32)
    out_spec = pl.BlockSpec((1, tile_t, BT, H), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    acts_spec = (pl.BlockSpec((1, tile_t, BT, H4),
                              lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM),) if with_acts else ()
    acts_shape = ((jax.ShapeDtypeStruct((nB, Tp, BT, H4), x_proj.dtype),)
                  if with_acts else ())
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, tile_t, cdtype, with_acts),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, tile_t, BT, H4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec) + acts_spec,
        out_shape=(out_shape, out_shape) + acts_shape,
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x4, h0, c0, w_c)
    hs, cs = outs[0], outs[1]
    acts = outs[2] if with_acts else None
    hs = hs.transpose(0, 2, 1, 3).reshape(B, Tp, H)[:, :T]
    cs = cs.transpose(0, 2, 1, 3).reshape(B, Tp, H)[:, :T]
    return hs, cs, acts


def _bwd_kernel_v2(T, nT, tile_t, cdtype, acts_ref, cp_ref,
                   dhs_ref, dcT_ref, w_ref, dx_ref, dh0_ref, dc0_ref,
                   dh_s, dc_s):
    t_idx = pl.program_id(1)
    H = dcT_ref.shape[1]

    @pl.when(t_idx == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s[:])
        dc_s[:] = dcT_ref[:]

    def step(k, carry):
        i = tile_t - 1 - k
        dh, dc_carry = carry
        t_global = (nT - 1 - t_idx) * tile_t + i
        valid = t_global < T
        # gate activations saved by the forward (exact fp32 values): no
        # recompute matmul, no sigmoid/tanh on the serial critical path
        i_s, f_s, g_t, o_s = _split4(acts_ref[0, i, :, :], H)
        cp = cp_ref[0, i, :, :]
        # c_t from c_{t-1} + saved activations (the forward formula —
        # bit-identical), so the cs trajectory is not streamed either
        tc = jnp.tanh(f_s * cp + i_s * g_t)
        dh_tot = dhs_ref[0, i, :, :] + dh
        do = dh_tot * tc
        dc = dc_carry + dh_tot * o_s * (1.0 - tc * tc)
        di = dc * g_t
        dg = dc * i_s
        df = dc * cp
        dgates = jnp.concatenate(
            [di * i_s * (1.0 - i_s), df * f_s * (1.0 - f_s),
             dg * (1.0 - g_t * g_t), do * o_s * (1.0 - o_s)], axis=1)
        dx_ref[0, i, :, :] = dgates.astype(dx_ref.dtype)
        dc_carry = jnp.where(valid, dc * f_s, dc_carry)
        dh_new = jax.lax.dot_general(
            dgates.astype(cdtype), w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = jnp.where(valid, dh_new, dh)
        return dh, dc_carry

    dh, dc_carry = jax.lax.fori_loop(0, tile_t, step, (dh_s[:], dc_s[:]))
    dh_s[:] = dh
    dc_s[:] = dc_carry
    dh0_ref[:] = dh
    dc0_ref[:] = dc_carry


def _lstm_core_bwd_v2(acts, w_hh, h0, c0, hs, cs, dhs, dhT, dcT, cdtype):
    B, T, H = hs.shape
    H4 = 4 * H
    BT, tile_t = _tile_bt_v2(B, H)
    nB = B // BT
    nT = -(-T // tile_t)
    Tp = nT * tile_t
    dhs = dhs.at[:, T - 1, :].add(dhT)
    hs_prev = jnp.concatenate([h0[:, None, :], hs[:, :-1, :]], axis=1)
    cs_prev = jnp.concatenate([c0[:, None, :], cs[:, :-1, :]], axis=1)

    def shape4(a):
        a = (jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else a)
        return a.reshape(nB, BT, Tp, a.shape[-1]).transpose(0, 2, 1, 3)

    # acts is already in the kernel's time-major (nB, Tp, BT, H4) layout
    cp4 = shape4(cs_prev)
    dhs4 = shape4(dhs)
    w_c = w_hh.astype(cdtype)
    rev = lambda b, t, nT=nT: (b, nT - 1 - t, 0, 0)
    tile = lambda h: pl.BlockSpec((1, tile_t, BT, h), rev,
                                  memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((BT, H), lambda b, t: (b, 0), memory_space=pltpu.VMEM)
    dx, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, T, nT, tile_t, cdtype),
        grid=(nB, nT),
        in_specs=[tile(H4), tile(H), tile(H), vec,
                  pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(tile(H4), vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((nB, Tp, BT, H4), acts.dtype),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(acts, cp4, dhs4, dcT, w_c)
    dx = dx.transpose(0, 2, 1, 3).reshape(B, Tp, H4)[:, :T]
    dw_hh = jnp.einsum("bth,btk->hk", hs_prev.astype(cdtype),
                       dx.astype(cdtype),
                       preferred_element_type=jnp.float32)
    return dx, dw_hh, dh0, dc0


# ---------------- int8 (W8A8) inference core: quantized serving ----------
#
# Decode-path variant for ops/quant.py int8 params: W_hh stays int8 IN
# VMEM (half the bf16 residency — H=1024 is 4 MB instead of 8) and the
# recurrent matmul runs int8 x int8 -> int32 on the MXU (2x the bf16
# rate on v5e). h is re-quantized each step with a dynamic per-block
# symmetric scale: |h| < 1 always (h = o * tanh(c)), but typical
# magnitudes are much smaller, so scaling by the live max keeps the full
# 8-bit resolution. Inference only — training never sees QTensor params.

def _fwd_kernel_v2_q(tile_t, x_ref, h0_ref, c0_ref, wq_ref, sc_ref,
                     hs_ref, cs_ref, h_s, c_s):
    t_idx = pl.program_id(1)
    H = h0_ref.shape[1]

    @pl.when(t_idx == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    def step(i, carry):
        h, c = carry
        amax = jnp.maximum(jnp.max(jnp.abs(h)), 1e-6)
        hq = jnp.round(h * (127.0 / amax)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            hq, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # combined dequant: (hq * amax/127) @ (wq * scale_col)
        gates = x_ref[0, i, :, :] + acc.astype(jnp.float32) * (
            sc_ref[:] * (amax / 127.0))
        i_, f_, g_, o_ = _split4(gates, H)
        i_s = jax.nn.sigmoid(i_)
        f_s = jax.nn.sigmoid(f_)
        g_t = jnp.tanh(g_)
        o_s = jax.nn.sigmoid(o_)
        c = f_s * c + i_s * g_t
        h = o_s * jnp.tanh(c)
        hs_ref[0, i, :, :] = h
        cs_ref[0, i, :, :] = c
        return h, c

    h, c = jax.lax.fori_loop(0, tile_t, step, (h_s[:], c_s[:]))
    h_s[:] = h
    c_s[:] = c


def _lstm_core_fwd_v2_q(x_proj, wq, scale, h0, c0):
    """Time-major int8-weight inference forward. wq: (H, 4H) int8,
    scale: (1, 4H) f32 per-output-channel (w ≈ wq * scale)."""
    B, T, H4 = x_proj.shape
    H = H4 // 4
    BT, tile_t = _tile_bt_v2(B, H)
    nB = B // BT
    nT = -(-T // tile_t)
    Tp = nT * tile_t
    if Tp != T:
        x_proj = jnp.pad(x_proj, ((0, 0), (0, Tp - T), (0, 0)))
    x4 = x_proj.reshape(nB, BT, Tp, H4).transpose(0, 2, 1, 3)
    out_shape = jax.ShapeDtypeStruct((nB, Tp, BT, H), jnp.float32)
    out_spec = pl.BlockSpec((1, tile_t, BT, H), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    hs, cs = pl.pallas_call(
        functools.partial(_fwd_kernel_v2_q, tile_t),
        grid=(nB, nT),
        in_specs=[
            pl.BlockSpec((1, tile_t, BT, H4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((BT, H), jnp.float32),
        ],
        interpret=_interpret(),
    )(x4, h0, c0, wq, scale)
    hs = hs.transpose(0, 2, 1, 3).reshape(B, Tp, H)[:, :T]
    cs = cs.transpose(0, 2, 1, 3).reshape(B, Tp, H)[:, :T]
    return hs, cs


# ------------------------------ public op --------------------------------

def _fwd_dispatch(x_proj, w_hh, h0, c0, cdtype, with_acts=True):
    if _use_v2(x_proj.shape[0], w_hh.shape[0]):
        return _lstm_core_fwd_v2(x_proj, w_hh, h0, c0, cdtype, with_acts)
    return _lstm_core_fwd(x_proj, w_hh, h0, c0, cdtype, with_acts)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lstm_core(x_proj, w_hh, h0, c0, cdtype):
    # primal (inference) path: no backward -> skip the acts output and
    # its HBM write entirely
    hs, cs, _ = _fwd_dispatch(x_proj, w_hh, h0, c0, cdtype,
                              with_acts=False)
    T = x_proj.shape[1]
    return hs, hs[:, T - 1], cs[:, T - 1]


def _core_fwd(x_proj, w_hh, h0, c0, cdtype):
    hs, cs, acts = _fwd_dispatch(x_proj, w_hh, h0, c0, cdtype)
    T = x_proj.shape[1]
    out = (hs, hs[:, T - 1], cs[:, T - 1])
    # acts (the saved gate activations, kernel-layout) REPLACES x_proj in
    # the residuals: the backward reads only activations, and x_proj dies
    # with the forward kernel — no extra HBM residency.
    return out, (acts, w_hh, h0, c0, hs, cs)


def _core_bwd(cdtype, res, cot):
    acts, w_hh, h0, c0, hs, cs = res
    dhs, dhT, dcT = cot
    bwd = (_lstm_core_bwd_v2 if _use_v2(hs.shape[0], w_hh.shape[0])
           else _lstm_core_bwd)
    dx, dw_hh, dh0, dc0 = bwd(
        acts, w_hh, h0, c0, hs, cs, dhs, dhT, dcT, cdtype)
    return dx, dw_hh.astype(w_hh.dtype), dh0, dc0


_lstm_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _proj(x, w, b, cdtype):
    """x_proj = x @ w + b, emitted in the COMPUTE dtype, with a custom VJP
    so the gradient matmuls (dW = x^T g, dx = g W^T) also run with
    compute-dtype operands. XLA's autodiff otherwise feeds them the fp32
    cotangent — fp32 MXU matmuls run at a fraction of the bf16 rate
    (profiled on the 6x1024 config) — and emitting x_proj in cdtype means
    the backward kernel's dgates cotangent is cdtype too, so no cast
    passes appear anywhere on the gradient path. Accumulation is fp32;
    the bias is folded in before the final rounding."""
    y = jnp.dot(x.astype(cdtype), w.astype(cdtype),
                preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(cdtype)


def _proj_fwd(x, w, b, cdtype):
    return _proj(x, w, b, cdtype), (x, w)


def _proj_bwd(cdtype, res, g):
    x, w = res
    gc = g.astype(cdtype)  # no-op: g arrives in cdtype (dx of _lstm_core)
    dx = jax.lax.dot_general(
        gc, w.astype(cdtype),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jax.lax.dot_general(
        x.astype(cdtype), gc,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    return dx, dw, db


_proj.defvjp(_proj_fwd, _proj_bwd)


def _w_hh_fits_vmem(H: int, cdtype) -> bool:
    """The kernels keep W_hh VMEM-resident; it must leave room for the
    double-buffered activation slabs under the ~16 MB scoped-VMEM limit.
    bf16 H=1024 is 8 MB (fits); fp32 H=1024 is 16 MB (cannot — e.g. the
    fp32-compute parity-test path), so those shapes take the scan layer."""
    return 4 * H * H * jnp.dtype(cdtype).itemsize <= 12 * 1024 * 1024


def lstm_layer_pallas(params, x, h0=None, c0=None, *,
                      compute_dtype=jnp.bfloat16):
    """Drop-in replacement for ops.lstm.lstm_layer on aligned shapes.

    x: (B, T, I) -> (outputs (B, T, H) fp32, (h_T, c_T)).

    An int8 QTensor w_hh (ops/quant.py serving params) dispatches to the
    W8A8 inference core: int8 W_hh resident in VMEM, int8 MXU matmuls.
    """
    from rnn_transducer_tpu.ops.quant import QTensor, dequantize_tensor
    B, T, _ = x.shape
    w_hh = params["w_hh"]
    quantized = isinstance(w_hh, QTensor)
    H = (w_hh.q if quantized else w_hh).shape[0]
    w_ih, b = params["w_ih"], params["b"]
    if isinstance(w_ih, QTensor):  # streamed once per call: bf16 MXU fine
        w_ih = dequantize_tensor(w_ih)
    if quantized:
        if not _interpret() and 4 * H * H > 12 * 1024 * 1024:
            from rnn_transducer_tpu.ops.lstm import lstm_layer
            return lstm_layer(params, x, h0, c0,
                              compute_dtype=compute_dtype, impl="scan")
        x_proj = _proj(x, w_ih, b, jnp.dtype(compute_dtype))
        if h0 is None:
            h0 = jnp.zeros((B, H), jnp.float32)
        if c0 is None:
            c0 = jnp.zeros((B, H), jnp.float32)
        hs, cs = _lstm_core_fwd_v2_q(x_proj, w_hh.q, w_hh.scale, h0, c0)
        return hs, (hs[:, T - 1], cs[:, T - 1])
    if not _interpret() and not _w_hh_fits_vmem(H, compute_dtype):
        from rnn_transducer_tpu.ops.lstm import lstm_layer
        return lstm_layer(params, x, h0, c0, compute_dtype=compute_dtype,
                          impl="scan")
    x_proj = _proj(x, w_ih, b, jnp.dtype(compute_dtype))
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, H), jnp.float32)
    hs, hT, cT = _lstm_core(x_proj, w_hh, h0, c0, compute_dtype)
    return hs, (hT, cT)
