"""Experiment: software-pipelined fused-loss FORWARD kernel.

Hypothesis: the fwd kernel (2.46 ms at configs[2] shapes vs a 1.63 ms
MXU floor) serializes matmul -> softmax epilogue within each grid step.
If grid step t instead runs {matmul for tile t into VMEM scratch} +
{epilogue for tile t-1 from scratch} — two data-independent instruction
streams — Mosaic's scheduler can overlap MXU and VPU work.

Measures (slope-timed, dependency-chained; CLAUDE.md methodology):
  base      current joint_lp_fwd
  pipe      pipelined variant (one extra grid step per batch row)
  mm_only   matmul-only kernel (the MXU floor incl. tanh)
Checks pipe == base numerically first.

Usage: python tools/exp_fwd_pipe.py [--b 32] [--t 200] [--u 40]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--t", type=int, default=200)
    p.add_argument("--u", type=int, default=40)
    p.add_argument("--joint", type=int, default=512)
    p.add_argument("--vocab", type=int, default=1024)
    p.add_argument("--cdtype", default="bfloat16")
    p.add_argument("--tile", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rnn_transducer_tpu.ops import rnnt_joint_fused as fj
    from rnn_transducer_tpu.ops.rnnt_loss import NEG_INF

    B, T, U, J, V = args.b, args.t, args.u, args.joint, args.vocab
    U1 = U + 1
    cdtype = jnp.dtype(args.cdtype)
    TILE = args.tile
    log(f"devices: {jax.devices()}  B={B} T={T} U={U} J={J} V={V} "
        f"tile={TILE} cdtype={cdtype}")

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(B, T, J)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U1, J)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.05, jnp.float32)
    b = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)

    U1p = -(-U1 // 8) * 8
    g_p = fj._pad_axis(g, 1, 8)
    w_p, b_p = fj._prep_wb(w, b)
    lab = fj._prep_labels(labels, U1p)
    w_c = w_p.astype(cdtype)
    Vp = w_p.shape[1]
    blank = 0

    # ---------------- pipelined forward kernel ---------------------------

    def _epilogue(logits, lab_row, lpb_ref, lpy_ref, base_ref):
        m = jnp.max(logits, axis=2, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=2, keepdims=True))
        base = (m + lse)[:, :, 0]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
        onehot = col == lab_row[None, :, None]
        sel = jnp.sum(jnp.where(onehot, logits, 0.0), axis=2)
        lpb_ref[0] = logits[:, :, blank] - base
        lpy_ref[0] = jnp.where(lab_row[None, :] >= 0, sel - base, NEG_INF)
        base_ref[0] = base

    def _pipe_kernel(nT, f_ref, g_ref, lab_ref, w_ref, b_ref,
                     lpb_ref, lpy_ref, base_ref, scr):
        t_idx = pl.program_id(1)
        cur = jax.lax.rem(t_idx, 2)

        # epilogue for tile t-1 (from scratch), before this step's matmul
        @pl.when(t_idx > 0)
        def _():
            logits = scr[1 - cur]
            _epilogue(logits, lab_ref[0, 0, :], lpb_ref, lpy_ref, base_ref)

        # matmul for tile t into scratch (skipped on the tail step)
        @pl.when(t_idx < nT)
        def _():
            _, logits = fj._joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
            scr[cur] = logits

    def joint_lp_fwd_pipe(f, g, labels_pad, w, b):
        B_, T_, J_ = f.shape
        nT = -(-T_ // TILE)
        Tp = nT * TILE
        if Tp != T_:
            f = fj._pad_axis(f, 1, TILE)
        out_shape = jax.ShapeDtypeStruct((B_, Tp, U1p), jnp.float32)
        # outputs lag one step behind: index max(t-1, 0)
        out_spec = pl.BlockSpec(
            (1, TILE, U1p),
            lambda b_, t: (b_, jnp.maximum(t - 1, 0), 0),
            memory_space=pltpu.VMEM)
        in_t = lambda b_, t: (b_, jnp.minimum(t, nT - 1), 0)
        lpb, lpy, base = pl.pallas_call(
            functools.partial(_pipe_kernel, nT),
            grid=(B_, nT + 1),
            in_specs=[
                pl.BlockSpec((1, TILE, J_), in_t, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U1p, J_), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J_, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(out_spec, out_spec, out_spec),
            out_shape=(out_shape, out_shape, out_shape),
            scratch_shapes=[pltpu.VMEM((2, TILE, U1p, Vp), jnp.float32)],
            interpret=fj._interpret(),
        )(f, g, labels_pad, w, b)
        return lpb[:, :T_], lpy[:, :T_], base[:, :T_]

    # ---------------- online-softmax (single-pass epilogue) --------------

    def _online_kernel(f_ref, g_ref, lab_ref, w_ref, b_ref,
                       lpb_ref, lpy_ref, base_ref):
        _, logits = fj._joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
        tile, U1p_, Vp_ = logits.shape
        lab_row = lab_ref[0, 0, :]
        # one streaming pass over static 128-lane chunks with running
        # (max, scaled-sum) carries — replaces the separate max pass +
        # exp/sum pass + onehot extraction pass over the 3 MB tile
        m = jnp.full((tile, U1p_), -jnp.inf, jnp.float32)
        s = jnp.zeros((tile, U1p_), jnp.float32)
        sel = jnp.zeros((tile, U1p_), jnp.float32)
        for c in range(Vp_ // LANE_):
            chunk = logits[:, :, c * LANE_:(c + 1) * LANE_]
            cm = jnp.max(chunk, axis=2)
            m_new = jnp.maximum(m, cm)
            s = s * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(chunk - m_new[:, :, None]), axis=2)
            m = m_new
            col = jax.lax.broadcasted_iota(jnp.int32, chunk.shape, 2) \
                + c * LANE_
            onehot = col == lab_row[None, :, None]
            sel = sel + jnp.sum(jnp.where(onehot, chunk, 0.0), axis=2)
        base = m + jnp.log(s)
        lpb_ref[0] = logits[:, :, blank] - base
        lpy_ref[0] = jnp.where(lab_row[None, :] >= 0, sel - base, NEG_INF)
        base_ref[0] = base

    LANE_ = 128

    def joint_lp_fwd_online(f, g, labels_pad, w, b):
        B_, T_, J_ = f.shape
        nT = -(-T_ // TILE)
        Tp = nT * TILE
        if Tp != T_:
            f = fj._pad_axis(f, 1, TILE)
        out_shape = jax.ShapeDtypeStruct((B_, Tp, U1p), jnp.float32)
        out_spec = pl.BlockSpec((1, TILE, U1p), lambda b_, t: (b_, t, 0),
                                memory_space=pltpu.VMEM)
        lpb, lpy, base = pl.pallas_call(
            _online_kernel,
            grid=(B_, nT),
            in_specs=[
                pl.BlockSpec((1, TILE, J_), lambda b_, t: (b_, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U1p, J_), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J_, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(out_spec, out_spec, out_spec),
            out_shape=(out_shape, out_shape, out_shape),
            interpret=fj._interpret(),
        )(f, g, labels_pad, w, b)
        return lpb[:, :T_], lpy[:, :T_], base[:, :T_]

    # ---------------- matmul-only bound kernel ---------------------------

    def _mm_kernel(f_ref, g_ref, lab_ref, w_ref, b_ref, o_ref):
        _, logits = fj._joint_tile(f_ref, g_ref, w_ref, b_ref, cdtype)
        o_ref[0] = logits[:, 0, :1]  # touch the result, tiny output

    def joint_mm_only(f, g, labels_pad, w, b):
        B_, T_, J_ = f.shape
        nT = -(-T_ // TILE)
        out_shape = jax.ShapeDtypeStruct((B_, nT * TILE, 1), jnp.float32)
        return pl.pallas_call(
            _mm_kernel,
            grid=(B_, nT),
            in_specs=[
                pl.BlockSpec((1, TILE, J_), lambda b_, t: (b_, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U1p, J_), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, U1p), lambda b_, t: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((J_, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Vp), lambda b_, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE, 1), lambda b_, t: (b_, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=fj._interpret(),
        )(f, g, labels_pad, w, b)

    # ---------------- correctness ----------------------------------------
    ref = jax.jit(lambda ff: fj.joint_lp_fwd(ff, g_p, lab, w_c, b_p,
                                             blank, cdtype))(f)
    got = jax.jit(lambda ff: joint_lp_fwd_pipe(ff, g_p, lab, w_c, b_p))(f)
    for name, a, e in zip(("lpb", "lpy", "base"), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    log("pipe == base: OK")
    got = jax.jit(lambda ff: joint_lp_fwd_online(ff, g_p, lab, w_c, b_p))(f)
    for name, a, e in zip(("lpb", "lpy", "base"), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    log("online == base: OK")

    # ---------------- timing ---------------------------------------------
    def slope(run_n, ns=(4, 24), repeats=3):
        times = []
        for n in ns:
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                run_n(n)
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        return (times[1] - times[0]) / (ns[1] - ns[0])

    def timed(name, step):
        s, probe = step(f)
        jax.device_get(probe)

        def run(n):
            st = f
            for _ in range(n):
                st, pr = step(st)
            jax.device_get(pr)

        dt = slope(run)
        log(f"{name}: {dt * 1e3:.2f} ms")
        return dt

    @jax.jit
    def base_step(ff):
        lpb, lpy, base = fj.joint_lp_fwd(ff, g_p, lab, w_c, b_p, blank,
                                         cdtype)
        return ff + 0.0 * lpb[:, :, :1], lpb[0, 0, 0]

    @jax.jit
    def pipe_step(ff):
        lpb, lpy, base = joint_lp_fwd_pipe(ff, g_p, lab, w_c, b_p)
        return ff + 0.0 * lpb[:, :, :1], lpb[0, 0, 0]

    @jax.jit
    def mm_step(ff):
        o = joint_mm_only(ff, g_p, lab, w_c, b_p)
        return ff + 0.0 * o[:, : ff.shape[1]], o[0, 0, 0]

    @jax.jit
    def online_step(ff):
        lpb, lpy, base = joint_lp_fwd_online(ff, g_p, lab, w_c, b_p)
        return ff + 0.0 * lpb[:, :, :1], lpb[0, 0, 0]

    for rep in range(3):  # interleaved A/B to cancel drift
        timed(f"[{rep}] base (current fwd)", base_step)
        timed(f"[{rep}] online (1-pass epilogue)", online_step)


if __name__ == "__main__":
    main()
