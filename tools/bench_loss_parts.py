"""Slope-time the pieces of the fused joint+loss path on the real chip.

Breaks the headline step's dominant cost (docs/PERFORMANCE.md component
split) into independently-timed parts at configs[2] shapes:

  loss_vg   value_and_grad of rnnt_loss_fused alone (f, g, w, b traced)
  fwd_k     joint_lp_fwd Pallas kernel alone
  bwd_k     joint_lp_bwd Pallas kernel alone (inputs precomputed)
  alpha     forward_from_lp_with_alpha (lattice recursion, XLA scan)
  occ       occupancies_from_lp (beta recursion + posterior assembly)

Methodology: each part is wrapped as a single jitted state -> state step
whose output feeds the next iteration (dependency-chained), so a Python
loop of n calls enqueues n back-to-back programs with NO eager ops in
between; one device_get closes the chain. Slope between N_small and
N_large cancels the relay sync cost (CLAUDE.md: block_until_ready cannot
be trusted through axon, and eager chaining ops inflate per-iteration
cost by whole relay round-trips — measured 4 ms/iter of pure overhead).

Usage: python tools/bench_loss_parts.py [--b 32] [--t 200] [--u 40]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(run_n, ns=(4, 24), repeats=3):
    """run_n(n) executes n chained iterations then syncs; returns sec/iter."""
    times = []
    for n in ns:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run_n(n)
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (ns[1] - ns[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--t", type=int, default=200)  # post-time_reduction frames
    p.add_argument("--u", type=int, default=40)
    p.add_argument("--joint", type=int, default=512)
    p.add_argument("--vocab", type=int, default=1024)
    p.add_argument("--cdtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.ops import rnnt_joint_fused as fj
    from rnn_transducer_tpu.ops.rnnt_loss import (forward_from_lp_with_alpha,
                                                  occupancies_from_lp)

    B, T, U, J, V = args.b, args.t, args.u, args.joint, args.vocab
    U1 = U + 1
    cdtype = jnp.dtype(args.cdtype)
    log(f"devices: {jax.devices()}  shapes B={B} T={T} U={U} J={J} V={V} "
        f"cdtype={cdtype}")

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(B, T, J)) * 0.3, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U1, J)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.05, jnp.float32)
    b = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    frame_lens = jnp.full((B,), T, jnp.int32)
    label_lens = jnp.full((B,), U, jnp.int32)

    def timed(name, step, state0):
        """step: jitted state -> (state, probe scalar). One call per iter."""
        s, probe = step(state0)  # compile + warm
        jax.device_get(probe)

        def run(n):
            st = state0
            for _ in range(n):
                st, pr = step(st)
            jax.device_get(pr)

        dt = slope(run)
        log(f"{name}: {dt * 1e3:.2f} ms")
        return dt

    # ---- loss value_and_grad (fwd kernel + lattice + occ + bwd kernel) ----
    @jax.jit
    def loss_step(ff):
        def lf(f_):
            return jnp.sum(fj.rnnt_loss_fused(f_, g, w, b, labels,
                                              frame_lens, label_lens, 0,
                                              cdtype))
        L, df = jax.value_and_grad(lf)(ff)
        return ff + 0.0 * df, L

    dt_loss = timed("loss value_and_grad", loss_step, f)

    # ---- forward kernel alone ----
    U1p = -(-U1 // 8) * 8
    g_p = fj._pad_axis(g, 1, 8)
    w_p, b_p = fj._prep_wb(w, b)
    lab = fj._prep_labels(labels, U1p)
    w_c = w_p.astype(cdtype)

    @jax.jit
    def fwd_step(ff):
        lpb, lpy, base = fj.joint_lp_fwd(ff, g_p, lab, w_c, b_p, 0, cdtype)
        return ff + 0.0 * lpb[:, :, :1], lpb[0, 0, 0]

    dt_fwd = timed("fwd kernel", fwd_step, f)

    lpb, lpy, base = jax.jit(lambda f_: fj.joint_lp_fwd(
        f_, g_p, lab, w_c, b_p, 0, cdtype))(f)
    lpb_t, lpy_t = lpb[:, :, :U1], lpy[:, :, :U1]

    # ---- lattice recursions ----
    @jax.jit
    def alpha_step(a):
        L, alpha = forward_from_lp_with_alpha(a, lpy_t, frame_lens,
                                              label_lens)
        return a + 0.0 * L[:, None, None], L[0]

    dt_alpha = timed("alpha (loss fwd lattice)", alpha_step, lpb_t)

    _, alpha0 = jax.jit(lambda a: forward_from_lp_with_alpha(
        a, lpy_t, frame_lens, label_lens))(lpb_t)

    @jax.jit
    def occ_step(a):
        gb, gy = occupancies_from_lp(a, lpy_t, frame_lens, label_lens,
                                     alpha=alpha0)
        return a + 0.0 * gb[:, :, :1], gb[0, 0, 0]

    dt_occ = timed("occupancies (beta + posteriors)", occ_step, lpb_t)

    # ---- backward kernel alone ----
    gb0, gy0 = jax.jit(lambda a: occupancies_from_lp(
        a, lpy_t, frame_lens, label_lens, alpha=alpha0))(lpb_t)
    pad_u = [(0, 0), (0, 0), (0, U1p - U1)]
    gbp = jnp.pad(gb0, pad_u)
    gyp = jnp.pad(gy0, pad_u)
    gbar = jnp.ones((B,), jnp.float32)

    @jax.jit
    def bwd_step(ff):
        df, dg, dw, db = fj.joint_lp_bwd(ff, g_p, lab, w_c, b_p, gbp,
                                         gyp, base, gbar, 0, cdtype)
        return ff + 0.0 * df, db[0, 0]

    dt_bwd = timed("bwd kernel", bwd_step, f)

    log("---- summary (ms) ----")
    log(f"loss_vg {dt_loss * 1e3:.2f} vs parts: fwd_k {dt_fwd * 1e3:.2f} + "
        f"alpha {dt_alpha * 1e3:.2f} + occ {dt_occ * 1e3:.2f} + bwd_k "
        f"{dt_bwd * 1e3:.2f} = "
        f"{(dt_fwd + dt_alpha + dt_occ + dt_bwd) * 1e3:.2f}")
    vp = -(-V // 128) * 128
    mxu_floor = 3 * 2 * B * T * U1p * J * vp / 197e12
    log(f"bwd MXU floor (3 matmuls, bf16 peak): {mxu_floor * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
