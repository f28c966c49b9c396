"""Slope-timed on-chip comparison: pruned two-pass loss vs fused full
lattice at the libri100 headline shapes (BASELINE configs[2]).

Usage: python tools/bench_pruned.py [--ranges 8 16] [--batch 32]
Prints ms/step + utt/s for loss_impl=fused and each pruned_range.
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def measure(cfg, tcfg, B, T, U, ns=(3, 13), repeats=2):
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray(np.full((B,), T, np.int32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)),
                         jnp.int32)
    ll = jnp.asarray(np.full((B,), U, np.int32))

    t0 = time.perf_counter()
    state, info = step(state, feats, fl, labels, ll)
    loss0 = float(jax.device_get(info["loss"]))
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={loss0:.2f}", file=sys.stderr)
    times = []
    for n in ns:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                state, info = step(state, feats, fl, labels, ll)
            jax.device_get(info["loss"])
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (ns[1] - ns[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ranges", type=int, nargs="+", default=[8, 16])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--config", default="libri100")
    p.add_argument("--vocab", type=int, default=0,
                   help="override vocab size (large-vocab scenario)")
    p.add_argument("--labels", type=int, default=40, help="U per utterance")
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--baseline", default="auto",
                   choices=["auto", "fused", "pallas", "xla", "none"],
                   help="full-lattice impl to compare against")
    args = p.parse_args()

    import jax

    from rnn_transducer_tpu.models.config import NAMED_CONFIGS, TrainConfig

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg0 = NAMED_CONFIGS[args.config]()
    if args.vocab:
        cfg0 = dataclasses.replace(cfg0, vocab_size=args.vocab)
    B, T, U = args.batch, args.frames, args.labels

    if args.baseline != "none":
        tcfg = TrainConfig(batch_size=B, warmup_steps=100,
                           total_steps=10000, loss_impl=args.baseline)
        dt = measure(cfg0, tcfg, B, T, U)
        print(f"{args.baseline:<10}: {dt*1e3:7.2f} ms/step  "
              f"{B/dt:8.1f} utt/s")

    for S in args.ranges:
        cfg = dataclasses.replace(cfg0, pruned_range=S)
        tcfg = TrainConfig(batch_size=B, warmup_steps=100,
                           total_steps=10000, loss_impl="pruned")
        dt = measure(cfg, tcfg, B, T, U)
        print(f"pruned S={S:2d}: {dt*1e3:7.2f} ms/step  {B/dt:8.1f} utt/s")


if __name__ == "__main__":
    main()
