"""Slope-timed training-step benchmark for any named config.

Usage:
  python tools/bench_train.py --config libri960 --batch-size 16 \
      --frames 400 --labels 60

Prints one JSON line with ms/step, utt/s/chip and (analytic) MFU.
Timing is slope-based (N_small vs N_large chained steps, each forced with
device_get) — block_until_ready can return early through the axon relay.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="libri100")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--labels", type=int, default=40)
    p.add_argument("--loss-impl", default="auto")
    p.add_argument("--ns", type=int, nargs=2, default=(3, 13))
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.models.config import NAMED_CONFIGS, TrainConfig
    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step
    from rnn_transducer_tpu.utils.flops import train_step_flops

    cfg = NAMED_CONFIGS[args.config]()
    B, T, U = args.batch_size, args.frames, args.labels
    tcfg = TrainConfig(batch_size=B, warmup_steps=100, total_steps=10000,
                       loss_impl=args.loss_impl)

    log(f"devices: {jax.devices()}")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.full((B,), T, np.int32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)), jnp.int32)
    label_lens = jnp.asarray(np.full((B,), U, np.int32))

    t0 = time.perf_counter()
    state, info = step(state, feats, feat_lens, labels, label_lens)
    loss0 = float(jax.device_get(info["loss"]))
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s, loss={loss0:.2f}")

    ns = tuple(args.ns)
    times = []
    for n in ns:
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                state, info = step(state, feats, feat_lens, labels, label_lens)
            jax.device_get(info["loss"])
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    dt = (times[1] - times[0]) / (ns[1] - ns[0])
    utt_per_sec = B / dt

    flops = train_step_flops(cfg, B, T, U)
    mfu = flops / dt / 197e12  # v5e bf16 peak = 197 TFLOP/s
    out = {
        "config": args.config, "B": B, "T": T, "U": U,
        "ms_per_step": round(dt * 1e3, 2),
        "utt_per_sec_chip": round(utt_per_sec, 1),
        "step_tflops": round(flops / 1e12, 3),
        "mfu": round(mfu, 4),
    }
    log(f"slope-timed: {out['ms_per_step']} ms/step -> "
        f"{out['utt_per_sec_chip']} utt/s/chip, MFU {mfu:.1%}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
