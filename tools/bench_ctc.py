"""CTC multitask marginal cost (VERDICT r4 item 4): slope-times the
libri100 train step with and without the auxiliary CTC head, pricing
`--ctc-weight` after the round-5 analytic-backward CTC
(ops/ctc_loss.py custom VJP: beta recursion + MXU one-hot scatter,
replacing autodiff-through-the-scan whose take_along_axis backward was
an XLA scatter-add). Round-4 price: 13.56 -> 25.28 ms/step (+86%).

Usage: python tools/bench_ctc.py [--b 32] [--t 400] [--u 40]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_step(cfg, tcfg, B, T, U, ns=(3, 13)):
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)),
                         jnp.int32)
    ll = jnp.full((B,), U, jnp.int32)
    t0 = time.perf_counter()
    state, info = step(state, feats, fl, labels, ll)
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(jax.device_get(info['loss'])):.2f}",
          file=sys.stderr, flush=True)
    ts = []
    for n in ns:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                state, info = step(state, feats, fl, labels, ll)
            jax.device_get(info["loss"])
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (ns[1] - ns[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--t", type=int, default=400)
    p.add_argument("--u", type=int, default=40)
    p.add_argument("--ctc-weight", type=float, default=0.3)
    args = p.parse_args(argv)

    import jax

    from rnn_transducer_tpu.models.config import TrainConfig, config_libri100

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    cfg = dataclasses.replace(config_libri100(), ctc_head=True)
    rows = []
    for name, w in (("plain", 0.0), ("ctc", args.ctc_weight)):
        tcfg = TrainConfig(batch_size=args.b, warmup_steps=100,
                           total_steps=10000, ctc_weight=w)
        print(f"== {name} (ctc_weight={w}) ==", file=sys.stderr, flush=True)
        dt = slope_step(cfg, tcfg, args.b, args.t, args.u)
        rows.append({"mode": name, "ms_per_step": round(dt * 1e3, 2),
                     "utt_per_s": round(args.b / dt, 1)})
        print(json.dumps(rows[-1]), flush=True)
    if len(rows) == 2:
        rows.append({"mode": "ctc_marginal_ms",
                     "ms_per_step": round(rows[1]["ms_per_step"]
                                          - rows[0]["ms_per_step"], 2)})
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
