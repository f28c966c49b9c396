"""Profile a training step and print the top device ops by total time.

Formalizes the round-3 profiling recipe from the working notes:
`jax.profiler.start_trace` around N steps, then parse the perfetto JSON
trace (plugins/profile/*/…trace.json.gz) and sum complete ("X") events
on the device track by op name. This is how the r3 kernel wins (saved-
activations LSTM backward, compute-dtype gradient matmuls) were found.

  python tools/profile_step.py --config libri100 --batch-size 32 \
      --steps 5 --top 25 [--out-dir /tmp/prof]

Works on TPU (axon) and CPU (falls back to the host track) — on CPU the
numbers are only good for relative op inventory, not speed.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="libri100")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-frames", type=int, default=400)
    p.add_argument("--max-labels", type=int, default=40)
    p.add_argument("--steps", type=int, default=5,
                   help="traced steps (after an untraced warmup step)")
    p.add_argument("--loss-impl", default="auto")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--out-dir", default=None,
                   help="keep the raw trace here (default: temp dir)")
    p.add_argument("--json", action="store_true",
                   help="print the table as one JSON line instead")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (sitecustomize pre-imports "
                        "jax on the axon platform; this flag is how to "
                        "profile op inventories when no chip is up)")
    return p.parse_args(argv)


def device_op_times(trace_dir: str):
    """Sum complete-event durations by name on the device (TPU) track of
    the newest perfetto trace under trace_dir. Returns (rows, track)
    where rows = [(name, total_us, count)] sorted desc."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid -> process name (device tracks are named "/device:TPU:0" etc.)
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = [pid for pid, n in pnames.items() if "TPU" in n]
    track = "TPU"
    if not device_pids:  # CPU fallback: the busiest non-python process
        device_pids = list(pnames)
        track = "host"
    totals = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            totals[e["name"]] += e.get("dur", 0.0)
            counts[e["name"]] += 1
    rows = sorted(((n, t, counts[n]) for n, t in totals.items()),
                  key=lambda r: -r[1])
    return rows, track


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rnn_transducer_tpu.data.synthetic import learnable_batch
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)
    from train import get_model_config

    cfg = get_model_config(args.config)
    tcfg = TrainConfig(batch_size=args.batch_size, warmup_steps=2,
                       total_steps=100, loss_impl=args.loss_impl)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(0)
    n_labels = max(args.max_labels // 4, 2)
    batch = learnable_batch(rng, args.batch_size, n_labels=n_labels,
                            input_dim=cfg.input_dim, vocab=cfg.vocab_size,
                            frames_per_label=max(
                                args.max_frames // n_labels, 1))
    batch = tuple(jnp.asarray(x) for x in batch)
    state, info = step(state, *batch)  # compile + warm outside the trace
    jax.block_until_ready(info["loss"])

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="rnnt_prof_")
    jax.profiler.start_trace(out_dir)
    for _ in range(args.steps):
        state, info = step(state, *batch)
    loss = float(info["loss"])  # forces completion inside the trace
    jax.profiler.stop_trace()

    rows, track = device_op_times(out_dir)
    total = sum(t for _, t, _ in rows)
    if args.json:
        print(json.dumps({
            "track": track, "steps": args.steps, "loss": round(loss, 4),
            "total_us": round(total, 1),
            "ops": [{"name": n, "us": round(t, 1), "n": c,
                     "pct": round(100 * t / max(total, 1e-9), 2)}
                    for n, t, c in rows[: args.top]]}))
        return
    print(f"# device track: {track}; {args.steps} steps; "
          f"total {total / 1e3:.2f} ms; trace: {out_dir}", file=sys.stderr)
    print(f"{'op':60s} {'total_us':>12s} {'count':>7s} {'%':>6s}")
    for n, t, c in rows[: args.top]:
        print(f"{n[:60]:60s} {t:12.1f} {c:7d} "
              f"{100 * t / max(total, 1e-9):6.2f}")


if __name__ == "__main__":
    main()
