"""Average the parameters of the last K checkpoints (ASR-family staple).

Checkpoint averaging over the final epochs is the standard cheap WER
improvement in transducer training recipes. Optimizer state is taken from
the newest checkpoint; only `params` are averaged.

Usage:
  python tools/average_checkpoints.py --ckpt-dir /tmp/ck --last 5 \
      [--out-step N]   # default: newest step + 1

The result is saved back into the same checkpoint directory (meta.json
untouched), so recognize.py/--resume pick it up as the latest step.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def average_checkpoints(ckpt_dir: str, last: int, out_step: int | None = None):
    import jax

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import TrainState, init_train_state

    cfg = ckpt.load_model_config(ckpt_dir)
    if cfg is None:
        raise SystemExit(f"{ckpt_dir}/meta.json missing model_config")
    meta = ckpt.load_meta(ckpt_dir) or {}
    tcfg = TrainConfig(**meta.get("train_config", {})) if isinstance(
        meta.get("train_config"), dict) else TrainConfig()
    template = dataclasses.asdict(
        init_train_state(jax.random.PRNGKey(0), cfg, tcfg))

    steps = sorted(ckpt.all_steps(ckpt_dir))[-last:]
    if len(steps) < 2:
        raise SystemExit(f"need >= 2 checkpoints, found {steps}")
    acc = None
    newest = None
    for s in steps:
        tree, _ = ckpt.restore_checkpoint(ckpt_dir, template, step=s)
        newest = tree
        p = tree["params"]
        acc = p if acc is None else jax.tree.map(lambda a, b: a + b, acc, p)
    n = float(len(steps))
    avg = jax.tree.map(lambda a: (np.asarray(a) / n).astype(np.asarray(a).dtype)
                       if np.issubdtype(np.asarray(a).dtype, np.floating)
                       else np.asarray(a), acc)
    out_step = out_step if out_step is not None else steps[-1] + 1
    state = TrainState(params=avg, opt_state=newest["opt_state"],
                       step=newest["step"])
    ckpt.save_checkpoint(ckpt_dir, out_step, dataclasses.asdict(state))
    return steps, out_step


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--last", type=int, default=5)
    p.add_argument("--out-step", type=int, default=None)
    args = p.parse_args(argv)
    steps, out_step = average_checkpoints(args.ckpt_dir, args.last,
                                          args.out_step)
    print(json.dumps({"averaged_steps": steps, "out_step": out_step}))


if __name__ == "__main__":
    main()
