"""Headline benchmark: RNN-T training throughput (utterances/sec/chip).

Workload = BASELINE.json configs[2]: LibriSpeech train-clean-100 shapes —
4x512 LSTM encoder, batch 32, bucketed batch of (400 frames, 40 labels),
vocab 1024. Runs the full jitted train step (forward + RNN-T loss +
backward + AdamW) on the available TPU chip and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

vs_baseline divides by the torch-CPU reference stand-in measured by
tools/torch_cpu_baseline.py (cached in tools/cpu_baseline.json; the real
reference repo was unreadable — SURVEY.md §0). Progress goes to stderr;
stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.models.config import TrainConfig, config_libri100
    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

    cfg = config_libri100()
    B, T, U = 32, 400, 40
    tcfg = TrainConfig(batch_size=B, warmup_steps=100, total_steps=10000)

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
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
        f"loss={loss0:.2f}")

    # Slope timing: N_small vs N_large chained steps, each run forced to
    # completion with device_get (block_until_ready can return early through
    # the axon relay); the difference cancels the fixed sync overhead.
    ns = (3, 13)
    times = []
    for n in ns:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                state, info = step(state, feats, feat_lens, labels,
                                   label_lens)
            jax.device_get(info["loss"])
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    dt = (times[1] - times[0]) / (ns[1] - ns[0])
    utt_per_sec = B / dt
    log(f"slope-timed: {dt * 1e3:.1f} ms/step -> {utt_per_sec:.1f} utt/s/chip")

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tools", "cpu_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu = json.load(f)
        vs_baseline = utt_per_sec / cpu["utterances_per_sec"]
        log(f"torch-CPU baseline: {cpu['utterances_per_sec']:.3f} utt/s -> "
            f"{vs_baseline:.1f}x")

    print(json.dumps({
        "metric": "rnnt_train_throughput_libri100_cfg",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
