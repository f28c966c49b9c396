"""Headline benchmark: RNN-T training throughput (utterances/sec/chip).

Workload = BASELINE.json configs[2]: LibriSpeech train-clean-100 shapes —
4x512 LSTM encoder, batch 32, bucketed batch of (400 frames, 40 labels),
vocab 1024. Runs the full jitted train step (forward + RNN-T loss +
backward + AdamW) on the available TPU chip and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N,
   "mfu": ..., "libri960_utt_per_sec": ..., "libri960_mfu": ...}

vs_baseline divides by the torch-CPU reference stand-in measured by
tools/torch_cpu_baseline.py (cached in tools/cpu_baseline.json; the real
reference repo was unreadable — SURVEY.md §0). MFU uses the analytic
matmul FLOP count (utils/flops.py) against the v5e bf16 peak. The
configs[4] (libri960, 6x1024) measurement rides along as secondary keys.

`--profile-dir DIR` captures a jax.profiler trace of the timed region.
Progress goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_config(cfg, B, T, U, ns=(3, 13), repeats=3, profile_dir=None):
    """Slope-timed ms/step for one config; returns (dt_seconds, mfu)."""
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step
    from rnn_transducer_tpu.utils.flops import mfu as mfu_of
    from rnn_transducer_tpu.utils.logging import device_trace

    tcfg = TrainConfig(batch_size=B, warmup_steps=100, total_steps=10000)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.full((B,), T, np.int32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)),
                         jnp.int32)
    label_lens = jnp.asarray(np.full((B,), U, np.int32))

    t0 = time.perf_counter()
    state, info = step(state, feats, feat_lens, labels, label_lens)
    loss0 = float(jax.device_get(info["loss"]))
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
        f"loss={loss0:.2f}")

    # Slope timing: N_small vs N_large chained steps, each run forced to
    # completion with device_get (block_until_ready can return early through
    # the axon relay); the difference cancels the fixed sync overhead.
    times = []
    with device_trace(profile_dir):
        for n in ns:
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                for _ in range(n):
                    state, info = step(state, feats, feat_lens, labels,
                                       label_lens)
                jax.device_get(info["loss"])
                best = min(best, time.perf_counter() - t0)
            times.append(best)
    dt = (times[1] - times[0]) / (ns[1] - ns[0])
    return dt, mfu_of(cfg, B, T, U, dt)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the timed region")
    p.add_argument("--skip-libri960", action="store_true")
    p.add_argument("--skip-decode", action="store_true")
    p.add_argument("--skip-conformer", action="store_true")
    args = p.parse_args(argv)

    import jax

    from rnn_transducer_tpu.models.config import (config_libri100,
                                                  config_libri100_conformer,
                                                  config_libri960)

    log(f"devices: {jax.devices()}")

    # headline: configs[2] (LibriSpeech train-clean-100 shapes)
    dt, mfu = measure_config(config_libri100(), B=32, T=400, U=40,
                             profile_dir=args.profile_dir)
    utt_per_sec = 32 / dt
    log(f"libri100: {dt * 1e3:.1f} ms/step -> {utt_per_sec:.1f} utt/s/chip, "
        f"MFU {mfu:.1%}")

    out = {
        "metric": "rnnt_train_throughput_libri100_cfg",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": None,
        "mfu": round(mfu, 4),
    }

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tools", "cpu_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            cpu = json.load(f)
        out["vs_baseline"] = round(utt_per_sec / cpu["utterances_per_sec"], 2)
        log(f"torch-CPU baseline: {cpu['utterances_per_sec']:.3f} utt/s -> "
            f"{out['vs_baseline']:.1f}x")

    # secondary: configs[4] (LibriSpeech 960h shapes, 6x1024 char).
    # configs[4] pins no batch size, so the artifact records the best
    # supported configuration: B=64 engages the BT=64 batch tile of the
    # v2 Pallas LSTM kernels (docs/PERFORMANCE.md B-sweep — VERDICT r2).
    if not args.skip_libri960:
        B9 = 64
        dt9, mfu9 = measure_config(config_libri960(), B=B9, T=400, U=60)
        log(f"libri960 (B={B9}): {dt9 * 1e3:.1f} ms/step -> "
            f"{B9 / dt9:.1f} utt/s/chip, MFU {mfu9:.1%}")
        out["libri960_utt_per_sec"] = round(B9 / dt9, 2)
        out["libri960_mfu"] = round(mfu9, 4)
        out["libri960_batch"] = B9

    # secondary: the conformer encoder family (VERDICT r3 item 3 — the
    # matmul-dense second encoder needs a driver-captured perf record).
    # libri100_conformer = configs[2]'s parameter-matched conformer twin
    # (8 x d=512 blocks, 4x frame stacking; models/config.py).
    if not args.skip_conformer:
        # B=64 is the conformer's best measured batch (B=32/64/128 sweep
        # in docs/PERFORMANCE.md) — the config isn't batch-pinned by any
        # driver config, so like libri960 it reports its best batch.
        Bc = 64
        dtc, mfuc = measure_config(config_libri100_conformer(),
                                   B=Bc, T=400, U=40)
        log(f"libri100_conformer (B={Bc}): {dtc * 1e3:.1f} ms/step -> "
            f"{Bc / dtc:.1f} utt/s/chip, MFU {mfuc:.1%}")
        out["conformer_utt_per_sec"] = round(Bc / dtc, 2)
        out["conformer_mfu"] = round(mfuc, 4)
        out["conformer_batch"] = Bc

        # conformer decode + streaming chunk step (VERDICT r4 item 3:
        # the numbers a user of the streaming-conformer feature needs).
        # Non-fatal: a failure here must not cost the driver the whole
        # bench line.
        try:
            _conformer_decode_keys(args, out, log)
        except Exception as e:  # noqa: BLE001
            log(f"conformer decode keys failed: {e!r}")

    # decode half of the metric of record (BASELINE.json: "decode RTF +
    # p50 latency at beam=8"): slope-timed via tools/bench_decode.py.
    if not args.skip_decode:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_decode import measure_decode
        for r in measure_decode():
            if r["mode"] == "greedy_b1":
                out["greedy_b1_rtf"] = round(r["rtf"], 6)
                log(f"greedy b1 RTF {r['rtf']:.5f}")
            elif r["mode"] == "beam8_b8":
                out["beam8_rtf"] = round(r["rtf"], 6)
                out["beam8_p50_ms"] = round(r["p50_latency_ms"], 3)
                log(f"beam8 RTF {r['rtf']:.5f}, "
                    f"p50 {r['p50_latency_ms']:.2f} ms")

    print(json.dumps(out))


def _conformer_decode_keys(args, out, log):
    if args.skip_decode:
        return
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from bench_decode import measure_decode, measure_streaming_chunk

    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import (
        config_libri100_conformer,
        config_libri100_conformer_chunked,
    )
    cfgc = config_libri100_conformer()
    paramsc = m.init_params(jax.random.PRNGKey(0), cfgc)
    for r in measure_decode(cfgc, paramsc):
        if r["mode"] == "greedy_b1":
            out["conformer_greedy_b1_rtf"] = round(r["rtf"], 6)
            log(f"conformer greedy b1 RTF {r['rtf']:.5f}")
        elif r["mode"] == "beam8_b8":
            out["conformer_beam8_rtf"] = round(r["rtf"], 6)
            out["conformer_beam8_p50_ms"] = round(r["p50_latency_ms"], 3)
            log(f"conformer beam8 RTF {r['rtf']:.5f}, "
                f"p50 {r['p50_latency_ms']:.2f} ms")
    # chunked-attention config: the ENCODED chunk must be a multiple of
    # enc_chunk_att (32) — 128 input frames at 4x stacking
    cfgs = config_libri100_conformer_chunked()
    paramss = m.init_params(jax.random.PRNGKey(0), cfgs)
    cfr = 32 * cfgs.time_reduction
    r = measure_streaming_chunk(cfgs, paramss, B=8, chunk_frames=cfr)
    out["conformer_stream_chunk_rtf"] = round(r["rtf"], 6)
    out["conformer_stream_chunk_ms"] = round(r["device_ms"], 3)
    log(f"conformer stream chunk (B=8, {cfr} frames): "
        f"{r['device_ms']:.2f} ms, RTF {r['rtf']:.5f}")


if __name__ == "__main__":
    main()
