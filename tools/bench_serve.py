"""Serving throughput benchmark: concurrent requests through the
dynamic-batching engine.

  python tools/bench_serve.py --config greedy_smoke --concurrency 16 \
      --requests 128 --frames 200

Fires `--requests` recognitions from `--concurrency` client threads at
the BatchingEngine and reports requests/s, achieved mean batch, and
per-request latency percentiles (one JSON line on stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_streaming(args, params, cfg):
    """Concurrent streaming sessions: S clients each stream one long
    utterance in chunk_frames chunks through the slot engine."""
    from rnn_transducer_tpu.serve import StreamingEngine

    eng = StreamingEngine(params, cfg, slots=args.concurrency,
                          chunk_frames=args.chunk_frames,
                          max_symbols=args.max_symbols,
                          window_ms=args.window_ms,
                          mode=args.mode, beam=args.beam)
    print("warming up...", file=sys.stderr)
    eng.warmup()
    rng = np.random.default_rng(args.seed)
    n_chunks = max(1, args.frames // args.chunk_frames)
    feats = [rng.normal(size=(n_chunks * args.chunk_frames,
                              cfg.input_dim)).astype(np.float32)
             for _ in range(args.concurrency)]
    lat: list[float] = []
    lock = threading.Lock()
    barrier = threading.Barrier(args.concurrency + 1)

    def client(i):
        barrier.wait()
        sid = eng.open_session()
        for k in range(n_chunks):
            t0 = time.perf_counter()
            eng.feed(sid, feats[i][k * args.chunk_frames:
                                   (k + 1) * args.chunk_frames])
            with lock:
                lat.append(time.perf_counter() - t0)
        eng.close_session(sid)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.concurrency)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    eng.close()
    lat.sort()
    total_audio = (args.concurrency * n_chunks * args.chunk_frames
                   * args.frame_hop_s)
    s = eng.stats.summary()
    print(json.dumps({
        "mode": args.mode,
        "streaming_sessions": args.concurrency,
        "chunks_per_s": round(len(lat) / wall, 2),
        "streaming_rtf": round(wall / total_audio, 6),
        "mean_tick_batch": round(s["mean_batch"], 2),
        "p50_chunk_latency_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "p90_chunk_latency_ms": round(lat[int(len(lat) * 0.9)] * 1e3, 2),
        "p99_chunk_latency_ms": round(
            lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1e3, 2),
    }))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="greedy_smoke")
    p.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--max-symbols", type=int, default=50)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--frame-hop-s", type=float, default=0.01)
    p.add_argument("--streaming", action="store_true",
                   help="bench concurrent streaming sessions instead of "
                        "offline dynamic batching")
    p.add_argument("--chunk-frames", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compilation-cache", default=None, metavar="DIR",
                   help="persistent JAX compilation cache dir (beam-mode "
                        "warmup compiles can take >30 min cold through a "
                        "loaded relay; the cache makes repeats seconds)")
    args = p.parse_args(argv)

    import jax

    if args.compilation_cache:
        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from train import get_model_config
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.serve import BatchingEngine

    if args.streaming:
        cfg = get_model_config(args.config)
        params = m.init_params(jax.random.PRNGKey(args.seed), cfg)
        bench_streaming(args, params, cfg)
        return

    cfg = get_model_config(args.config)
    params = m.init_params(jax.random.PRNGKey(args.seed), cfg)
    eng = BatchingEngine(params, cfg, mode=args.mode, beam=args.beam,
                         max_symbols=args.max_symbols,
                         frame_buckets=(args.frames,),
                         max_batch=args.max_batch,
                         window_ms=args.window_ms)
    print("warming up...", file=sys.stderr)
    eng.warmup()

    rng = np.random.default_rng(args.seed)
    feats = [rng.normal(size=(args.frames, cfg.input_dim)).astype(np.float32)
             for _ in range(args.concurrency)]
    lat: list[float] = []
    lat_lock = threading.Lock()
    counter = {"left": args.requests}
    barrier = threading.Barrier(args.concurrency + 1)

    def client(i):
        barrier.wait()
        while True:
            with lat_lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            t0 = time.perf_counter()
            eng.submit(feats[i])
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.concurrency)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    eng.close()

    lat.sort()
    audio_s = args.requests * args.frames * args.frame_hop_s
    s = eng.stats.summary()
    print(json.dumps({
        "requests_per_s": round(args.requests / wall, 2),
        "serving_rtf": round(wall / audio_s, 6),
        "mean_batch": round(s["mean_batch"], 2),
        "p50_latency_ms": round(lat[len(lat) // 2] * 1e3, 2),
        "p90_latency_ms": round(lat[int(len(lat) * 0.9)] * 1e3, 2),
        "p99_latency_ms": round(
            lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1e3, 2),
        "concurrency": args.concurrency,
        "requests": args.requests,
    }))


if __name__ == "__main__":
    main()
