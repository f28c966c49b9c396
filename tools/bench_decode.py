"""Decode benchmark: greedy + beam-8 RTF and latency (BASELINE.json configs[0,3]).

Runs on the greedy_smoke model (2x256 encoder + 1x256 predictor,
configs[0] shapes) on synthetic features. Device compute time is
slope-timed (n_small vs n_large dependency-chained decodes inside one jit,
forced with device_get) — in this environment a single host<->device
round-trip through the axon relay costs ~35 ms, which would otherwise
swamp sub-millisecond decodes. The per-call wall time including one
round-trip is reported separately as e2e_latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_decode(cfg=None, params=None):
    """Slope-timed decode numbers; returns the list of result dicts.

    Importable by bench.py so the driver-captured artifact carries the
    decode half of the metric of record (VERDICT r2 item 2).
    """
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.beam import beam_search
    from rnn_transducer_tpu.decode.greedy import greedy_decode
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke

    if cfg is None:
        cfg = config_greedy_smoke()
    if params is None:
        params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T = 500  # 5 s of audio at 10 ms hop
    frame_s = 0.01

    def slope(make, probe, ns=(2, 12)):
        ts = []
        for n in ns:
            f = jax.jit(make(n))
            jax.device_get(f(probe))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(f(probe))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / (ns[1] - ns[0])

    def e2e(fn, probe, n=10):
        jax.device_get(fn(probe))
        laps = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.device_get(fn(probe))
            laps.append(time.perf_counter() - t0)
        return float(np.median(laps))

    results = []

    # --- configs[0]: single-utterance greedy, batch 1 --------------------
    feats = jnp.asarray(rng.normal(size=(1, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray([T], jnp.int32)
    enc_out, enc_lens = jax.jit(
        lambda f, l: m.encode(params, cfg, f, l))(feats, fl)

    def mk_greedy(n):
        def run(e):
            def body(i, acc):
                toks, lens, _ = greedy_decode(params, cfg, e + acc * 1e-20,
                                              enc_lens, max_symbols=100)
                return acc + lens[0].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    dev_s = slope(mk_greedy, enc_out)
    wall_s = e2e(jax.jit(lambda e: greedy_decode(params, cfg, e, enc_lens,
                                                 max_symbols=100)[:2]),
                 enc_out)
    results.append({"mode": "greedy_b1", "device_ms": dev_s * 1e3,
                    "rtf": dev_s / (T * frame_s),
                    "e2e_latency_ms": wall_s * 1e3})

    # --- configs[3]: beam 8 with prefix merging, batch 8 ------------------
    B = 8
    featsb = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    flb = jnp.asarray(np.full((B,), T, np.int32))
    enc_outb, enc_lensb = jax.jit(
        lambda f, l: m.encode(params, cfg, f, l))(featsb, flb)

    def mk_beam(n):
        def run(e):
            def body(i, acc):
                _, lens, scores, _ = beam_search(
                    params, cfg, e + acc * 1e-20, enc_lensb, beam=8,
                    max_symbols=100, expansions=2)
                return acc + scores[0, 0] * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    dev_s = slope(mk_beam, enc_outb)
    results.append({"mode": "beam8_b8", "device_ms": dev_s * 1e3,
                    "rtf": dev_s / (B * T * frame_s),
                    "p50_latency_ms": dev_s / B * 1e3})
    return results


def measure_encode(cfg=None, params=None, B: int = 8, T: int = 500):
    """Slope-timed encoder forward (the int8 serving kernel's hot path)."""
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke

    if cfg is None:
        cfg = config_greedy_smoke()
    if params is None:
        params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    frame_s = 0.01
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray(np.full((B,), T, np.int32))

    def mk(n):
        def run(f):
            def body(i, acc):
                enc, _ = m.encode(params, cfg, f + acc * 1e-20, fl)
                return acc + jnp.mean(enc) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    ts, ns = [], (2, 12)
    for n in ns:
        f = jax.jit(mk(n))
        jax.device_get(f(feats))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f(feats))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dev_s = (ts[1] - ts[0]) / (ns[1] - ns[0])
    return {"mode": f"encode_b{B}", "device_ms": dev_s * 1e3,
            "rtf": dev_s / (B * T * frame_s)}


def measure_streaming_chunk(cfg=None, params=None, B: int = 8,
                            chunk_frames: int = 32,
                            max_symbols: int = 256):
    """Slope-timed FULL streaming chunk step: encode_chunk + greedy
    decode + cache/state carry — the per-chunk cost a streaming user
    pays (VERDICT r4 item 3). States are CHAINED chunk to chunk inside
    the jitted loop (real cache carry, not a re-initialized step); the
    loop returns a scalar so nothing large crosses the relay. The probe
    params get a +10 blank bias so the untrained model behaves like the
    blank-dominant streams it would serve (otherwise random params emit
    until the token buffer saturates, which is not a representative
    decode-loop shape).
    """
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.streaming import init_stream, stream_chunk
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke

    if cfg is None:
        cfg = config_greedy_smoke()
    if params is None:
        params = m.init_params(jax.random.PRNGKey(0), cfg)
    if not cfg.streamable:
        raise ValueError("config is not streamable")
    params = jax.tree.map(lambda x: x, params)  # shallow copy for the bias
    params["joint"] = dict(params["joint"])
    params["joint"]["out"] = dict(params["joint"]["out"])
    params["joint"]["out"]["b"] = params["joint"]["out"]["b"].at[
        cfg.blank].add(10.0)
    rng = np.random.default_rng(0)
    frame_s = 0.01
    feats = jnp.asarray(rng.normal(size=(B, chunk_frames, cfg.input_dim)),
                        jnp.float32)
    cl = jnp.full((B,), chunk_frames, jnp.int32)

    def mk(n):
        def run(fc):
            st0 = init_stream(params, cfg, B, max_symbols)

            def body(i, carry):
                st, acc = carry
                st2, toks, lens = stream_chunk(
                    params, cfg, st, fc + acc * 1e-20, cl,
                    max_symbols=max_symbols)
                return (st2, acc + jnp.sum(lens).astype(jnp.float32)
                        * 1e-9)
            return jax.lax.fori_loop(0, n, body, (st0, 0.0))[1]
        return run

    ts, ns = [], (2, 12)
    for n in ns:
        f = jax.jit(mk(n))
        jax.device_get(f(feats))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f(feats))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    dev_s = (ts[1] - ts[0]) / (ns[1] - ns[0])
    return {"mode": f"stream_chunk_b{B}_c{chunk_frames}",
            "device_ms": dev_s * 1e3,
            "rtf": dev_s / (B * chunk_frames * frame_s)}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="also benchmark with int8-quantized weights "
                        "(ops/quant.py) — rows tagged _int8")
    p.add_argument("--config", default=None,
                   help="named config (default greedy_smoke)")
    p.add_argument("--streaming-chunk", type=int, default=0, metavar="C",
                   help="also slope-time the full streaming chunk step "
                        "(encode_chunk + decode + cache carry) at "
                        "C-frame chunks (streamable configs only)")
    args = p.parse_args(argv)
    cfg = params = None
    if args.config:
        import jax

        from rnn_transducer_tpu.models import transducer as mm
        from rnn_transducer_tpu.models.config import NAMED_CONFIGS
        cfg = NAMED_CONFIGS[args.config]()
        params = mm.init_params(jax.random.PRNGKey(0), cfg)

    emit = lambda r: print(json.dumps(
        {k: (round(v, 5) if isinstance(v, float) else v)
         for k, v in r.items()}))
    for r in measure_decode(cfg, params):
        emit(r)
    emit(measure_encode(cfg, params))
    if args.streaming_chunk:
        emit(measure_streaming_chunk(cfg, params,
                                     chunk_frames=args.streaming_chunk))
    if args.quantize == "int8":
        import jax

        from rnn_transducer_tpu.models import transducer as mm
        from rnn_transducer_tpu.models.config import config_greedy_smoke
        from rnn_transducer_tpu.ops.quant import quantize_params
        if cfg is None:
            cfg = config_greedy_smoke()
            params = mm.init_params(jax.random.PRNGKey(0), cfg)
        qp = quantize_params(params)
        for r in measure_decode(cfg, qp):
            emit({**r, "mode": r["mode"] + "_int8"})
        r = measure_encode(cfg, qp)
        emit({**r, "mode": r["mode"] + "_int8"})


if __name__ == "__main__":
    main()
