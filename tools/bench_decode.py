"""Decode benchmark: greedy + beam-8 RTF and latency (BASELINE.json configs[0,3]).

Runs on the libri100-shaped model (greedy, batch 1 per configs[0]; beam 8
batched per configs[3]) on synthetic features; reports JSON lines with RTF
(processing time / audio time at 10 ms frames) and p50 latency.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke

    cfg = config_greedy_smoke()  # 2x256 enc + 1x256 pred (configs[0] shape)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    T = 500  # 5 s of audio at 10 ms hop
    frame_s = 0.01

    results = []

    # --- configs[0]: single-utterance greedy, batch 1 --------------------
    feats = jnp.asarray(rng.normal(size=(1, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray([T], jnp.int32)
    g = jax.jit(lambda f, l: recognize_greedy(params, cfg, f, l,
                                              max_symbols=100))
    t0 = time.perf_counter()
    jax.device_get(g(feats, fl)[1])
    print(f"greedy compile: {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    laps = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.device_get(g(feats, fl)[1])
        laps.append(time.perf_counter() - t0)
    wall = float(np.median(laps))
    results.append({"mode": "greedy_b1", "rtf": wall / (T * frame_s),
                    "p50_latency_s": wall})

    # --- configs[3]: beam 8 with prefix merging, batch 8 ------------------
    B = 8
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray(np.full((B,), T, np.int32))
    bm = jax.jit(lambda f, l: recognize_beam(params, cfg, f, l, beam=8,
                                             max_symbols=100, expansions=2))
    t0 = time.perf_counter()
    jax.device_get(bm(feats, fl)[2])
    print(f"beam compile: {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    laps = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(bm(feats, fl)[2])
        laps.append(time.perf_counter() - t0)
    wall = float(np.median(laps))
    results.append({"mode": "beam8_b8", "rtf": wall / (B * T * frame_s),
                    "p50_latency_s": wall / B})

    for r in results:
        r = {k: (round(v, 5) if isinstance(v, float) else v)
             for k, v in r.items()}
        print(json.dumps(r))


if __name__ == "__main__":
    main()
