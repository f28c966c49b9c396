"""On-chip validation of the remaining round-3 additions (PERFORMANCE.md).

Three measurements, each slope-timed with the repo's standard recipe
(dependency-chained `lax.fori_loop(n)` inside one jit, n_small vs
n_large — the loop traces ONCE so compile cost is independent of n, and
a single host sync through the axon relay costs ~35 ms which would
otherwise swamp the numbers):

1. CTC multitask train-step cost: libri100 config (ctc_head=True) with
   ctc_weight=0.3 vs the plain RNN-T step — the marginal price of the
   auxiliary CTC loss on the shared encoder.
2. Transformer-LM fused beam-8 RTF: greedy_smoke beam-8 with a
   4-layer transformer LM shallow-fused (weight 0.5) vs no LM.
3. Chunked-attention conformer encode vs the causal (left-window) form
   at equal size: the chunked variant's in-chunk future attention is
   one extra mask, so the slopes should be ~equal.

Usage: python tools/bench_r3_extras.py [--part ctc|lm|conformer|all]
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
    print(*a, flush=True)


def slope(make, probe, ns=(2, 10)):
    """ms per unit: make(n) -> fn(probe), timed at n_small vs n_large."""
    import jax
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
    return (ts[1] - ts[0]) / (ns[1] - ns[0]) * 1e3


def bench_ctc_multitask():
    """libri100 train step: plain vs +0.3*CTC on the shared encoder."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                  config_libri100)
    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

    B, T, U = 32, 400, 40
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 1024, (B, U)), jnp.int32)
    ll = jnp.full((B,), U, jnp.int32)

    rows = []
    for name, ctc_w in (("rnnt_only", 0.0), ("ctc_multitask_0.3", 0.3)):
        cfg = dataclasses.replace(config_libri100(), ctc_head=ctc_w > 0)
        tcfg = TrainConfig(batch_size=B, total_steps=1000, ctc_weight=ctc_w)
        state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        raw = make_train_step(cfg, tcfg)

        def make(n, raw=raw):
            # The loop returns ONLY the last step's scalar loss: returning
            # the TrainState would device_get the full params+opt state
            # through the axon relay every timing rep (~100+ MB whose
            # transfer noise swamps the slope — measured as negative
            # ms/step before this fix).
            def run(probe):
                s0, f = probe

                def body(i, carry):
                    s, _ = carry
                    s2, info = raw(s, f, fl, labels, ll)
                    return (s2, info["loss"])

                return jax.lax.fori_loop(
                    0, n, body, (s0, jnp.zeros((), jnp.float32)))[1]
            return run

        ms = slope(make, (state, feats), ns=(2, 8))
        log(f"  [{name}] {ms:.2f} ms/step")
        rows.append({"workload": name, "ms_per_step": round(ms, 2)})
    return rows


def bench_lm_beam():
    """greedy_smoke beam-8 RTF: no LM vs fused 4-layer transformer LM."""
    import jax
    import jax.numpy as jnp
    from rnn_transducer_tpu.decode.beam import beam_search
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke
    from rnn_transducer_tpu.models.lm_transformer import (
        TransformerLMConfig, init_transformer_lm_params)

    cfg = config_greedy_smoke()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    lm_cfg = TransformerLMConfig(vocab_size=cfg.vocab_size, d_model=256,
                                 layers=4, heads=4)
    lm_params = init_transformer_lm_params(jax.random.PRNGKey(1), lm_cfg)

    B, T = 8, 500
    frame_s = 0.01
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    enc_out, enc_lens = jax.jit(lambda f, l: m.encode(params, cfg, f, l))(
        feats, fl)

    rows = []
    for name, lm in (("beam8_no_lm", None),
                     ("beam8_transformer_lm", (lm_params, lm_cfg, 0.5))):
        def make(n, lm=lm):
            def run(e):
                def body(i, acc):
                    out = beam_search(params, cfg, e + acc * 1e-20,
                                      enc_lens, beam=8, max_symbols=100,
                                      expansions=2, lm=lm)
                    return acc + out[2][0, 0] * 1e-9
                return jax.lax.fori_loop(0, n, body, 0.0)
            return run

        t0 = time.perf_counter()
        ms = slope(make, enc_out, ns=(2, 8))
        rtf = ms / 1e3 / (B * T * frame_s)
        log(f"  [{name}] {ms:.1f} ms/batch (B={B}, {T * frame_s:.0f}s "
            f"audio each) -> RTF {rtf:.5f}, p50 {ms / B:.2f} ms  "
            f"[total incl. compiles {time.perf_counter() - t0:.0f}s]")
        rows.append({"workload": name, "ms_per_batch": round(ms, 1),
                     "rtf": round(rtf, 5),
                     "p50_latency_ms": round(ms / B, 2)})
    return rows


def bench_conformer_chunked():
    """Chunked-attention vs causal conformer encode at equal size."""
    import jax
    import jax.numpy as jnp
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import (
        config_libri100_conformer_chunked, config_libri100_conformer_stream)

    B, T = 8, 512
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, 80)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)

    rows = []
    for name, cfg in (("conformer_causal", config_libri100_conformer_stream()),
                      ("conformer_chunked",
                       config_libri100_conformer_chunked())):
        params = m.init_params(jax.random.PRNGKey(0), cfg)

        def make(n, params=params, cfg=cfg):
            def run(f):
                def body(i, acc):
                    e, _ = m.encode(params, cfg, f + acc * 1e-20, fl)
                    return acc + jnp.mean(e) * 1e-9
                return jax.lax.fori_loop(0, n, body, 0.0)
            return run

        ms = slope(make, feats)
        log(f"  [{name}] encode (B={B}, T={T}): {ms:.2f} ms")
        rows.append({"workload": name, "encode_ms": round(ms, 2)})
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--part", default="all",
                   choices=["ctc", "lm", "conformer", "all"])
    args = p.parse_args(argv)
    import jax
    log("devices:", jax.devices())
    rows = []
    if args.part in ("ctc", "all"):
        log("== CTC multitask train-step cost ==")
        rows += bench_ctc_multitask()
    if args.part in ("conformer", "all"):
        log("== chunked vs causal conformer encode ==")
        rows += bench_conformer_chunked()
    if args.part in ("lm", "all"):
        log("== transformer-LM fused beam-8 ==")
        rows += bench_lm_beam()
    log(json.dumps(rows))


if __name__ == "__main__":
    main()
