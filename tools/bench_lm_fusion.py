"""LM shallow-fusion decode cost: the side-by-side table VERDICT r4
item 8 asked for — plain beam-8 vs LSTM-LM fusion (the supported cheap
path) vs transformer-LM fusion with f32 and bf16 KV caches (the
round-5 mitigation: `TransformerLMConfig.cache_dtype="bfloat16"` halves
the per-round cache gather/rewrite HBM traffic that dominates the ~90x
transformer-fusion cost priced in docs/PERFORMANCE.md).

Slope-timed on the greedy_smoke AM at T=500 (5 s audio), B=8, beam 8 —
the same harness shapes as the round-4 transformer-LM row.

Usage: python tools/bench_lm_fusion.py [--t 500] [--rows lstm,tr32,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=500)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--max-symbols", type=int, default=100)
    p.add_argument("--rows", default="plain,lstm,tr32,tr16",
                   help="comma list of plain|lstm|tr32|tr16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.beam import beam_search
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import config_greedy_smoke
    from rnn_transducer_tpu.models.lm import LMConfig, init_lm_params
    from rnn_transducer_tpu.models.lm_transformer import TransformerLMConfig

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    cfg = config_greedy_smoke()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    B, T, K = args.batch, args.t, args.beam
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    enc_out, enc_lens = jax.jit(
        lambda f, l: m.encode(params, cfg, f, l))(feats, fl)

    lms = {"plain": None}
    lstm_cfg = LMConfig(vocab_size=cfg.vocab_size, embed_dim=128,
                        hidden=256, layers=1)
    lms["lstm"] = (init_lm_params(jax.random.PRNGKey(1), lstm_cfg),
                   lstm_cfg, 0.3)
    for tag, cdt in (("tr32", "float32"), ("tr16", "bfloat16")):
        tr_cfg = TransformerLMConfig(vocab_size=cfg.vocab_size, d_model=256,
                                     heads=4, layers=4, max_len=512,
                                     cache_dtype=cdt)
        lms[tag] = (init_lm_params(jax.random.PRNGKey(1), tr_cfg),
                    tr_cfg, 0.3)

    def slope(lm, ns=(2, 8)):
        def mk(n):
            def run(e):
                def body(i, acc):
                    _, lens, scores, _ = beam_search(
                        params, cfg, e + acc * 1e-20, enc_lens, beam=K,
                        max_symbols=args.max_symbols, expansions=2, lm=lm)
                    return acc + scores[0, 0] * 1e-9
                return jax.lax.fori_loop(0, n, body, 0.0)
            return run
        ts = []
        for n in ns:
            f = jax.jit(mk(n))
            t0 = time.perf_counter()
            jax.device_get(f(enc_out))
            print(f"  compile+first n={n}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(f(enc_out))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / (ns[1] - ns[0])

    rows = []
    for tag in args.rows.split(","):
        print(f"== {tag} ==", file=sys.stderr, flush=True)
        dev_s = slope(lms[tag])
        rows.append({
            "mode": f"beam{K}_{tag}", "device_ms": round(dev_s * 1e3, 2),
            "rtf": round(dev_s / (B * T * 0.01), 6),
            "p50_ms_per_utt": round(dev_s / B * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
