"""Sweep the beam-search `expansions` cap on a trained checkpoint.

`expansions` bounds label emissions per frame before a forced blank
(latency-controlled beam search); the batched device search is exact only
when it is >= the true max emissions/frame. This tool quantifies the cost
of the cap on a trained model: for each value it reports corpus WER, the
mean top-hypothesis log-prob, and top-1 agreement with the largest
(effectively uncapped) setting.

Usage:
  python tools/sweep_expansions.py --ckpt-dir /tmp/ck_sweep \
      --expansions 1 2 3 5 8 --beam 8 --frames-per-label 2

Prints one JSON line per expansions value.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--expansions", type=int, nargs="+",
                   default=(1, 2, 3, 5, 8))
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-symbols", type=int, default=48)
    p.add_argument("--n-labels", type=int, default=20)
    p.add_argument("--frames-per-label", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.data.synthetic import learnable_batch
    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.metrics import error_rate, tokens_to_lists
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import TrainState, init_train_state

    cfg = ckpt.load_model_config(args.ckpt_dir)
    if cfg is None:
        raise SystemExit(f"no meta.json with model_config in {args.ckpt_dir}")
    state = init_train_state(jax.random.PRNGKey(0), cfg, TrainConfig())
    tree, step = ckpt.restore_checkpoint(args.ckpt_dir,
                                         dataclasses.asdict(state))
    params = TrainState(**tree).params
    log(f"devices: {jax.devices()}; checkpoint step {step}")

    # Fixed eval set. frames_per_label=2 with time_reduction=2 averages one
    # emission per encoder frame, so small caps genuinely bind.
    rng = np.random.default_rng(args.seed + 1)
    batches = [learnable_batch(rng, args.batch_size, n_labels=args.n_labels,
                               input_dim=cfg.input_dim, vocab=cfg.vocab_size,
                               frames_per_label=args.frames_per_label)
               for _ in range(args.batches)]
    refs = []
    for _, _, lab, ll in batches:
        refs.extend(tokens_to_lists(lab, ll))

    results = {}
    for e in args.expansions:
        fn = jax.jit(lambda p, f, l, e=e: recognize_beam(
            p, cfg, f, l, beam=args.beam, max_symbols=args.max_symbols,
            expansions=e))
        hyps, scores = [], []
        wall = 0.0
        for i, (feats, fl, _, _) in enumerate(batches):
            f, l = jnp.asarray(feats), jnp.asarray(fl)
            if i == 0:
                jax.device_get(fn(params, f, l))  # compile warmup (the
                # axon relay's block_until_ready can return early)
            t0 = time.perf_counter()
            toks, lens, sc = jax.device_get(fn(params, f, l))
            wall += time.perf_counter() - t0
            hyps.extend(tokens_to_lists(toks[:, 0], lens[:, 0]))
            scores.extend(np.asarray(sc[:, 0]).tolist())
        results[e] = {"wer": error_rate(refs, hyps), "hyps": hyps,
                      "mean_score": float(np.mean(scores)), "wall_s": wall}

    e_max = max(args.expansions)
    base = results[e_max]
    for e in args.expansions:
        r = results[e]
        agree = float(np.mean([h == b for h, b in
                               zip(r["hyps"], base["hyps"])]))
        print(json.dumps({
            "expansions": e, "beam": args.beam,
            "wer": round(r["wer"], 4),
            "mean_top_logprob": round(r["mean_score"], 3),
            "score_delta_vs_max": round(r["mean_score"] - base["mean_score"],
                                        4),
            "top1_agreement_vs_max": round(agree, 4),
            "wall_s": round(r["wall_s"], 3),
        }))


if __name__ == "__main__":
    main()
