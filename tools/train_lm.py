"""Train an LSTM language model on label sequences for shallow fusion.

Input is either a training manifest (labels already tokenized — the SAME
tokenizer as the acoustic model, typically the one stored beside it) or
synthetic data for smoke tests. The checkpoint directory is consumed by
recognize.py --lm-ckpt / models/lm.py load_lm.

  python tools/train_lm.py --manifest data/train/manifest.jsonl \
      --vocab-size 1024 --out-dir /ckpts/lm --steps 2000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", default=None,
                   help="manifest.jsonl with tokenized labels; omit for "
                        "synthetic smoke data")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--vocab-size", type=int, required=True,
                   help="must equal the acoustic model's vocab_size")
    p.add_argument("--arch", default="lstm", choices=["lstm", "transformer"],
                   help="LM architecture (transformer = causal decoder "
                        "with KV-cache step decoding, models/"
                        "lm_transformer.py)")
    p.add_argument("--embed-dim", type=int, default=128,
                   help="lstm: embedding dim; transformer: d_model")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--heads", type=int, default=4, help="transformer only")
    p.add_argument("--max-len", type=int, default=512,
                   help="transformer KV-cache capacity (>= decoder "
                        "max_symbols)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-labels", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _label_stream(args):
    rng = np.random.default_rng(args.seed)
    if args.manifest:
        seqs = []
        with open(args.manifest) as f:
            for line in f:
                labs = json.loads(line)["labels"]
                if labs:
                    seqs.append(labs[: args.max_labels])
        if not seqs:
            raise SystemExit(f"{args.manifest}: no labeled examples")
        while True:
            order = rng.permutation(len(seqs))
            for i in range(0, len(order) - args.batch_size + 1,
                           args.batch_size):
                yield [seqs[j] for j in order[i: i + args.batch_size]]
    else:  # synthetic: noisy repeats of a few patterns (learnable)
        pats = [rng.integers(1, args.vocab_size,
                             size=rng.integers(4, 12)).tolist()
                for _ in range(8)]
        while True:
            yield [pats[rng.integers(len(pats))] * 2
                   for _ in range(args.batch_size)]


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax

    from rnn_transducer_tpu.models.lm import (LMConfig, init_lm_params,
                                              lm_loss)
    from rnn_transducer_tpu.models.lm_transformer import TransformerLMConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt

    if args.arch == "transformer":
        cfg = TransformerLMConfig(vocab_size=args.vocab_size,
                                  d_model=args.embed_dim, heads=args.heads,
                                  layers=args.layers, max_len=args.max_len)
    else:
        cfg = LMConfig(vocab_size=args.vocab_size, embed_dim=args.embed_dim,
                       hidden=args.hidden, layers=args.layers)
    params = init_lm_params(jax.random.PRNGKey(args.seed), cfg)
    opt = optax.chain(optax.clip_by_global_norm(5.0),
                      optax.adamw(args.lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, labels, lens):
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(p, cfg, labels, lens))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    U = args.max_labels
    stream = _label_stream(args)
    loss = float("nan")
    for i in range(1, args.steps + 1):
        batch = next(stream)
        lens = np.array([min(len(s), U) for s in batch], np.int32)
        labels = np.zeros((len(batch), U), np.int32)
        for b, s in enumerate(batch):
            labels[b, : lens[b]] = s[: lens[b]]
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(labels), jnp.asarray(lens))
        if i % args.log_every == 0 or i == args.steps:
            print(json.dumps({"step": i, "nll": round(float(loss), 4),
                              "ppl": round(float(np.exp(float(loss))), 2)}),
                  file=sys.stderr)

    ckpt.save_checkpoint(args.out_dir, args.steps, {"params": params},
                         lm_config=dataclasses.asdict(cfg))
    print(json.dumps({"final_nll": round(float(loss), 4),
                      "steps": args.steps, "out_dir": args.out_dir}))


if __name__ == "__main__":
    main()
