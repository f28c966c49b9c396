"""Count + compile a backoff n-gram LM for on-device shallow fusion.

Input is a training manifest (labels already tokenized with the SAME
tokenizer as the acoustic model). Output is the dense-table artifact
consumed by recognize.py --ngram / models/ngram.py load_ngram. Trains
in seconds — the KenLM role next to tools/train_lm.py's LSTM LM.

  python tools/train_ngram.py --manifest data/train/manifest.jsonl \
      --vocab-size 1024 --order 3 --out /ckpts/lm3gram
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", required=True,
                   help="manifest.jsonl with tokenized labels")
    p.add_argument("--vocab-size", type=int, required=True,
                   help="must equal the acoustic model's vocab_size")
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--discount", type=float, default=0.75)
    p.add_argument("--max-labels", type=int, default=400)
    p.add_argument("--out", required=True,
                   help="artifact path (writes <out>.npz + <out>.meta.json)")
    args = p.parse_args(argv)

    from rnn_transducer_tpu.models.ngram import save_ngram, train_ngram

    seqs = []
    with open(args.manifest) as f:
        for line in f:
            labs = json.loads(line)["labels"]
            if labs:
                seqs.append(labs[: args.max_labels])
    if not seqs:
        raise SystemExit(f"{args.manifest}: no labeled examples")
    lm = train_ngram(seqs, args.order, args.vocab_size,
                     discount=args.discount)
    save_ngram(lm, args.out)
    print(json.dumps({"states": int(lm.lp.shape[0]),
                      "vocab": int(lm.lp.shape[1]),
                      "order": args.order, "sequences": len(seqs),
                      "table_mb": round(lm.lp.size * 5 / 1e6, 2)}))


if __name__ == "__main__":
    main()
