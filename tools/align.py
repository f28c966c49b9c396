"""Forced-alignment CLI: manifest + checkpoint -> per-label emit times.

  python tools/align.py --ckpt-dir /ckpts/libri100 \
      --manifest data/dev/manifest.jsonl --out align.jsonl

Writes one JSON line per utterance: {"i", "emit_frames", "emit_seconds",
"score", "text"?}. Frames are encoder frames; seconds use
frame_hop * time_reduction.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--out", default="-")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--frame-hop-s", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.data.bucketing import bucket_stream
    from rnn_transducer_tpu.data.manifest import manifest_examples
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.ops.rnnt_align import (backtrace_emit_frames,
                                                   rnnt_viterbi)
    from rnn_transducer_tpu.ops.rnnt_loss import _gather_label_logprobs
    from rnn_transducer_tpu.train import checkpoint as ckpt

    try:
        params, cfg, step, meta = ckpt.load_plain_params(args.ckpt_dir,
                                                         seed=args.seed)
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    print(f"loaded checkpoint step {step}", file=sys.stderr)
    cmvn = meta.get("cmvn") if meta else None

    @jax.jit
    def viterbi(p, feats, feat_lens, labels, label_lens):
        logits, enc_lens = m.forward(p, cfg, feats, feat_lens, labels)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        score, K = rnnt_viterbi(lp[..., cfg.blank],
                                _gather_label_logprobs(lp, labels),
                                enc_lens, label_lens)
        return score, K, enc_lens

    out_f = sys.stdout if args.out == "-" else open(args.out, "w")
    sec_per_frame = args.frame_hop_s * cfg.time_reduction
    i = 0
    for feats, fl, labels, ll, nv in bucket_stream(
            manifest_examples(args.manifest, cfg, cmvn=cmvn),
            TrainConfig().buckets, args.batch_size, blank=cfg.blank,
            with_valid=True):
        score, K, enc_lens = viterbi(params, jnp.asarray(feats),
                                     jnp.asarray(fl), jnp.asarray(labels),
                                     jnp.asarray(ll))
        emits = backtrace_emit_frames(K, np.asarray(enc_lens), ll)
        score = np.asarray(score)
        for b in range(nv):
            e = emits[b, : ll[b]].tolist()
            out_f.write(json.dumps({
                "i": i, "emit_frames": e,
                "emit_seconds": [round(t * sec_per_frame, 3) for t in e],
                "score": round(float(score[b]), 4)}) + "\n")
            i += 1
    if out_f is not sys.stdout:
        out_f.close()
        print(json.dumps({"utts": i, "out": args.out}))


if __name__ == "__main__":
    main()
