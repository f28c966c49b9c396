"""Recognition server CLI: dynamic-batching offline decode + streaming
session slots over HTTP (rnn_transducer_tpu/serve.py).

  python serve.py --ckpt-dir /ckpts/libri100 --port 8000
  curl -XPOST localhost:8000/recognize -d '{"feats": [[...80 floats...]]}'
  curl -XPOST localhost:8000/session                      # -> {"sid": ...}
  curl -XPOST localhost:8000/session/<sid> -d '{"feats": [[...]]}'
  curl -XDELETE localhost:8000/session/<sid>
  curl localhost:8000/stats

The checkpoint is self-describing (model config + tokenizer from
meta.json); text transcripts are included whenever a tokenizer is known.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU RNN-T recognition server")
    p.add_argument("--ckpt-dir", default=None,
                   help="self-describing checkpoint; omit for fresh "
                        "weights (--config)")
    p.add_argument("--config", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--max-symbols", type=int, default=100)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--frame-buckets", type=int, nargs="+",
                   default=[200, 400, 800])
    p.add_argument("--stream-slots", type=int, default=8,
                   help="0 disables the streaming endpoints")
    p.add_argument("--chunk-frames", type=int, default=32)
    p.add_argument("--lm-ckpt", default=None)
    p.add_argument("--lm-weight", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_model(args):
    import jax

    from train import get_model_config
    from rnn_transducer_tpu.data.tokenizer import tokenizer_from_meta
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import TrainState, init_train_state
    import dataclasses as dc

    saved_cfg = (ckpt.load_model_config(args.ckpt_dir)
                 if args.ckpt_dir else None)
    if args.config is not None:
        cfg = get_model_config(args.config)
        if saved_cfg is not None and saved_cfg != cfg:
            raise SystemExit("--config does not match the checkpoint")
    else:
        cfg = saved_cfg if saved_cfg is not None else get_model_config("smoke")
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg,
                             TrainConfig())
    tok = None
    if args.ckpt_dir:
        tree, step = ckpt.restore_checkpoint(args.ckpt_dir,
                                             dc.asdict(state))
        state = TrainState(**tree)
        print(f"loaded checkpoint step {step}", file=sys.stderr)
        meta = ckpt.load_meta(args.ckpt_dir) or {}
        if meta.get("tokenizer"):
            tok = tokenizer_from_meta(meta["tokenizer"])
    return state.params, cfg, tok


def main(argv=None):
    args = parse_args(argv)
    from rnn_transducer_tpu.serve import (BatchingEngine, StreamingEngine,
                                          http_server)

    params, cfg, tok = load_model(args)
    lm = None
    if args.lm_ckpt:
        from rnn_transducer_tpu.models.lm import load_lm
        lm_params, lm_cfg = load_lm(args.lm_ckpt)
        lm = (lm_params, lm_cfg, args.lm_weight)
    offline = BatchingEngine(
        params, cfg, mode=args.mode, beam=args.beam,
        max_symbols=args.max_symbols, frame_buckets=args.frame_buckets,
        max_batch=args.max_batch, window_ms=args.window_ms, lm=lm)
    streaming = None
    if args.stream_slots > 0 and not cfg.bidirectional:
        streaming = StreamingEngine(
            params, cfg, slots=args.stream_slots,
            chunk_frames=args.chunk_frames, max_symbols=args.max_symbols,
            mode=args.mode, beam=args.beam, lm=lm)
    print("warming up (one compile per bucket)...", file=sys.stderr)
    offline.warmup()
    if streaming is not None:
        streaming.warmup()
    srv = http_server(args.host, args.port, offline, streaming, tok)
    print(f"serving on http://{args.host}:{srv.server_address[1]} "
          f"(mode={args.mode}, max_batch={args.max_batch}, "
          f"stream_slots={args.stream_slots})", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
