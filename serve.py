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
    p.add_argument("--ilm-weight", type=float, default=0.0,
                   help="internal-LM subtraction weight during fusion")
    p.add_argument("--ngram", default=None,
                   help="n-gram LM artifact (tools/train_ngram.py) fused "
                        "in both beam engines")
    p.add_argument("--ngram-weight", type=float, default=0.3)
    p.add_argument("--boost-file", default=None,
                   help="contextual-biasing phrase list (beam mode): one "
                        "phrase per line, optional <TAB><per-token boost>; "
                        "encoded with the checkpoint's tokenizer and "
                        "boosted in both the offline and streaming beam "
                        "engines (decode/context.py)")
    p.add_argument("--boost-score", type=float, default=2.0,
                   help="default per-token boost for --boost-file phrases")
    p.add_argument("--exported-streaming", default=None,
                   help="streaming chunk-step artifact from "
                        "tools/export_model.py --mode streaming_*; skips "
                        "tracing+compiling the live streaming graph at "
                        "startup (slots/chunk-frames/mode must match)")
    p.add_argument("--compilation-cache", default=None,
                   help="persistent JAX compilation-cache dir: compiles "
                        "are reused across server restarts")
    p.add_argument("--max-body-bytes", type=int, default=32 << 20)
    p.add_argument("--frame-hop-s", type=float, default=0.01,
                   help="feature frame hop in seconds, for the word-level "
                        "segment times in responses (default 10 ms)")
    p.add_argument("--endpoint-frames", type=int, default=None,
                   help="end-of-utterance detector for streaming "
                        "sessions: add 'endpoint'/'trailing_frames' to "
                        "partial results once this many input frames "
                        "pass without a decoder emission (10 ms/frame)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use-ema", action="store_true",
                   help="serve the checkpoint's Polyak-averaged params")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="post-training weight quantization: symmetric "
                        "per-channel int8 on every 2-D weight "
                        "(ops/quant.py)")
    return p.parse_args(argv)


def load_model(args):
    import jax

    from train import get_model_config
    from rnn_transducer_tpu.data.tokenizer import tokenizer_from_meta
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import init_train_state

    saved_cfg = (ckpt.load_model_config(args.ckpt_dir)
                 if args.ckpt_dir else None)
    if args.config is not None:
        cfg = get_model_config(args.config)
        if saved_cfg is not None and saved_cfg != cfg:
            raise SystemExit("--config does not match the checkpoint")
    else:
        cfg = saved_cfg if saved_cfg is not None else get_model_config("smoke")
    tok = None
    cmvn = None
    if args.ckpt_dir:
        # load_plain_params also merges model-parallel shard checkpoints
        # (meta['parallel']) back into plain serving params (ADVICE r2).
        params, cfg, step, meta = ckpt.load_plain_params(
            args.ckpt_dir, cfg, seed=args.seed, prefer_ema=args.use_ema)
        print(f"loaded checkpoint step {step}", file=sys.stderr)
        if meta.get("tokenizer"):
            tok = tokenizer_from_meta(meta["tokenizer"])
        if meta.get("cmvn"):
            # train.py --cmvn recorded global stats: raw-PCM requests get
            # the SAME normalization the model was trained with
            cmvn = meta["cmvn"]
            print("applying global CMVN from checkpoint meta",
                  file=sys.stderr)
    else:
        params = init_train_state(jax.random.PRNGKey(args.seed), cfg,
                                  TrainConfig()).params
    if args.quantize == "int8":
        from rnn_transducer_tpu.ops.quant import (quantize_params,
                                                  quantized_bytes)
        params = quantize_params(params)
        qb, fb = quantized_bytes(params)
        print(f"int8 weights: {qb / 1e6:.1f} MB (fp32 {fb / 1e6:.1f} MB)",
              file=sys.stderr)
    return params, cfg, tok, cmvn


def main(argv=None):
    args = parse_args(argv)
    if args.compilation_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from rnn_transducer_tpu.serve import (BatchingEngine, StreamingEngine,
                                          http_server)

    params, cfg, tok, cmvn = load_model(args)
    lm = None
    if args.lm_ckpt:
        from rnn_transducer_tpu.models.lm import load_lm
        lm_params, lm_cfg = load_lm(args.lm_ckpt)
        lm = (lm_params, lm_cfg, args.lm_weight, args.ilm_weight)
    ngram = None
    if args.ngram:
        if args.mode != "beam":
            raise SystemExit("--ngram requires --mode beam")
        from rnn_transducer_tpu.models.ngram import load_ngram
        ng_lm = load_ngram(args.ngram)
        if ng_lm.lp.shape[1] != cfg.vocab_size:
            raise SystemExit(f"n-gram vocab {ng_lm.lp.shape[1]} != model "
                             f"vocab {cfg.vocab_size}")
        ngram = (ng_lm, args.ngram_weight)
        print(f"n-gram fusion: {args.ngram} ({ng_lm.lp.shape[0]} states)",
              file=sys.stderr)
        if args.exported_streaming:
            raise SystemExit("--exported-streaming artifacts are no-ngram "
                             "graphs; drop --ngram or the artifact")
    context = None
    if args.boost_file:
        if args.mode != "beam":
            raise SystemExit("--boost-file requires --mode beam")
        if tok is None:
            raise SystemExit("--boost-file needs a checkpoint with a "
                             "tokenizer in meta.json")
        from rnn_transducer_tpu.decode.context import (build_context_bias,
                                                       load_boost_phrases)
        phrases, boosts = load_boost_phrases(
            args.boost_file, tok, default_boost=args.boost_score)
        context = build_context_bias(phrases, cfg.vocab_size,
                                     blank=cfg.blank, boosts=boosts)
        print(f"boosting {len(phrases)} phrases from {args.boost_file}",
              file=sys.stderr)
        if args.exported_streaming:
            raise SystemExit("--exported-streaming artifacts are no-bias "
                             "graphs; drop --boost-file or the artifact")
    offline = BatchingEngine(
        params, cfg, mode=args.mode, beam=args.beam,
        max_symbols=args.max_symbols, frame_buckets=args.frame_buckets,
        max_batch=args.max_batch, window_ms=args.window_ms, lm=lm,
        context=context, ngram=ngram)
    streaming = None
    # streaming needs a streamable encoder (uni LSTM or causal conformer):
    # an offline-only checkpoint serves batch endpoints with streaming off
    if args.stream_slots > 0 and cfg.streamable:
        if cfg.enc_type == "conformer" and cfg.enc_chunk_att > 0:
            # chunked-attention exactness needs S-aligned chunk starts
            enc_chunk = args.chunk_frames // max(cfg.time_reduction, 1)
            if enc_chunk % cfg.enc_chunk_att != 0:
                raise SystemExit(
                    f"--chunk-frames {args.chunk_frames} gives "
                    f"{enc_chunk} encoded frames/chunk, not a multiple "
                    f"of enc_chunk_att {cfg.enc_chunk_att}")
        exported_step = None
        if args.exported_streaming:
            import json as _json
            import os as _os
            sys.path.insert(0, _os.path.join(
                _os.path.dirname(_os.path.abspath(__file__)), "tools"))
            from export_model import load_exported
            meta_path = _os.path.join(
                _os.path.dirname(args.exported_streaming),
                "export_meta.json")
            with open(meta_path) as f:
                emeta = _json.load(f)
            want = {"slots": args.stream_slots,
                    "chunk_frames": args.chunk_frames,
                    "mode": f"streaming_{args.mode}"}
            got = {k: emeta.get(k) for k in want}
            if got != want or (args.mode == "beam"
                               and emeta.get("beam") != args.beam):
                raise SystemExit(f"exported streaming artifact mismatch: "
                                 f"{got} != {want}")
            if lm is not None:
                raise SystemExit("--exported-streaming artifacts are "
                                 "no-LM graphs; drop --lm-ckpt or serve "
                                 "without the artifact")
            exported_step = load_exported(args.exported_streaming)
            print(f"loaded exported streaming step "
                  f"{args.exported_streaming}", file=sys.stderr)
        streaming = StreamingEngine(
            params, cfg, slots=args.stream_slots,
            chunk_frames=args.chunk_frames, max_symbols=args.max_symbols,
            mode=args.mode, beam=args.beam, lm=lm, context=context,
            ngram=ngram, exported_step=exported_step,
            endpoint_frames=args.endpoint_frames)
    print("warming up (one compile per bucket)...", file=sys.stderr)
    offline.warmup()
    if streaming is not None:
        streaming.warmup()
    srv = http_server(args.host, args.port, offline, streaming, tok,
                      max_body_bytes=args.max_body_bytes, cmvn=cmvn,
                      frame_hop_s=args.frame_hop_s)
    print(f"serving on http://{args.host}:{srv.server_address[1]} "
          f"(mode={args.mode}, max_batch={args.max_batch}, "
          f"stream_slots={args.stream_slots})", file=sys.stderr)
    # SIGTERM (the production stop signal) drains like Ctrl-C: stop
    # accepting, finish in-flight batches, close the engines cleanly
    # (post-close submits fail fast — test_serve.py closed-engine tests).
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
        offline.close()
        if streaming is not None:
            streaming.close()
        print("drained and closed", file=sys.stderr)


if __name__ == "__main__":
    main()
