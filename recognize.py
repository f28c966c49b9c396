"""Decoding / evaluation CLI (mirrors the reference's eval.py / recognize).

Examples:
  python recognize.py --config smoke --mode greedy --data synthetic
  python recognize.py --config libri100 --mode beam --beam 8 \
      --data manifest:test.jsonl --ckpt-dir /tmp/ck

Reports WER/PER, RTF and p50/p90 latency (BASELINE.json configs[3]).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU RNN-T decoding + eval")
    p.add_argument("--config", default=None,
                   help="named config; defaults to the config stored in "
                        "--ckpt-dir's meta.json, else 'smoke'")
    p.add_argument("--data", default="synthetic")
    p.add_argument("--mode", default="greedy",
                   choices=["greedy", "beam", "streaming", "streaming_beam",
                            "ctc_greedy", "ctc_beam"])
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--expansions", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--max-symbols", type=int, default=100)
    p.add_argument("--chunk-frames", type=int, default=32)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each decode batch over N devices (offline "
                        "eval scale-out: params/LM/bias tables replicated, "
                        "batch split over the mesh; modes "
                        "greedy|beam|ctc_greedy|ctc_beam; --batch-size "
                        "must divide by N)")
    p.add_argument("--loader", default="python",
                   choices=["python", "native"],
                   help="manifest input pipeline ('native' = C++ prefetch "
                        "threads, cpp/loader.cpp)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cmvn", default=None,
                   help="global CMVN stats JSON; defaults to the stats "
                        "recorded in the checkpoint's meta.json (if any)")
    p.add_argument("--use-ema", action="store_true",
                   help="decode with the checkpoint's Polyak-averaged "
                        "params (train.py --ema-decay)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="post-training weight quantization for decode: "
                        "symmetric per-channel int8 on every 2-D weight "
                        "(ops/quant.py) — 4x smaller weights, checkpoint "
                        "unchanged")
    p.add_argument("--frame-hop-s", type=float, default=0.01,
                   help="seconds of audio per encoder input frame (for RTF)")
    p.add_argument("--lm-ckpt", default=None,
                   help="LM checkpoint dir (tools/train_lm.py) for shallow "
                        "fusion in beam / streaming_beam modes")
    p.add_argument("--lm-weight", type=float, default=0.3,
                   help="shallow-fusion weight on log P_lm per emission")
    p.add_argument("--ilm-weight", type=float, default=0.0,
                   help="internal-LM subtraction weight during fusion "
                        "(density-ratio correction: label emissions also "
                        "subtract this times the zeroed-encoder joint's "
                        "log-prob)")
    p.add_argument("--lm-rescore", action="store_true",
                   help="use --lm-ckpt for one-pass N-best rescoring "
                        "instead of per-step shallow fusion (beam mode)")
    p.add_argument("--ngram", default=None,
                   help="n-gram LM artifact (tools/train_ngram.py) for "
                        "shallow fusion in beam / streaming_beam modes; "
                        "composable with --lm-ckpt and --boost-file")
    p.add_argument("--ngram-weight", type=float, default=0.3,
                   help="shallow-fusion weight on the n-gram log-prob")
    p.add_argument("--boost-file", default=None,
                   help="contextual-biasing phrase list for beam / "
                        "streaming_beam modes: one phrase per line, "
                        "optional <TAB><per-token boost>; phrases are "
                        "encoded with the model tokenizer and boost beam "
                        "scores while matching (decode/context.py)")
    p.add_argument("--boost-score", type=float, default=2.0,
                   help="default per-token boost for --boost-file phrases")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer spec (char | phone | bpe:<model.json>) "
                        "for text output + word-level WER; defaults to the "
                        "tokenizer stored in --ckpt-dir's meta.json")
    p.add_argument("--confidence", action="store_true",
                   help="carry per-token emission log-probs through the "
                        "decode and add them to --hyps-file records as "
                        "'confs' (greedy, beam, ctc_greedy)")
    p.add_argument("--nbest", type=int, default=1,
                   help="with --hyps-file and a beam mode "
                        "(beam|ctc_beam|streaming_beam): also write the "
                        "top-N hypotheses + scores per utterance as "
                        "'nbest' records")
    p.add_argument("--hyps-file", default=None,
                   help="write per-utterance {ref, hyp} JSONL here "
                        "(text when a tokenizer is available, else ids)")
    p.add_argument("--timestamps", action="store_true",
                   help="carry per-token emission timestamps through the "
                        "decode and add them to --hyps-file records as "
                        "'frames' (input feature frames) and 'times_s' "
                        "(via --frame-hop-s)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from train import get_model_config
    from rnn_transducer_tpu.data.synthetic import learnable_batch
    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.metrics import (RtfMeter, error_rate,
                                                   tokens_to_lists)
    from rnn_transducer_tpu.decode.streaming import stream_transcribe
    from rnn_transducer_tpu.decode.words import word_segments
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import init_train_state

    # Self-describing checkpoints: the model config rides in meta.json, so
    # --ckpt-dir alone is enough; an explicit --config must match it.
    saved_cfg = ckpt.load_model_config(args.ckpt_dir) if args.ckpt_dir else None
    if args.config is not None:
        cfg = get_model_config(args.config)
        if saved_cfg is not None and saved_cfg != cfg:
            raise SystemExit(
                f"--config {args.config} does not match the config saved in "
                f"{args.ckpt_dir}/meta.json: {saved_cfg}")
    else:
        cfg = saved_cfg if saved_cfg is not None else get_model_config("smoke")
    if args.mode.startswith("ctc_") and not cfg.ctc_head:
        if args.ckpt_dir:
            raise SystemExit("--mode ctc_* needs a checkpoint trained with "
                             "a CTC head (--ctc-pretrain-steps)")
        import dataclasses
        cfg = dataclasses.replace(cfg, ctc_head=True)  # synthetic smoke
    meta = ckpt.load_meta(args.ckpt_dir) if args.ckpt_dir else None
    if args.ckpt_dir:
        # Shared restore path (train/checkpoint.py): also merges
        # model-parallel shard checkpoints (meta['parallel']) into plain
        # params.
        params, cfg, step, _ = ckpt.load_plain_params(
            args.ckpt_dir, cfg, seed=args.seed, prefer_ema=args.use_ema)
        print(f"loaded checkpoint step {step}"
              + (" (EMA params)" if args.use_ema else ""), file=sys.stderr)
    else:
        params = init_train_state(jax.random.PRNGKey(args.seed), cfg,
                                  TrainConfig()).params
    # Global CMVN: explicit stats file, or the stats the checkpoint was
    # trained with (meta.json, written by train.py --cmvn).
    cmvn_stats = None
    if args.cmvn:
        from rnn_transducer_tpu.data.cmvn import load_cmvn
        cmvn_stats = load_cmvn(args.cmvn)
    elif meta and meta.get("cmvn"):
        cmvn_stats = meta["cmvn"]
    if args.quantize == "int8":
        from rnn_transducer_tpu.ops.quant import (quantize_params,
                                                  quantized_bytes)
        params = quantize_params(params)
        qb, fb = quantized_bytes(params)
        print(f"int8 weights: {qb / 1e6:.1f} MB "
              f"(fp32 {fb / 1e6:.1f} MB)", file=sys.stderr)

    # Tokenizer (CLI spec or the one stored in the checkpoint's meta.json);
    # resolved up front — text output needs it at the end, --boost-file
    # needs it now to encode phrases.
    from rnn_transducer_tpu.data.tokenizer import (decode_to_text,
                                                   tokenizer_from_meta,
                                                   tokenizer_from_spec)
    tok = None
    if args.tokenizer:
        tok = tokenizer_from_spec(args.tokenizer)
    elif meta and meta.get("tokenizer"):
        tok = tokenizer_from_meta(meta["tokenizer"])

    context = None
    if args.boost_file:
        if args.mode not in ("beam", "streaming_beam"):
            raise SystemExit("--boost-file requires --mode "
                             "beam|streaming_beam")
        if tok is None:
            raise SystemExit("--boost-file needs a tokenizer (--tokenizer "
                             "or a checkpoint with one in meta.json)")
        from rnn_transducer_tpu.decode.context import (build_context_bias,
                                                       load_boost_phrases)
        phrases, boosts = load_boost_phrases(
            args.boost_file, tok, default_boost=args.boost_score)
        context = build_context_bias(phrases, cfg.vocab_size,
                                     blank=cfg.blank, boosts=boosts)
        print(f"boosting {len(phrases)} phrases from {args.boost_file} "
              f"(default per-token boost {args.boost_score})",
              file=sys.stderr)

    ngram = None
    if args.ngram:
        if args.mode not in ("beam", "streaming_beam", "ctc_beam"):
            raise SystemExit("--ngram requires --mode "
                             "beam|streaming_beam|ctc_beam")
        from rnn_transducer_tpu.models.ngram import load_ngram
        ng_lm = load_ngram(args.ngram)
        if ng_lm.lp.shape[1] != cfg.vocab_size:
            raise SystemExit(f"n-gram vocab {ng_lm.lp.shape[1]} != model "
                             f"vocab {cfg.vocab_size}")
        ngram = (ng_lm, args.ngram_weight)
        print(f"n-gram fusion: {args.ngram} ({ng_lm.lp.shape[0]} states) "
              f"weight={args.ngram_weight}", file=sys.stderr)

    lm_params = lm_cfg = None
    if args.lm_ckpt:
        if args.mode not in ("beam", "streaming_beam", "ctc_beam"):
            raise SystemExit("--lm-ckpt requires --mode "
                             "beam|streaming_beam|ctc_beam")
        from rnn_transducer_tpu.models.lm import load_lm
        lm_params, lm_cfg = load_lm(args.lm_ckpt)
        if lm_cfg.vocab_size != cfg.vocab_size:
            raise SystemExit(
                f"LM vocab {lm_cfg.vocab_size} != model vocab "
                f"{cfg.vocab_size}")
        print(f"{'n-best rescoring' if args.lm_rescore else 'shallow fusion'}"
              f": {args.lm_ckpt} weight={args.lm_weight}", file=sys.stderr)

    # Data-parallel offline decode: the per-batch decode function runs
    # under shard_map over a 1-D "data" mesh — params/LM/bias tables
    # replicated, the batch dim split N ways, no collectives (each device
    # decodes its shard independently; shard_map rather than jit+shardings
    # because the Pallas decode kernels have no SPMD partitioning rule).
    dp = args.data_parallel
    if dp > 1:
        if args.mode not in ("greedy", "beam", "ctc_greedy", "ctc_beam"):
            raise SystemExit("--data-parallel supports --mode "
                             "greedy|beam|ctc_greedy|ctc_beam (streaming "
                             "decode is a host-driven chunk loop)")
        if args.batch_size % dp:
            raise SystemExit(f"--batch-size {args.batch_size} must divide "
                             f"by --data-parallel {dp}")
        if dp > len(jax.devices()):
            raise SystemExit(f"--data-parallel {dp} > available devices "
                             f"{len(jax.devices())}")
        from jax.sharding import PartitionSpec as P
        from rnn_transducer_tpu.parallel.mesh import make_mesh
        dp_mesh = make_mesh(dp)
        print(f"data-parallel decode over {dp} devices", file=sys.stderr)

    def dp_wrap(fn, n_rep, n_batch):
        """shard_map fn's trailing n_batch args over the mesh (identity
        at dp=1); the first n_rep args are replicated."""
        if dp == 1:
            return fn
        return jax.shard_map(fn, mesh=dp_mesh,
                             in_specs=(P(),) * n_rep
                             + (P("data"),) * n_batch,
                             out_specs=P("data"),
                             check_vma=False)

    # NOTE: params (and lm params) are always traced jit arguments —
    # capturing them in the closure would inline the weights into the
    # compiled program.
    # Every decode returns (tokens, lens, frames-or-None); frames are
    # per-token encoder-frame emission indices when --timestamps is set.
    ts = args.timestamps
    conf_on = args.confidence
    if conf_on and args.mode not in ("greedy", "beam", "ctc_greedy"):
        raise SystemExit("--confidence supports --mode "
                         "greedy|beam|ctc_greedy")
    if args.mode == "greedy":
        greedy_jit = jax.jit(dp_wrap(lambda p, f, l: recognize_greedy(
            p, cfg, f, l, max_symbols=args.max_symbols,
            with_confidence=conf_on, with_timestamps=ts), 1, 2))

        def decode(f, l):
            out = greedy_jit(params, f, l)
            i = 2
            confs = out[i] if conf_on else None
            i += 1 if conf_on else 0
            frames = out[i] if ts else None
            return out[0], out[1], frames, confs, None
    elif args.mode == "beam":
        fuse = None if (lm_params is None or args.lm_rescore) else "fuse"
        beam_jit = jax.jit(dp_wrap(lambda p, lmp, cb, ng, f, l: recognize_beam(
            p, cfg, f, l, beam=args.beam,
            max_symbols=args.max_symbols, expansions=args.expansions,
            with_confidence=conf_on, with_timestamps=ts, context=cb,
            ngram=ng,
            lm=None if lmp is None else (lmp, lm_cfg, args.lm_weight,
                                         args.ilm_weight)), 4, 2))
        if args.lm_rescore and lm_params is not None:
            from rnn_transducer_tpu.models.lm import rescore_nbest
            rescore_jit = jax.jit(dp_wrap(
                lambda lmp, t, ln, s, e: rescore_nbest(
                    lmp, lm_cfg, t, ln, s, weight=args.lm_weight, extras=e),
                1, 4))

            def decode(f, l):
                out = beam_jit(params, None, context, ngram, f, l)
                toks, lens, scores = out[:3]
                # per-token confidences/timestamps (if requested) are
                # reordered with their beams through the rescore
                extras = tuple(out[3:])
                res = rescore_jit(lm_params, toks, lens, scores, extras)
                toks, lens, scores = res[0], res[1], res[2]
                rest = list(res[3:])
                confs = rest.pop(0) if conf_on else None
                frames = rest.pop(0) if ts else None
                return (toks[:, 0], lens[:, 0],
                        frames[:, 0] if ts else None,
                        confs[:, 0] if conf_on else None,
                        (toks, lens, scores))
        else:
            def decode(f, l):
                out = beam_jit(params, lm_params if fuse else None,
                               context, ngram, f, l)
                rest = list(out[3:])
                confs = rest.pop(0) if conf_on else None
                frames = rest.pop(0) if ts else None
                return (out[0][:, 0], out[1][:, 0],
                        frames[:, 0] if ts else None,
                        confs[:, 0] if conf_on else None,
                        (out[0], out[1], out[2]))
    elif args.mode == "ctc_greedy":
        from rnn_transducer_tpu.decode.ctc import recognize_ctc
        ctc_jit = jax.jit(dp_wrap(lambda p, f, l: recognize_ctc(
            p, cfg, f, l, mode="greedy", max_symbols=args.max_symbols,
            with_confidence=conf_on, with_timestamps=ts), 1, 2))

        def decode(f, l):
            out = ctc_jit(params, f, l)
            i = 2
            confs = out[i] if conf_on else None
            i += 1 if conf_on else 0
            frames = out[i] if ts else None
            return out[0], out[1], frames, confs, None
    elif args.mode == "ctc_beam":
        from rnn_transducer_tpu.decode.ctc import recognize_ctc
        if ts:
            raise SystemExit("--timestamps is not supported with ctc_beam "
                             "(prefix scores sum over alignments)")
        if args.lm_rescore:
            raise SystemExit("--lm-rescore applies to --mode beam; "
                             "ctc_beam fuses per step (--lm-ckpt alone)")
        ctc_beam_jit = jax.jit(dp_wrap(lambda p, lmp, ng, f, l: recognize_ctc(
            p, cfg, f, l, mode="beam", beam=args.beam,
            max_symbols=args.max_symbols,
            lm=None if lmp is None else (lmp, lm_cfg, args.lm_weight),
            ngram=ng), 3, 2))

        def decode(f, l):
            toks, lens, scores = ctc_beam_jit(params, lm_params, ngram,
                                              f, l)
            return (toks[:, 0], lens[:, 0], None, None,
                    (toks, lens, scores))
    elif args.mode == "streaming_beam":
        from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam

        def decode(f, l):
            out = stream_transcribe_beam(
                params, cfg, f, l, chunk_frames=args.chunk_frames,
                beam=args.beam, max_symbols=args.max_symbols,
                expansions=args.expansions, with_timestamps=ts,
                context=context, ngram=ngram,
                lm=None if lm_params is None else
                (lm_params, lm_cfg, args.lm_weight, args.ilm_weight))
            frames = out[3][:, 0] if ts else None
            return (out[0][:, 0], out[1][:, 0], frames, None,
                    (out[0], out[1], out[2]))
    else:
        def decode(f, l):
            out = stream_transcribe(
                params, cfg, f, l, chunk_frames=args.chunk_frames,
                max_symbols=args.max_symbols, with_timestamps=ts)
            return (out[0], out[1], (out[2] if ts else None), None,
                    None)

    if args.data.startswith("manifest:"):
        man_path = args.data.split(":", 1)[1]
        if args.loader == "native":
            from rnn_transducer_tpu.data.native_loader import NativeLoader
            def batches():
                with NativeLoader(man_path, cfg, TrainConfig().buckets,
                                  args.batch_size, loop=False,
                                  seed=None, n_threads=2) as ld:
                    if cmvn_stats is not None:
                        from rnn_transducer_tpu.data.cmvn import (
                            apply_cmvn_batch)
                        for b in ld:
                            yield ((apply_cmvn_batch(b[0], b[1],
                                                     cmvn_stats),)
                                   + tuple(b[1:]))
                    else:
                        yield from ld
        else:
            from rnn_transducer_tpu.data.bucketing import bucket_stream
            from rnn_transducer_tpu.data.manifest import manifest_examples
            def batches():
                yield from bucket_stream(
                    manifest_examples(man_path, cfg, cmvn=cmvn_stats),
                    TrainConfig().buckets, args.batch_size, blank=cfg.blank,
                    with_valid=True)
    else:
        def batches():
            rng = np.random.default_rng(args.seed + 1)
            for _ in range(args.batches):
                yield learnable_batch(rng, args.batch_size, n_labels=10,
                                      input_dim=cfg.input_dim,
                                      vocab=cfg.vocab_size,
                                      frames_per_label=4) + (args.batch_size,)

    meter = RtfMeter()
    refs, hyps, hyp_frames, hyp_confs, hyp_nbest = [], [], [], [], []
    warmed: set[tuple] = set()
    for feats, fl, labels, ll, n_valid in batches():
        f, l = jnp.asarray(feats), jnp.asarray(fl)
        if feats.shape not in warmed:
            # Each distinct bucket shape triggers an XLA compile; warm it
            # outside the timed region so RTF/p50 report steady-state.
            warmed.add(feats.shape)
            toks, lens, frames, confs, nb = decode(f, l)
            jax.block_until_ready(toks)
        t0 = time.perf_counter()
        toks, lens, frames, confs, nb = decode(f, l)
        toks, lens = np.asarray(toks), np.asarray(lens)  # forces completion
        wall = time.perf_counter() - t0
        # Padding rows (drained partial batches repeat real utterances) are
        # excluded from WER/RTF accounting.
        audio_s = float(np.sum(fl[:n_valid])) * args.frame_hop_s
        meter.add(wall, audio_s, n_utts=n_valid)
        hyps.extend(tokens_to_lists(toks[:n_valid], lens[:n_valid]))
        refs.extend(tokens_to_lists(labels[:n_valid], ll[:n_valid]))
        if frames is not None:
            frames = np.asarray(frames)
            hyp_frames.extend(
                (frames[i, : lens[i]] * cfg.time_reduction).tolist()
                for i in range(n_valid))
        if confs is not None:
            confs = np.asarray(confs)
            hyp_confs.extend(
                [round(float(c), 4) for c in confs[i, : lens[i]]]
                for i in range(n_valid))
        if args.nbest > 1 and nb is not None:
            nb_t, nb_l, nb_s = map(np.asarray, nb)
            for i in range(n_valid):
                hyp_nbest.append([
                    (nb_t[i, k, : nb_l[i, k]].tolist(),
                     float(nb_s[i, k]))
                    for k in range(min(args.nbest, nb_t.shape[1]))
                    if nb_s[i, k] > -1e29])
    wer = error_rate(refs, hyps)
    out = {"mode": args.mode, "wer": round(wer, 4), **{
        k: round(v, 5) for k, v in meter.summary().items()}}
    if args.mode == "beam":
        out["beam"] = args.beam

    # Text output + word-level WER when a tokenizer is known (resolved
    # up front, before the decode loop).
    ref_texts = hyp_texts = None
    if tok is not None:
        ref_texts = [decode_to_text(tok, r) for r in refs]
        hyp_texts = [decode_to_text(tok, h) for h in hyps]
        words: dict[str, int] = {}
        wids = lambda t: [words.setdefault(w, len(words)) for w in t.split()]
        out["word_wer"] = round(error_rate([wids(t) for t in ref_texts],
                                           [wids(t) for t in hyp_texts]), 4)
    if args.hyps_file:
        with open(args.hyps_file, "w") as f:
            for i in range(len(hyps)):
                rec = ({"ref": ref_texts[i], "hyp": hyp_texts[i]}
                       if tok is not None
                       else {"ref": refs[i], "hyp": hyps[i]})
                if hyp_confs:
                    rec["confs"] = hyp_confs[i]
                if args.timestamps:
                    # input-feature-frame emission indices + audio seconds
                    rec["frames"] = hyp_frames[i]
                    rec["times_s"] = [round(fr * args.frame_hop_s, 3)
                                      for fr in hyp_frames[i]]
                    if tok is not None:
                        # word-level segments (decode/words.py): token
                        # frames grouped by the tokenizer's boundaries
                        rec["words"] = word_segments(
                            tok, hyps[i], hyp_frames[i],
                            hyp_confs[i] if hyp_confs else None,
                            hop_s=args.frame_hop_s)
                if hyp_nbest:
                    rec["nbest"] = [
                        {"hyp": (decode_to_text(tok, ids)
                                 if tok is not None else ids),
                         "score": round(sc, 4)}
                        for ids, sc in hyp_nbest[i]]
                f.write(json.dumps(rec) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
