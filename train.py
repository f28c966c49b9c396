"""Training CLI (mirrors the reference's train.py entry point).

Examples:
  python train.py --config timit --steps 200 --batch-size 16
  python train.py --config libri100 --data synthetic --ckpt-dir /tmp/ck
  python train.py --config smoke   # tiny fast config for smoke tests

Data: `--data synthetic` trains on the deterministic synthetic task (no
corpora ship in this environment); `--data manifest:<path>` reads a JSONL
manifest of {audio or feats, labels} records (see data/manifest.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU RNN-T training")
    p.add_argument("--config", default="smoke",
                   help="named config: smoke|greedy_smoke|timit|libri100|"
                        "libri960, or a JSON file path")
    p.add_argument("--data", default="synthetic",
                   help="'synthetic' or 'manifest:<jsonl path>'")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-schedule", default="warmup_cosine",
                   choices=["warmup_cosine", "noam", "step_decay",
                            "constant"])
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--grad-clip", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=500)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="mesh size; 0 = all local devices")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="model-axis size of a 2-D (data, model) mesh; "
                        "> 1 enables --parallel-mode (docs/PARALLELISM.md)")
    p.add_argument("--parallel-mode", default="tp",
                   choices=["tp", "sp", "pp", "ep"],
                   help="model-axis strategy: tensor parallel (gate-sharded "
                        "LSTMs + vocab-parallel loss), sequence parallel "
                        "(frame-sharded lattice), pipeline parallel "
                        "(GPipe encoder stages), or expert parallel "
                        "(sharded MoE joint; needs joint_experts > 0)")
    p.add_argument("--microbatches", type=int, default=0,
                   help="pp only: microbatches per step (0 = 2x stages)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--max-frames", type=int, default=200)
    p.add_argument("--max-labels", type=int, default=20)
    p.add_argument("--loss-impl", default="auto",
                   choices=["auto", "fused", "pallas", "xla", "pruned"])
    p.add_argument("--pruned-range", type=int, default=0,
                   help="band width S of the pruned two-pass loss "
                        "(k2-style); implies --loss-impl pruned when > 0")
    p.add_argument("--simple-loss-scale", type=float, default=0.5,
                   help="weight of the trivial-joiner first-pass loss in "
                        "the pruned objective")
    p.add_argument("--spec-augment", action="store_true",
                   help="apply SpecAugment time/freq masking on features")
    p.add_argument("--spec-augment-warp", type=int, default=0,
                   help="with --spec-augment: also time-warp each "
                        "utterance (Park et al.'s W parameter, e.g. 80; "
                        "0 = masks only)")
    p.add_argument("--speed-perturb", default=None,
                   help="per-example feature-domain speed perturbation: "
                        "comma-separated factor set (kaldi staple "
                        "'0.9,1.0,1.1'); applied before SpecAugment")
    p.add_argument("--cmvn", default=None,
                   help="global CMVN stats JSON (tools/compute_cmvn.py): "
                        "normalize every utterance's features with corpus "
                        "mean/std; recorded in the checkpoint meta so "
                        "recognize/serve/align apply it automatically")
    p.add_argument("--sortagrad", action="store_true",
                   help="first epoch shortest-first (manifest data, "
                        "python loader)")
    p.add_argument("--dev-manifest", default=None,
                   help="JSONL manifest for dev-set eval; with manifest "
                        "training data and no --dev-manifest, the first "
                        "batch of examples is held out instead")
    p.add_argument("--log-file", default=None,
                   help="append structured JSONL metrics records here "
                        "(mirrored to stderr)")
    p.add_argument("--loader", default="python",
                   choices=["python", "native"],
                   help="manifest input pipeline: 'native' = C++ prefetch "
                        "threads (cpp/loader.cpp); decode/FBANK/padding "
                        "overlap device compute")
    p.add_argument("--resume-data", choices=["exact", "fresh"], default=None,
                   help="with --resume + manifest data: 'exact' (the "
                        "default for the python loader) fast-forwards the "
                        "batch stream past the restored step count via a "
                        "metadata-only bucketing replay, so training sees "
                        "exactly the batches an uninterrupted run would; "
                        "'fresh' restarts the stream from epoch 0. The "
                        "native loader and synthetic data support only "
                        "'fresh'.")
    p.add_argument("--weight-noise", type=float, default=0.0,
                   help="Graves weight noise std (gradient computed at "
                        "params + N(0, std); classic TIMIT regularizer)")
    p.add_argument("--dropout", type=float, default=0.0,
                   help="inter-layer LSTM dropout (encoder + prediction "
                        "net; the stacked-nn.LSTM(dropout=) staple)")
    p.add_argument("--embed-dropout", type=float, default=0.0,
                   help="dropout on the prediction net's label embeddings")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="Polyak averaging: keep an exponential moving "
                        "average of the params (typical 0.999/0.9999); "
                        "decode it with recognize.py --use-ema")
    p.add_argument("--fastemit-lambda", type=float, default=0.0,
                   help="FastEmit low-latency regularization: scales the "
                        "emit-arc posterior gradient by (1 + lambda) so "
                        "the model learns to emit earlier (0 = off)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer spec (char | phone | bpe:<model.json>); "
                        "stored inline in the checkpoint's meta.json so "
                        "recognize.py can emit text transcripts")
    p.add_argument("--pred-type", default=None,
                   choices=["lstm", "stateless"],
                   help="prediction network type override: 'stateless' = "
                        "k2-style bounded-context decoder (see "
                        "--pred-context)")
    p.add_argument("--pred-context", type=int, default=0,
                   help="stateless decoder context size (labels of "
                        "history per position; 0 = config default)")
    p.add_argument("--tdt-durations", default=None,
                   help="token-and-duration transducer: comma-separated "
                        "duration set (e.g. '0,1,2,3,4') predicted by a "
                        "second joint head; greedy decode advances by the "
                        "predicted duration after every emission (trains "
                        "at the xla loss tier)")
    p.add_argument("--big-blanks", default=None,
                   help="multi-blank transducer: comma-separated big-blank "
                        "frame durations (e.g. '2,4,8') appended as extra "
                        "joint output classes; greedy decode skips that "
                        "many frames when one wins (trains at the xla "
                        "loss tier)")
    p.add_argument("--mwer-steps", type=int, default=0,
                   help="run MWER discriminative fine-tuning (expected-WER "
                        "risk over the live N-best, train/mwer.py) for the "
                        "LAST N steps")
    p.add_argument("--mwer-beam", type=int, default=4)
    p.add_argument("--mwer-nll-weight", type=float, default=0.0,
                   help="interpolate this much NLL into the MWER objective "
                        "(stabilizer)")
    p.add_argument("--ctc-pretrain-steps", type=int, default=0,
                   help="warm up the encoder with CTC loss for N steps "
                        "before switching to the RNN-T loss")
    p.add_argument("--ctc-weight", type=float, default=0.0,
                   help="joint CTC+RNN-T multitask: add this much CTC "
                        "(auxiliary encoder head) to the RNN-T loss every "
                        "step (icefall/ESPnet hybrid recipe; typical "
                        "0.1-0.3)")
    p.add_argument("--distill-from", default=None,
                   help="teacher checkpoint dir for knowledge "
                        "distillation: adds --distill-weight times the "
                        "lattice KL(teacher || student) of the "
                        "temperature-softened joint posteriors to the "
                        "loss (any teacher architecture with the same "
                        "vocab/blank/time_reduction — e.g. a big offline "
                        "BiLSTM/conformer teaching a streaming student)")
    p.add_argument("--distill-weight", type=float, default=0.3,
                   help="weight of the KD term (with --distill-from)")
    p.add_argument("--ar-range", type=int, default=0,
                   help="alignment-restricted RNN-T (Mahadeokar et al. "
                        "2021): train on an N-wide band around a "
                        "reference Viterbi alignment (from "
                        "--ar-align-from, else the live model under "
                        "stop_gradient) — bounds emission delay. "
                        "0 = off")
    p.add_argument("--ar-left", type=int, default=-1,
                   help="band positions BEHIND the aligned path (late "
                        "emissions); the rest of --ar-range looks ahead. "
                        "-1 = centered")
    p.add_argument("--ar-align-from", default=None,
                   help="checkpoint dir of the aligner model for "
                        "--ar-range (same vocab/blank/time_reduction); "
                        "omit to self-align")
    p.add_argument("--distill-temp", type=float, default=1.0,
                   help="KD softmax temperature tau (the term is scaled "
                        "by tau^2; classic choice 2.0)")
    return p.parse_args(argv)


def get_model_config(name):
    from rnn_transducer_tpu.models.config import NAMED_CONFIGS, TransducerConfig
    if name == "smoke":
        return TransducerConfig(enc_layers=1, enc_hidden=64, pred_layers=1,
                                pred_hidden=64, embed_dim=32, joint_dim=64,
                                vocab_size=32, input_dim=80)
    if name in NAMED_CONFIGS:
        return NAMED_CONFIGS[name]()
    with open(name) as f:
        return TransducerConfig(**json.load(f))


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.data.synthetic import learnable_batch
    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_batch)
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import (TrainState, init_train_state,
                                               make_train_step)

    from rnn_transducer_tpu.utils.logging import MetricsLogger

    cfg = get_model_config(args.config)
    if ((args.ctc_pretrain_steps > 0 or args.ctc_weight > 0)
            and not cfg.ctc_head):
        cfg = dataclasses.replace(cfg, ctc_head=True)
    if args.pred_type:
        cfg = dataclasses.replace(cfg, pred_type=args.pred_type)
    if args.pred_context > 0:
        cfg = dataclasses.replace(cfg, pred_context=args.pred_context)
    if args.big_blanks:
        durs = tuple(int(d) for d in args.big_blanks.split(","))
        if any(d <= 1 for d in durs):
            raise SystemExit("--big-blanks durations must be > 1")
        cfg = dataclasses.replace(cfg, big_blank_durations=durs)
        if args.loss_impl not in ("auto", "xla"):
            raise SystemExit("--big-blanks requires --loss-impl auto|xla")
    if args.tdt_durations:
        durs = tuple(int(d) for d in args.tdt_durations.split(","))
        cfg = dataclasses.replace(cfg, tdt_durations=durs)
        if args.loss_impl not in ("auto", "xla"):
            raise SystemExit("--tdt-durations requires --loss-impl "
                             "auto|xla")
    if args.pruned_range > 0:
        cfg = dataclasses.replace(cfg, pruned_range=args.pruned_range)
        args.loss_impl = "pruned"
    elif args.loss_impl == "pruned" and cfg.pruned_range <= 0:
        raise SystemExit("--loss-impl pruned requires --pruned-range N")
    tcfg = TrainConfig(batch_size=args.batch_size, learning_rate=args.lr,
                       warmup_steps=args.warmup_steps,
                       total_steps=max(args.steps, args.warmup_steps + 1),
                       grad_clip_norm=args.grad_clip, seed=args.seed,
                       loss_impl=args.loss_impl,
                       lr_schedule=args.lr_schedule,
                       weight_noise_std=args.weight_noise,
                       dropout=args.dropout,
                       embed_dropout=args.embed_dropout,
                       fastemit_lambda=args.fastemit_lambda,
                       simple_loss_scale=args.simple_loss_scale,
                       ema_decay=args.ema_decay,
                       mwer_beam=args.mwer_beam,
                       mwer_nll_weight=args.mwer_nll_weight,
                       ctc_weight=args.ctc_weight,
                       distill_weight=(args.distill_weight
                                       if args.distill_from else 0.0),
                       distill_temp=args.distill_temp,
                       ar_range=args.ar_range, ar_left=args.ar_left)
    mlog = MetricsLogger(args.log_file)

    mp = args.model_parallel
    par_mode = args.parallel_mode if mp > 1 else None

    teacher_params = teacher_cfg = None
    if args.distill_from:
        if par_mode in ("pp", "ep"):
            # sp/tp carry the teacher as a replicated traced argument
            # (parallel/tp.py sp/tp_distill_loss_fn); ep routes the joint
            # through MoE experts the KD term doesn't model, and pp's
            # stage-sliced params can't host the replicated teacher
            # forward without assembling the full lattice on every stage.
            raise SystemExit("--distill-from supports single-device, "
                             "data-parallel, and --parallel-mode sp|tp "
                             "training (not pp/ep)")
        if args.ar_range > 0:
            raise SystemExit("--distill-from and --ar-range are mutually "
                             "exclusive (one teacher slot)")
        teacher_params, teacher_cfg, t_step, _ = ckpt.load_plain_params(
            args.distill_from)
        print(f"distilling from {args.distill_from} (step {t_step}, "
              f"weight {args.distill_weight}, tau {args.distill_temp})",
              file=sys.stderr)
    if args.ar_range > 0 and par_mode in ("pp", "ep"):
        raise SystemExit("--ar-range supports single-device, data-parallel, "
                         "and --parallel-mode sp|tp training (not pp/ep) — "
                         "parallel/tp.py sp/tp_ar_loss_fn")
    if args.ar_align_from:
        if args.ar_range <= 0:
            raise SystemExit("--ar-align-from needs --ar-range N")
        teacher_params, teacher_cfg, a_step, _ = ckpt.load_plain_params(
            args.ar_align_from)
        print(f"ar band from {args.ar_align_from} (step {a_step}, "
              f"range {args.ar_range}, left {args.ar_left})",
              file=sys.stderr)
    key = jax.random.PRNGKey(args.seed)
    start_step = 0

    def check_saved_cfg():
        saved_cfg = ckpt.load_model_config(args.ckpt_dir)
        if saved_cfg is not None and saved_cfg != cfg:
            raise SystemExit(
                f"--config {args.config} does not match the config saved in "
                f"{args.ckpt_dir}/meta.json: {saved_cfg}")

    resuming = (args.resume and args.ckpt_dir
                and ckpt.latest_step(args.ckpt_dir) is not None)

    if par_mode is not None:
        # 2-D (data, model) mesh: tp / sp / pp (docs/PARALLELISM.md).
        # --ctc-weight is threaded through all four model-parallel loss
        # paths (the CTC head is replicated over the model axis).
        if args.mwer_steps > 0 and args.parallel_mode != "sp":
            # MWER's in-step beam search needs replicated params; "sp"
            # keeps them replicated (the model axis shards only the NLL
            # lattice frames of the plain phase).
            raise SystemExit("--mwer-steps with --model-parallel requires "
                             "--parallel-mode sp (or data parallelism)")
        if ((cfg.big_blank_durations or cfg.tdt_durations)
                and args.parallel_mode not in ("sp", "tp", "pp")):
            # sp extracts the per-cell streams shard-locally; tp picks the
            # big-blank columns / runs the replicated duration head inside
            # the vocab-parallel joint (tp_joint_loss); pp runs the
            # consumed-frames-grid losses replicated on the staged
            # encoder's output (pipeline.pp_loss_fn). "ep" would need
            # the MoE joint, which duration models don't have.
            raise SystemExit("--big-blanks/--tdt-durations with "
                             "--model-parallel require --parallel-mode "
                             "sp, tp, or pp (or data parallelism)")
        # dropout/embed_dropout ARE threaded through the tp/sp/pp/ep
        # steps (parallel/tp.py dropout_rngs: per-GLOBAL-example keys,
        # replicated over the model axis) — no guard needed.
        if args.loss_impl == "pruned" and args.parallel_mode not in (
                "sp", "tp", "pp"):
            # "sp" frame-shards the expensive band joint
            # (sp_pruned_loss_fn); "tp" vocab-shards it with gate-sharded
            # encoder/predictor (tp_pruned_loss_fn); "pp" stages the
            # encoder and runs the two-pass objective replicated
            # (pp_pruned_loss_fn). "ep" routes through the MoE joint,
            # which the band extraction does not model.
            raise SystemExit("--loss-impl pruned with --model-parallel "
                             "requires --parallel-mode sp, tp, or pp "
                             "(or data parallelism)")
        # --ema-decay works under tp/sp/pp/ep: the sharded states carry
        # an EMA pytree in the same layout and load_plain_params merges
        # its shards like the live params.
        # conformer composes with every model-parallel mode: "tp" shards
        # its heads/FFN channels (Megatron-style, parallel/tp.py); "sp"
        # and "ep" keep the encoder replicated and shard the joint+loss
        # frames (/ the MoE experts); "pp" GPipe-stages the
        # d_model-uniform blocks (parallel/pipeline.py).
        # pred_type='stateless' under tp: the tiny linear decoder is
        # replicated (parallel/tp.py split_params_tp) — no guard needed.
        from rnn_transducer_tpu.parallel import pipeline as ppx, tp as tpx
        n_data = args.data_parallel or max(1, len(jax.devices()) // mp)
        mesh = tpx.make_mesh_2d(n_data, mp)
        print(f"devices={jax.devices()} mesh=dp{n_data}x{par_mode}{mp}",
              file=sys.stderr)
        if par_mode == "tp":
            state = tpx.init_tp_train_state(key, cfg, tcfg, mp)
        elif par_mode == "pp":
            state = ppx.init_pp_train_state(key, cfg, tcfg, mp)
        elif par_mode == "ep":
            state = tpx.init_ep_train_state(key, cfg, tcfg, mp)
        else:
            state = tpx.init_sp_train_state(key, cfg, tcfg)
        if resuming:
            check_saved_cfg()
            meta = ckpt.load_meta(args.ckpt_dir) or {}
            saved_par = meta.get("parallel", {})
            if (saved_par.get("mode"), saved_par.get("mp")) != (par_mode, mp):
                raise SystemExit(
                    f"checkpoint topology {saved_par} does not match "
                    f"--parallel-mode {par_mode} --model-parallel {mp}")
            # Parallel states are saved/restored as the live pytree (the
            # TPParams dataclass nodes survive the orbax roundtrip).
            state, start_step = ckpt.restore_checkpoint(args.ckpt_dir, state)
            print(f"resumed from step {start_step}", file=sys.stderr)
        if par_mode == "sp":
            state = tpx.replicate_state(mesh, state)
            step_fn = tpx.make_tp_train_step(cfg, tcfg, mesh, "sp",
                                             teacher_cfg=teacher_cfg)
        else:
            state = tpx.shard_tp_state(mesh, state)
            step_fn = (ppx.make_pp_train_step(cfg, tcfg, mesh,
                                              args.microbatches or None)
                       if par_mode == "pp" else
                       tpx.make_tp_train_step(cfg, tcfg, mesh, par_mode,
                                              teacher_cfg=teacher_cfg))
        if teacher_params is not None:
            # distill teacher / AR aligner rides each call as a replicated
            # traced argument (in_spec P()) — same contract as the dp step.
            # Checkpoint-loaded params are committed to device 0; re-place
            # them replicated on the mesh or jit rejects the device mix.
            _mp_step = step_fn
            _teacher = jax.device_put(
                teacher_params,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
            step_fn = lambda st, *b: _mp_step(st, *b, _teacher)
        shard_train_batch = lambda b: tpx.shard_batch_2d(mesh, b)

        def plain_params(st):
            """Gather + merge to the regular params pytree (eval/decode)."""
            p = jax.device_get(st.params)
            if par_mode == "tp":
                return tpx.merge_params_tp(p, cfg)
            if par_mode == "pp":
                return ppx.merge_params_pp(p, cfg)
            if par_mode == "ep":
                return tpx.merge_params_ep(p, cfg)
            return p
        # CTC pretraining phase under model parallelism: same sharded
        # state/optimizer, the CTC loss replaces the transducer loss for
        # the first N steps (parallel/tp.py, parallel/pipeline.py).
        if args.ctc_pretrain_steps > 0:
            ctc_step_fn = (
                ppx.make_pp_train_step(cfg, tcfg, mesh,
                                       args.microbatches or None,
                                       loss_kind="ctc")
                if par_mode == "pp" else
                tpx.make_tp_train_step(cfg, tcfg, mesh, par_mode,
                                       loss_kind="ctc"))
        else:
            ctc_step_fn = None
        mwer_step_fn = (tpx.make_tp_train_step(cfg, tcfg, mesh, "sp",
                                               loss_kind="mwer")
                        if args.mwer_steps > 0 else None)
    else:
        n_dev = args.data_parallel or len(jax.devices())
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        print(f"devices={jax.devices()} "
              f"mesh={'dp%d' % n_dev if mesh else 'single'}", file=sys.stderr)

        state = init_train_state(key, cfg, tcfg)
        if resuming:
            check_saved_cfg()
            tree, start_step = ckpt.restore_checkpoint(
                args.ckpt_dir, dataclasses.asdict(state))
            state = TrainState(**tree)
            print(f"resumed from step {start_step}", file=sys.stderr)
        if mesh is not None:
            state = TrainState(params=replicate(mesh, state.params),
                               opt_state=replicate(mesh, state.opt_state),
                               step=replicate(mesh, state.step),
                               ema=(replicate(mesh, state.ema)
                                    if state.ema is not None else None))
        step_fn = make_train_step(cfg, tcfg, mesh=mesh,
                                  teacher_cfg=teacher_cfg)
        if teacher_params is not None:
            # teacher rides as a per-call traced argument (replicated
            # under the mesh); the lambda only forwards it
            _rnnt_step, _teacher = step_fn, teacher_params
            step_fn = lambda st, *b: _rnnt_step(st, *b, _teacher)
        shard_train_batch = (
            (lambda b: shard_batch(mesh, b)) if mesh is not None
            else (lambda b: b))
        plain_params = lambda st: st.params
        # CTC encoder pretraining (SURVEY.md §B): same TrainState/optimizer,
        # the first N steps optimize CTC on the auxiliary encoder head.
        ctc_step_fn = (make_train_step(cfg, tcfg, mesh=mesh, loss_kind="ctc")
                       if args.ctc_pretrain_steps > 0 else None)
        # MWER fine-tuning phase: the LAST N steps optimize the expected
        # WER over the live N-best (train/mwer.py) with the same optimizer.
        mwer_step_fn = (make_train_step(cfg, tcfg, mesh=mesh,
                                        loss_kind="mwer")
                        if args.mwer_steps > 0 else None)

    cmvn_stats = None
    if args.cmvn:
        if not (args.data.startswith("manifest:") or args.dev_manifest):
            raise SystemExit("--cmvn requires manifest data (synthetic "
                             "features are already standardized draws)")
        from rnn_transducer_tpu.data.cmvn import load_cmvn
        cmvn_stats = load_cmvn(args.cmvn)

    dev_batch = None
    skip_first = 0
    if args.data.startswith("manifest:"):
        from rnn_transducer_tpu.data.manifest import (manifest_batches,
                                                      manifest_dev_batch)
        train_path = args.data.split(":", 1)[1]
        if args.dev_manifest:
            dev_batch = manifest_dev_batch(args.dev_manifest, cfg, tcfg,
                                           cmvn=cmvn_stats)
        else:
            # Hold the first batch_size examples out of every epoch as the
            # fixed dev batch, so dev metrics reflect the training corpus —
            # but only when the corpus can afford it: on a tiny manifest
            # (<= batch_size utterances) the holdout would consume every
            # training example, so dev overlaps the training data instead.
            from rnn_transducer_tpu.data.manifest import read_manifest
            dev_batch = manifest_dev_batch(train_path, cfg, tcfg,
                                           cmvn=cmvn_stats)
            n_utts = sum(1 for _ in read_manifest(train_path))
            skip_first = (tcfg.batch_size
                          if dev_batch is not None and n_utts > tcfg.batch_size
                          else 0)
        # exact data resume: replay the interrupted run's batch sequence
        # (metadata-only fast-forward, data/manifest.py). Default for the
        # python loader; the native loader's C++ pipeline has no
        # fast-forward hook, so 'exact' there is an explicit error.
        resume_skip = 0
        if resuming and start_step > 0 and args.resume_data != "fresh":
            if args.loader == "native":
                if args.resume_data == "exact":
                    raise SystemExit("--resume-data exact is not supported "
                                     "with --loader native; use the python "
                                     "loader or --resume-data fresh")
                print("note: native loader resumes the data stream from "
                      "epoch 0 (no exact fast-forward); the model/optimizer "
                      "state is unaffected", file=sys.stderr)
            else:
                resume_skip = start_step
                print(f"fast-forwarding the data stream past {resume_skip} "
                      "batches (--resume-data exact)", file=sys.stderr)
        if args.loader == "native":
            from rnn_transducer_tpu.data.native_loader import NativeLoader
            loader = NativeLoader(train_path, cfg, tcfg.buckets,
                                  tcfg.batch_size, loop=True,
                                  seed=args.seed, n_threads=2,
                                  skip_first=skip_first)
            if cmvn_stats is not None:
                # the C++ pipeline emits padded batches; normalize post
                # hoc with the pad mask (pad frames stay exactly zero)
                from rnn_transducer_tpu.data.cmvn import apply_cmvn_batch
                batches = ((apply_cmvn_batch(b[0], b[1], cmvn_stats),)
                           + tuple(b[1:4]) for b in loader)
            else:
                batches = (b[:4] for b in loader)
        else:
            batches = manifest_batches(train_path, cfg, tcfg,
                                       skip_first=skip_first,
                                       sortagrad=args.sortagrad,
                                       shuffle_seed=args.seed,
                                       resume_batches=resume_skip,
                                       cmvn=cmvn_stats)
    else:
        if args.resume_data == "exact":
            raise SystemExit("--resume-data exact requires manifest data "
                             "(synthetic batches are i.i.d. draws; the "
                             "stream restarts deterministically from the "
                             "seed)")
        if args.dev_manifest:
            from rnn_transducer_tpu.data.manifest import manifest_dev_batch
            dev_batch = manifest_dev_batch(args.dev_manifest, cfg, tcfg,
                                           cmvn=cmvn_stats)
        def synthetic_batches():
            rng = np.random.default_rng(args.seed)
            n_labels = min(args.max_labels, 20)
            while True:
                yield learnable_batch(rng, tcfg.batch_size,
                                      n_labels=n_labels,
                                      input_dim=cfg.input_dim,
                                      vocab=cfg.vocab_size,
                                      frames_per_label=max(
                                          2, args.max_frames // n_labels // 2))
        batches = synthetic_batches()

    # Dev-set evaluation (reference train.py evaluates per epoch): loss +
    # greedy PER/WER on a fixed held-out batch.
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.metrics import error_rate, tokens_to_lists
    from rnn_transducer_tpu.train.loop import make_eval_step

    if dev_batch is None:
        eval_rng = np.random.default_rng(args.seed + 12345)
        dev_batch = learnable_batch(eval_rng, min(tcfg.batch_size, 8),
                                    n_labels=min(args.max_labels, 20),
                                    input_dim=cfg.input_dim,
                                    vocab=cfg.vocab_size,
                                    frames_per_label=4) + (
                                        min(tcfg.batch_size, 8),)
    eval_fn = make_eval_step(cfg)
    decode_fn = jax.jit(lambda p, f, l: recognize_greedy(
        p, cfg, f, l, max_symbols=max(args.max_labels * 2, 8)))

    def run_eval(params):
        f, flen, lab, lablen = (jnp.asarray(x) for x in dev_batch[:4])
        nv = dev_batch[4]
        _, per_utt = eval_fn(params, f, flen, lab, lablen)
        toks, lens = decode_fn(params, f, flen)
        per = error_rate(tokens_to_lists(lab[:nv], lablen[:nv]),
                         tokens_to_lists(toks[:nv], lens[:nv]))
        return float(jnp.mean(per_utt[:nv])), per

    tok_meta = None
    if args.tokenizer:
        from rnn_transducer_tpu.data.tokenizer import (tokenizer_from_spec,
                                                       tokenizer_to_meta)
        tok = tokenizer_from_spec(args.tokenizer)
        if tok.vocab_size > cfg.vocab_size:
            raise SystemExit(
                f"--tokenizer {args.tokenizer} needs vocab {tok.vocab_size} "
                f"> model vocab_size {cfg.vocab_size}")
        tok_meta = tokenizer_to_meta(tok)

    def save_state(step_no, st):
        extra = {"train_config": dataclasses.asdict(tcfg)}
        if tok_meta is not None:
            extra["tokenizer"] = tok_meta
        if cmvn_stats is not None:
            # self-describing: recognize/serve/align re-apply the SAME
            # normalization from meta.json without the stats file
            extra["cmvn"] = {"mean": cmvn_stats["mean"],
                             "std": cmvn_stats["std"]}
        if par_mode is not None:
            # Parallel states keep their live pytree (TPParams nodes);
            # meta.json records the topology for resume/recognize.
            extra["parallel"] = {"mode": par_mode, "mp": mp}
            ckpt.save_checkpoint(args.ckpt_dir, step_no, st,
                                 model_cfg=cfg, **extra)
        else:
            ckpt.save_checkpoint(args.ckpt_dir, step_no,
                                 dataclasses.asdict(st),
                                 model_cfg=cfg, **extra)

    # Preemption safety: SIGTERM (the cloud eviction signal) requests a
    # graceful stop — finish the in-flight step, checkpoint, exit cleanly
    # so --resume continues from here.
    stop_signal = {"flag": False}
    if args.ckpt_dir:
        import signal

        def _on_term(signum, frame):
            stop_signal["flag"] = True
        try:
            signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not in the main thread (e.g. embedded use): skip

    t_start = time.perf_counter()
    utts = 0
    step_no = start_step
    info = {"loss": float("nan"), "grad_norm": float("nan")}
    if args.spec_augment:
        from rnn_transducer_tpu.data.augment import spec_augment
        warp = args.spec_augment_warp
        aug_fn = jax.jit(lambda k, f, l: spec_augment(
            k, f, l, time_warp_frames=warp))
        aug_key = jax.random.PRNGKey(args.seed + 777)
    if args.speed_perturb:
        import functools

        from rnn_transducer_tpu.data.augment import speed_perturb
        sp_factors = tuple(float(x) for x in args.speed_perturb.split(","))
        sp_fn = jax.jit(functools.partial(speed_perturb,
                                          factors=sp_factors))
        sp_key = jax.random.PRNGKey(args.seed + 778)
    for i, (feats, fl, labels, ll) in enumerate(batches):
        if i >= args.steps - start_step:
            break
        batch = tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))
        # per-GLOBAL-step keys (fold_in, not a split chain): a resumed run
        # draws the same augmentations an uninterrupted run would at the
        # same step (pairs with --resume-data exact)
        if args.speed_perturb:
            k = jax.random.fold_in(sp_key, start_step + i)
            sp_feats, sp_lens = sp_fn(k, batch[0], batch[1])
            batch = (sp_feats, sp_lens) + batch[2:]
        if args.spec_augment:
            k = jax.random.fold_in(aug_key, start_step + i)
            batch = (aug_fn(k, batch[0], batch[1]),) + batch[1:]
        batch = shard_train_batch(batch)
        phase_ctc = (ctc_step_fn is not None
                     and start_step + i < args.ctc_pretrain_steps)
        phase_mwer = (mwer_step_fn is not None and not phase_ctc
                      and start_step + i >= args.steps - args.mwer_steps)
        state, info = (ctc_step_fn if phase_ctc
                       else mwer_step_fn if phase_mwer
                       else step_fn)(state, *batch)
        utts += feats.shape[0]
        step_no = start_step + i + 1
        if step_no % args.log_every == 0:
            dt = time.perf_counter() - t_start
            mlog.log(step=step_no,
                     phase=("ctc" if phase_ctc
                            else "mwer" if phase_mwer else "rnnt"),
                     loss=round(float(info["loss"]), 4),
                     grad_norm=round(float(info["grad_norm"]), 4),
                     utt_per_sec=round(utts / dt, 2))
        if args.eval_every and step_no % args.eval_every == 0:
            dev_loss, per = run_eval(plain_params(state))
            mlog.log(step=step_no, dev_loss=round(dev_loss, 4),
                     dev_per=round(per, 4))
        if args.ckpt_dir and step_no % args.ckpt_every == 0:
            save_state(step_no, state)
        if stop_signal["flag"]:
            save_state(step_no, state)
            print(f"SIGTERM: checkpointed step {step_no} to "
                  f"{args.ckpt_dir}, stopping", file=sys.stderr)
            break
    if args.ckpt_dir:
        save_state(step_no, state)
        print(f"saved final checkpoint at step {step_no} to {args.ckpt_dir}",
              file=sys.stderr)
    mlog.close()
    print(json.dumps({"final_loss": round(float(info["loss"]), 4),
                      "steps": step_no}))
    return state


if __name__ == "__main__":
    main()
