"""Training loop: jitted update step, optax optimizer, DP sharding.

Replaces the reference's `train.py` epoch script (SURVEY.md §3) with a
TPU-native design: one jitted `train_step` (forward + RNN-T loss + backward
+ Adam update) compiled per bucket shape; parameters replicated and batches
sharded over the "data" mesh axis so the gradient all-reduce rides ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
from rnn_transducer_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas


def select_rnnt_loss(impl: str = "auto"):
    """Pick the loss kernel: Pallas on TPU, pure-XLA elsewhere (or forced)."""
    if impl == "pallas":
        return rnnt_loss_pallas
    if impl == "xla":
        return rnnt_loss
    return rnnt_loss_pallas if jax.default_backend() == "tpu" else rnnt_loss


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("params", "opt_state", "step", "ema"),
    meta_fields=(),
)
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    # Polyak-averaged params (TrainConfig.ema_decay > 0), else None —
    # None is an empty pytree node, so the default keeps existing
    # checkpoints and TrainState(...) constructors working unchanged.
    ema: Any = None


def make_lr_schedule(tcfg: TrainConfig) -> optax.Schedule:
    """LR schedule per TrainConfig.lr_schedule (all warm up linearly).

    "noam" is the inverse-sqrt transducer/transformer staple:
    peak * min(step/warmup, sqrt(warmup/step)); "step_decay" multiplies
    by decay_rate every decay_every steps (newbob-style fixed variant —
    loss-reactive decay does not fit a jitted update)."""
    peak, warm = tcfg.learning_rate, max(tcfg.warmup_steps, 1)
    if tcfg.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak, warmup_steps=tcfg.warmup_steps,
            decay_steps=max(tcfg.total_steps, tcfg.warmup_steps + 1),
            end_value=peak * 0.05)
    if tcfg.lr_schedule == "noam":
        def noam(step):
            s = jnp.maximum(step.astype(jnp.float32), 1.0)
            return peak * jnp.minimum(s / warm, jnp.sqrt(warm / s))
        return noam
    if tcfg.lr_schedule == "step_decay":
        def step_decay(step):
            s = step.astype(jnp.float32)
            warmup = jnp.minimum(s / warm, 1.0)
            k = jnp.floor(s / tcfg.decay_every)
            return peak * warmup * jnp.power(tcfg.decay_rate, k)
        return step_decay
    if tcfg.lr_schedule == "constant":
        return lambda step: peak * jnp.minimum(
            step.astype(jnp.float32) / warm, 1.0)
    raise ValueError(f"unknown lr_schedule {tcfg.lr_schedule!r}")


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    # grad_accum == 1: the clip slot is an identity — the train step's
    # failure guard already computes the global grad norm, so apply()
    # clips with THAT norm (same math as optax.clip_by_global_norm)
    # instead of paying a second full read of the gradients every step.
    # optax.identity() has the same EmptyState as clip_by_global_norm, so
    # the opt_state pytree (and every existing checkpoint) is unchanged.
    # grad_accum > 1 keeps the real clip inside MultiSteps: there it must
    # apply to the ACCUMULATED gradient, which apply() never sees.
    tx = optax.chain(
        optax.identity() if tcfg.grad_accum == 1
        else optax.clip_by_global_norm(tcfg.grad_clip_norm),
        optax.adamw(make_lr_schedule(tcfg), weight_decay=tcfg.weight_decay),
    )
    if tcfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum)
    return tx


def init_train_state(key, cfg: TransducerConfig, tcfg: TrainConfig) -> TrainState:
    params = m.init_params(key, cfg)
    tx = make_optimizer(tcfg)
    # ema starts as a COPY of the params: aliasing them would donate the
    # same buffers twice in the (donated) train step.
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=(jax.tree.map(jnp.copy, params)
                           if tcfg.ema_decay > 0 else None))


def loss_fn(params, cfg: TransducerConfig, feats, feat_lens, labels,
            label_lens, loss_impl: str = "auto", dropout: float = 0.0,
            embed_dropout: float = 0.0, dropout_rng=None,
            dropout_offset=0, fastemit: float = 0.0,
            simple_loss_scale: float = 0.5, ctc_weight: float = 0.0,
            ar_range: int = 0, ar_left: int = -1, align_cfg=None,
            teacher_params=None):
    """Batch-mean RNN-T loss; per-utterance losses also returned.

    "fused" (default on TPU) never materializes the (B,T,U+1,V) logits:
    joint + loss run as one Pallas op (ops/rnnt_joint_fused.py).
    dropout/embed_dropout take effect only when dropout_rng (a single
    key) is given: per-example mask keys are derived from the GLOBAL
    batch position (dropout_offset + local index), so a DP shard draws
    the same mask for an example as the single-device run would.
    ctc_weight > 0 (requires cfg.ctc_head) adds weighted CTC on the
    auxiliary encoder head — continuous multitask regularization of the
    encoder (the icefall/ESPnet hybrid recipe), sharing the single
    encoder pass; per-utterance losses are the combined objective.
    """
    rngs = None
    if dropout_rng is not None:
        idx = dropout_offset + jnp.arange(feats.shape[0])
        rngs = jax.vmap(jax.random.fold_in,
                        in_axes=(None, 0))(dropout_rng, idx)
    do = dict(dropout=dropout, rng=rngs)

    if ctc_weight and cfg.joint_experts > 0:
        raise ValueError("ctc_weight with an MoE joint is not supported")

    def with_ctc(per_utt, enc_out, enc_lens):
        """per_utt + ctc_weight * per-utterance CTC on the shared
        encoder output (no second encoder pass)."""
        if not ctc_weight:
            return per_utt
        from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
        ctc_pu = ctc_loss_from_logits(
            m.ctc_logits(params, cfg, enc_out), labels, enc_lens,
            label_lens, cfg.blank)
        return per_utt + ctc_weight * ctc_pu

    if cfg.tdt_durations:
        # TDT (ops/rnnt_tdt.py): tokens x durations marginalized on the
        # consumed-frames grid; logits + duration logits materialize
        # (the xla tier) — fused/pallas/pruned and FastEmit don't model
        # the duration factor.
        if loss_impl not in ("auto", "xla"):
            raise ValueError("TDT models train with loss_impl='auto'|"
                             f"'xla' (got {loss_impl!r})")
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with TDT "
                             "models")
        from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        logits, dur_logits = m.joint_tdt(params, cfg, enc_out, pred_out)
        per_utt = with_ctc(
            rnnt_loss_tdt(logits, dur_logits, labels, enc_lens,
                          label_lens, cfg.tdt_durations, cfg.blank),
            enc_out, enc_lens)
        return jnp.mean(per_utt), per_utt
    if cfg.big_blank_durations:
        # multi-blank transducer (ops/rnnt_multiblank.py): the extra
        # duration transitions exist only in the dedicated lattice solver
        # — logits materialize (the xla tier); fused/pallas/pruned kernels
        # and FastEmit don't model the jump arcs.
        if loss_impl not in ("auto", "xla"):
            raise ValueError("multi-blank models train with "
                             "loss_impl='auto'|'xla' (got "
                             f"{loss_impl!r})")
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with "
                             "multi-blank models")
        from rnn_transducer_tpu.ops.rnnt_multiblank import \
            rnnt_loss_multiblank
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        logits = m.joint(params, cfg, enc_out, pred_out)
        per_utt = with_ctc(
            rnnt_loss_multiblank(logits, labels, enc_lens, label_lens,
                                 cfg.big_blank_durations, cfg.blank),
            enc_out, enc_lens)
        return jnp.mean(per_utt), per_utt
    if cfg.joint_experts > 0:
        if loss_impl == "ar":
            raise ValueError("alignment-restricted training (ar_range) "
                             "does not support an MoE joint")
        # MoE joint: the logits must materialize through the routed joint
        # (the fused joint+loss kernel computes dense logits on-chip), and
        # the router's load-balance aux loss joins the objective.
        (logits, aux), enc_lens = m.forward(params, cfg, feats, feat_lens,
                                            labels, with_aux=True,
                                            embed_dropout=embed_dropout,
                                            **do)
        per_utt = select_rnnt_loss(
            "xla" if loss_impl in ("auto", "fused") else loss_impl)(
            logits, labels, enc_lens, label_lens, cfg.blank, fastemit)
        return jnp.mean(per_utt) + cfg.moe_aux_weight * aux, per_utt
    if loss_impl == "ar":
        # Alignment-restricted RNN-T (Mahadeokar et al. 2021): the banded
        # loss on a band around a reference Viterbi alignment instead of
        # the simple joiner's posteriors — no simple heads, and emission
        # timing is CONSTRAINED (paths may run at most ar_left labels
        # behind the alignment, ar_range-1-ar_left ahead), bounding
        # training-time emission delay for streaming models. The
        # alignment comes from teacher_params (an --ar-align-from
        # checkpoint on the same lattice grid) or, when None, from the
        # live model under stop_gradient (self-alignment — guided
        # pruning along the model's own best path).
        if ar_range <= 0:
            raise ValueError("loss_impl='ar' requires TrainConfig."
                             "ar_range > 0")
        from rnn_transducer_tpu.ops.rnnt_align import (
            _gather_label_logprobs, emit_frames_device, rnnt_viterbi)
        from rnn_transducer_tpu.ops.rnnt_pruned import (alignment_bounds,
                                                        rnnt_loss_pruned)
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        f, g, w, b = m.joint_activations(params, cfg, enc_out, pred_out)
        a_params = (jax.lax.stop_gradient(params) if teacher_params is None
                    else teacher_params)
        a_cfg = cfg if teacher_params is None else align_cfg
        # the aligner runs clean (no dropout) — the band must not jitter
        # with the regularizer's masks
        a_logits, a_lens = m.forward(a_params, a_cfg, feats, feat_lens,
                                     labels)
        lp = jax.lax.stop_gradient(
            jax.nn.log_softmax(a_logits.astype(jnp.float32), axis=-1))
        _, K = rnnt_viterbi(lp[..., a_cfg.blank],
                            _gather_label_logprobs(lp, labels),
                            a_lens, label_lens)
        emit = emit_frames_device(K, a_lens, label_lens)
        U1 = labels.shape[1] + 1
        sb = alignment_bounds(emit, enc_out.shape[1], ar_range, enc_lens,
                              label_lens, U1,
                              left_labels=None if ar_left < 0 else ar_left)
        per_utt = with_ctc(
            rnnt_loss_pruned(f, g, w, b, labels, enc_lens, label_lens, sb,
                             ar_range, cfg.blank, cfg.cdtype, fastemit),
            enc_out, enc_lens)
        return jnp.mean(per_utt), per_utt
    if loss_impl == "pruned":
        # k2-style two-pass objective (ops/rnnt_pruned.py): cheap
        # trivial-joiner first pass -> pruning band -> expensive joint on
        # the (T, S) band only. Reported per-utterance losses are the
        # pruned NLL bound.
        if cfg.pruned_range <= 0:
            raise ValueError("loss_impl='pruned' requires "
                             "TransducerConfig.pruned_range > 0")
        from rnn_transducer_tpu.ops.rnnt_pruned import pruned_two_pass_loss
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        f, g, w, b = m.joint_activations(params, cfg, enc_out, pred_out)
        simple_pu, pruned_pu, _ = pruned_two_pass_loss(
            params["simple"], f, g, w, b, enc_out, pred_out, labels,
            enc_lens, label_lens, cfg.pruned_range, cfg.blank, cfg.cdtype,
            fastemit)
        pruned_pu = with_ctc(pruned_pu, enc_out, enc_lens)
        total = (jnp.mean(pruned_pu)
                 + simple_loss_scale * jnp.mean(simple_pu))
        return total, pruned_pu
    if loss_impl == "auto":
        if jax.default_backend() == "tpu":
            from rnn_transducer_tpu.ops.rnnt_joint_fused import fused_supported
            loss_impl = ("fused" if fused_supported(
                labels.shape[1] + 1, cfg.joint_dim, cfg.vocab_size)
                else "pallas")
        else:
            loss_impl = "xla"
    if loss_impl == "fused":
        from rnn_transducer_tpu.ops.rnnt_joint_fused import rnnt_loss_fused
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        f, g, w, b = m.joint_activations(params, cfg, enc_out, pred_out)
        per_utt = with_ctc(
            rnnt_loss_fused(f, g, w, b, labels, enc_lens, label_lens,
                            cfg.blank, cfg.cdtype, fastemit),
            enc_out, enc_lens)
    else:
        enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
        pred_out, _ = m.predict(params, cfg, labels,
                                embed_dropout=embed_dropout, **do)
        logits = m.joint(params, cfg, enc_out, pred_out)
        per_utt = with_ctc(
            select_rnnt_loss(loss_impl)(logits, labels, enc_lens,
                                        label_lens, cfg.blank, fastemit),
            enc_out, enc_lens)
    return jnp.mean(per_utt), per_utt


def ctc_loss_fn(params, cfg: TransducerConfig, feats, feat_lens, labels,
                label_lens):
    """Batch-mean CTC loss on the auxiliary encoder head (pretraining)."""
    from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    logits = m.ctc_logits(params, cfg, enc_out)
    per_utt = ctc_loss_from_logits(logits, labels, enc_lens, label_lens,
                                   cfg.blank)
    return jnp.mean(per_utt), per_utt


def distill_loss_fn(params, teacher_params, cfg: TransducerConfig,
                    teacher_cfg: TransducerConfig, feats, feat_lens,
                    labels, label_lens, distill_weight: float,
                    distill_temp: float = 1.0, dropout: float = 0.0,
                    embed_dropout: float = 0.0, dropout_rng=None,
                    dropout_offset=0):
    """RNN-T NLL + distill_weight * lattice KD (teacher-student).

    The KD term is KL(p_teacher || p_student) of the temperature-softened
    joint posteriors, averaged over the VALID lattice cells (t < enc_len,
    u <= label_len) and scaled by tau^2 (Hinton et al.) so its gradient
    magnitude is temperature-invariant. The teacher forward runs under
    stop_gradient with no dropout; any architecture whose lattice grid
    matches (same vocab/blank/time_reduction) can teach — the classic
    recipe distills a big offline teacher into a small streaming student.
    Student trains at the xla loss tier (the KD needs materialized
    logits, which the fused kernel never forms).
    """
    rngs = None
    if dropout_rng is not None:
        idx = dropout_offset + jnp.arange(feats.shape[0])
        rngs = jax.vmap(jax.random.fold_in,
                        in_axes=(None, 0))(dropout_rng, idx)
    do = dict(dropout=dropout, rng=rngs)
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens, **do)
    pred_out, _ = m.predict(params, cfg, labels,
                            embed_dropout=embed_dropout, **do)
    logits = m.joint(params, cfg, enc_out, pred_out)
    per_utt = rnnt_loss(logits, labels, enc_lens, label_lens, cfg.blank)

    t_logits, t_lens = m.forward(teacher_params, teacher_cfg, feats,
                                 feat_lens, labels)
    t_logits = jax.lax.stop_gradient(t_logits)
    tau = distill_temp
    lp_s = jax.nn.log_softmax(logits.astype(jnp.float32) / tau, axis=-1)
    lp_t = jax.nn.log_softmax(t_logits.astype(jnp.float32) / tau, axis=-1)
    kl = jnp.sum(jnp.exp(lp_t) * (lp_t - lp_s), axis=-1)  # (B, T', U+1)
    B, T, U1 = kl.shape
    tmask = jnp.arange(T)[None, :, None] < enc_lens[:, None, None]
    umask = jnp.arange(U1)[None, None, :] <= label_lens[:, None, None]
    mask = (tmask & umask).astype(kl.dtype)
    kd_pu = (jnp.sum(kl * mask, axis=(1, 2))
             / jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)) * tau * tau
    per_utt = per_utt + distill_weight * kd_pu
    return jnp.mean(per_utt), per_utt


def check_distill_compat(cfg: TransducerConfig,
                         teacher_cfg: TransducerConfig,
                         tcfg: TrainConfig):
    """Raise unless the teacher's lattice grid matches the student's and
    the training configuration supports the KD term."""
    for field in ("vocab_size", "blank", "time_reduction"):
        a, b = getattr(cfg, field), getattr(teacher_cfg, field)
        if a != b:
            raise ValueError(f"distillation needs teacher {field} == "
                             f"student {field} (teacher {b}, student {a})")
    if cfg.tdt_durations or cfg.big_blank_durations or \
            teacher_cfg.tdt_durations or teacher_cfg.big_blank_durations:
        raise ValueError("distillation supports standard transducers "
                         "(no TDT / multi-blank joint grids)")
    if cfg.joint_experts > 0:
        raise ValueError("distillation with an MoE student joint is not "
                         "supported")
    if tcfg.loss_impl not in ("auto", "xla"):
        raise ValueError("distillation trains at the xla loss tier "
                         f"(loss_impl {tcfg.loss_impl!r}); the KD term "
                         "needs materialized joint logits")
    if tcfg.ctc_weight or tcfg.fastemit_lambda:
        raise ValueError("distillation does not compose with ctc_weight/"
                         "fastemit_lambda")


def check_ar_compat(cfg: TransducerConfig, align_cfg: TransducerConfig):
    """Raise unless the aligner checkpoint's lattice grid matches the
    student's — its Viterbi emit frames index the student's encoder
    frames directly (alignment-restricted training, loss_impl='ar')."""
    for field in ("vocab_size", "blank", "time_reduction"):
        a, b = getattr(cfg, field), getattr(align_cfg, field)
        if a != b:
            raise ValueError(f"ar alignment needs aligner {field} == "
                             f"student {field} (aligner {b}, student {a})")
    if cfg.tdt_durations or cfg.big_blank_durations or \
            align_cfg.tdt_durations or align_cfg.big_blank_durations:
        raise ValueError("alignment-restricted training supports standard "
                         "transducers (no TDT / multi-blank joint grids)")


def make_train_step(cfg: TransducerConfig, tcfg: TrainConfig, mesh=None,
                    loss_kind: str = "rnnt", teacher_cfg=None):
    """Build the jitted update step.

    With a mesh the step runs under `shard_map` over the "data" axis:
    each shard computes loss/grads on its local batch slice and the
    gradients are pmean-ed over ICI. shard_map (rather than jit+shardings
    auto-SPMD) is required because the Pallas kernels in the fused loss /
    LSTM paths have no SPMD partitioning rules — inside shard_map each
    device runs the kernel on its local shard, which is exactly DP.
    """
    tx = make_optimizer(tcfg)
    if loss_kind == "ctc":
        batch_loss = functools.partial(ctc_loss_fn, cfg=cfg)
    elif loss_kind == "mwer":
        from rnn_transducer_tpu.train.mwer import mwer_loss_fn
        batch_loss = functools.partial(
            mwer_loss_fn, cfg=cfg, beam=tcfg.mwer_beam,
            expansions=tcfg.mwer_expansions,
            max_symbols=tcfg.mwer_max_symbols,
            nll_weight=tcfg.mwer_nll_weight)
    elif loss_kind == "rnnt" and tcfg.distill_weight > 0.0:
        # teacher-student: the step takes the (replicated) teacher params
        # as an extra traced argument — closure capture would inline the
        # teacher weights into the compiled program.
        if tcfg.ar_range > 0:
            raise ValueError("ar_range and distill_weight are mutually "
                             "exclusive (one teacher slot)")
        if teacher_cfg is None:
            raise ValueError("distill_weight > 0 needs teacher_cfg (and "
                             "the step must be called with teacher_params)")
        check_distill_compat(cfg, teacher_cfg, tcfg)
        batch_loss = functools.partial(
            distill_loss_fn, cfg=cfg, teacher_cfg=teacher_cfg,
            distill_weight=tcfg.distill_weight,
            distill_temp=tcfg.distill_temp)
    elif loss_kind == "rnnt" and tcfg.ar_range > 0:
        # alignment-restricted training: the (optional) aligner checkpoint
        # rides the step as the same traced teacher_params argument the
        # distillation path uses (None = self-alignment).
        if tcfg.distill_weight > 0.0:
            raise ValueError("ar_range and distill_weight are mutually "
                             "exclusive (one teacher slot)")
        if tcfg.loss_impl not in ("auto", "ar"):
            raise ValueError("ar_range > 0 trains with loss_impl='auto'|"
                             f"'ar' (got {tcfg.loss_impl!r})")
        if teacher_cfg is not None:
            check_ar_compat(cfg, teacher_cfg)
        batch_loss = functools.partial(
            loss_fn, cfg=cfg, loss_impl="ar", ar_range=tcfg.ar_range,
            ar_left=tcfg.ar_left, fastemit=tcfg.fastemit_lambda,
            ctc_weight=tcfg.ctc_weight, align_cfg=teacher_cfg)
    else:
        batch_loss = functools.partial(loss_fn, cfg=cfg,
                                       loss_impl=tcfg.loss_impl,
                                       fastemit=tcfg.fastemit_lambda,
                                       simple_loss_scale=tcfg.simple_loss_scale,
                                       ctc_weight=tcfg.ctc_weight)

    distilling = loss_kind == "rnnt" and tcfg.distill_weight > 0.0
    uses_teacher = distilling or (loss_kind == "rnnt" and tcfg.ar_range > 0
                                  and teacher_cfg is not None)
    has_dropout = (loss_kind == "rnnt"
                   and (tcfg.dropout > 0.0 or tcfg.embed_dropout > 0.0))

    def grads_and_metrics(params, step, feats, feat_lens, labels,
                          label_lens, dropout_offset=0,
                          teacher_params=None):
        if has_dropout:
            # Fresh masks every step; the key folds in the step counter
            # (replicated under DP) and the masks are drawn per GLOBAL
            # example index (see loss_fn), so DP shards stay in bitwise
            # lockstep with the single-device trajectory.
            drop_key = jax.random.fold_in(
                jax.random.PRNGKey(tcfg.seed ^ 0xD120), step)
            batch_loss_step = functools.partial(
                batch_loss, dropout=tcfg.dropout,
                embed_dropout=tcfg.embed_dropout, dropout_rng=drop_key,
                dropout_offset=dropout_offset)
        else:
            batch_loss_step = batch_loss
        if tcfg.weight_noise_std > 0.0:
            # Graves weight noise: gradients are taken at params + eps,
            # eps ~ N(0, std); the update applies to the clean params.
            # The key folds in the step counter, so DP shards (replicated
            # step) draw identical noise and stay in lockstep.
            key = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed ^ 0x5EED),
                                     step)
            leaves, treedef = jax.tree.flatten(params)
            keys = jax.random.split(key, len(leaves))
            noisy = [l + tcfg.weight_noise_std
                     * jax.random.normal(k, l.shape, l.dtype)
                     for l, k in zip(leaves, keys)]
            params = jax.tree.unflatten(treedef, noisy)
        extra = ({} if teacher_params is None
                 else {"teacher_params": teacher_params})
        (loss, per_utt), grads = jax.value_and_grad(
            lambda p: batch_loss_step(p, feats=feats, feat_lens=feat_lens,
                                      labels=labels, label_lens=label_lens,
                                      **extra),
            has_aux=True,
        )(params)
        return loss, grads

    def apply(state, loss, grads):
        # Failure guard: a non-finite loss/grad (rare divergence spikes in
        # RNN-T training) skips the update instead of corrupting the params.
        # lax.cond (not where-selects): the skip branch is rare, and
        # selecting params+opt_state after the fact costs 3 full passes
        # over ~3x the model size in HBM traffic every step (profiled at
        # ~3 ms/step on the 6x1024 libri960 config).
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        def do_update(operand):
            st, grads = operand
            if tcfg.grad_accum == 1:
                # clip with the guard's gnorm (exactly optax
                # clip_by_global_norm's arithmetic — see make_optimizer)
                c = tcfg.grad_clip_norm
                trigger = gnorm < c
                grads = jax.tree.map(
                    lambda t: jax.lax.select(
                        trigger, t, (t / gnorm.astype(t.dtype)) * c), grads)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            ema = st.ema
            if tcfg.ema_decay > 0:
                d = tcfg.ema_decay
                ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   st.ema, params)
            return TrainState(params=params, opt_state=opt_state,
                              step=st.step + 1, ema=ema)

        def skip_update(operand):
            st, _ = operand
            return TrainState(params=st.params, opt_state=st.opt_state,
                              step=st.step + 1, ema=st.ema)

        new_state = jax.lax.cond(ok, do_update, skip_update, (state, grads))
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "skipped_nonfinite": (~ok).astype(jnp.int32)}

    if mesh is None:
        if uses_teacher:
            def step_fn(state, feats, feat_lens, labels, label_lens,
                        teacher_params):
                loss, grads = grads_and_metrics(
                    state.params, state.step, feats, feat_lens, labels,
                    label_lens, teacher_params=teacher_params)
                return apply(state, loss, grads)
        else:
            def step_fn(state, feats, feat_lens, labels, label_lens):
                loss, grads = grads_and_metrics(state.params, state.step,
                                                feats, feat_lens, labels,
                                                label_lens)
                return apply(state, loss, grads)

        return jax.jit(step_fn, donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P

    def shard_fn(state, feats, feat_lens, labels, label_lens,
                 teacher_params=None):
        offset = jax.lax.axis_index("data") * feats.shape[0]
        loss, grads = grads_and_metrics(state.params, state.step, feats,
                                        feat_lens, labels, label_lens,
                                        dropout_offset=offset,
                                        teacher_params=teacher_params)
        # batch-mean over all shards: each shard's mean weighted equally
        loss = jax.lax.pmean(loss, "data")
        grads = jax.lax.pmean(grads, "data")
        return apply(state, loss, grads)

    state_spec = TrainState(params=P(), opt_state=P(), step=P(), ema=P())
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(state_spec, P("data"), P("data"), P("data"), P("data"))
        + ((P(),) if uses_teacher else ()),  # teacher replicated
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(cfg: TransducerConfig):
    @jax.jit
    def eval_fn(params, feats, feat_lens, labels, label_lens):
        loss, per_utt = loss_fn(params, cfg, feats, feat_lens, labels,
                                label_lens)
        return loss, per_utt
    return eval_fn
