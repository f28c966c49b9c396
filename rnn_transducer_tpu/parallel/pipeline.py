"""Pipeline-parallel encoder execution (GPipe schedule) over the model axis.

Third model-axis strategy next to tp/sp (parallel/tp.py): the encoder's
layer stack is split into `pp` contiguous stages, one per model-axis
device; the local batch is split into `M` microbatches that flow through
the stages in the classic GPipe schedule (M + pp - 1 steps, bubble
fraction (pp-1)/(M+pp-1)). Design notes:

  * the schedule is one `lax.scan`; stage handoffs are `ppermute` shifts
    over ICI. Because the whole pipeline is a differentiable function,
    `jax.grad` through the scan yields the reverse (backward) schedule
    automatically — ppermute transposes to the inverse shift.
  * the SPMD program must be identical on every stage, so every stage's
    first layer has its input projection rows zero-padded to
    Dmax = max(input_dim, enc_out_dim) and the inter-stage activation
    buffer is (Bm, T, Dmax); zero rows contribute nothing to the matmul
    and receive zero gradient.
  * invalid (bubble) steps compute garbage that is never written to the
    output accumulator nor consumed by a valid slot downstream.
  * predictor / joint / loss run replicated over the model axis on the
    psum-assembled encoder output; gradient combine rules are the same
    as tensor parallel (parallel/tp.py): replicated leaves pmean over
    "model", stage-owned leaves divide by pp.

Conformer encoders stage their shape-uniform d_model blocks with no
Dmax padding; frame stacking + the input projection run replicated
BEFORE the pipeline, so time_reduction > 1 is fine there.

Restrictions: time_reduction == 1 for LSTM encoders (frame stacking
changes the activation shape mid-stack, breaking the uniform
inter-stage buffer — apply frame stacking in the frontend for LSTM PP
models), enc_layers % pp == 0, and the per-data-shard batch divisible
by the microbatch count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.lstm import mask_padding, reverse_padded
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
from rnn_transducer_tpu.parallel.tp import (
    DATA_AXIS,
    MODEL_AXIS,
    TPParams,
    TrainState,
    apply_weight_noise,
    dropout_rngs,
    _with_ctc,
    _combine_model_grads,
    _tp_global_norm,
    _tp_expand,
    _tp_squeeze,
    make_optimizer_noclip,
    tp_specs,
)


def _pad_rows(w, rows: int):
    return jnp.pad(w, ((0, rows - w.shape[0]), (0, 0)))


def _pad_first_layer(layer, dmax: int, bidirectional: bool):
    def pad(p):
        return {**p, "w_ih": _pad_rows(p["w_ih"], dmax)}

    if bidirectional:
        return {"fwd": pad(layer["fwd"]), "bwd": pad(layer["bwd"])}
    return pad(layer)


def _unpad_first_layer(layer, in_dim: int, bidirectional: bool):
    def unpad(p):
        return {**p, "w_ih": p["w_ih"][:in_dim]}

    if bidirectional:
        return {"fwd": unpad(layer["fwd"]), "bwd": unpad(layer["bwd"])}
    return unpad(layer)


def _stage_in_dim(cfg: TransducerConfig, layer_idx: int) -> int:
    return cfg.input_dim if layer_idx == 0 else cfg.enc_out_dim


def split_params_pp(params, cfg: TransducerConfig, pp: int) -> TPParams:
    """Full params -> TPParams: encoder layers grouped into pp stages and
    stacked over a leading pp axis (stage s owns layers [s*lps, (s+1)*lps));
    everything else replicated.

    Conformer encoders stage their (shape-uniform, d_model-wide) blocks
    with no Dmax padding; the input projection + frame stacking run
    replicated BEFORE the pipeline (so time_reduction > 1 is fine — the
    inter-stage buffer is built after subsampling). LSTM encoders keep
    the padded-entry-row scheme and need time_reduction == 1.
    """
    assert cfg.enc_layers % pp == 0, (
        f"enc_layers {cfg.enc_layers} not divisible by pipeline depth {pp}")
    lps = cfg.enc_layers // pp
    if cfg.enc_type == "conformer":
        blocks = params["encoder"][1:]
        stage_layers = [
            jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[blocks[s * lps + j] for s in range(pp)])
            for j in range(lps)]
        rep = {k: v for k, v in params.items() if k != "encoder"}
        rep["enc_in_proj"] = params["encoder"][0]["in_proj"]
        return TPParams(rep=rep, shd={"encoder": stage_layers})
    assert cfg.time_reduction == 1, (
        "PP over an LSTM encoder requires time_reduction == 1")
    dmax = max(cfg.input_dim, cfg.enc_out_dim)
    stage_layers = []
    for j in range(lps):
        per_stage = []
        for s in range(pp):
            layer = params["encoder"][s * lps + j]
            if j == 0:  # stage entry layer: uniform padded input rows
                layer = _pad_first_layer(layer, dmax, cfg.bidirectional)
            per_stage.append(layer)
        stage_layers.append(
            jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage))
    rep = {k: v for k, v in params.items() if k != "encoder"}
    return TPParams(rep=rep, shd={"encoder": stage_layers})


def merge_params_pp(tpp: TPParams, cfg: TransducerConfig) -> dict:
    lps = len(tpp.shd["encoder"])
    pp = jax.tree.leaves(tpp.shd["encoder"][0])[0].shape[0]
    if "enc_in_proj" in tpp.rep:  # conformer
        encoder = [{"in_proj": tpp.rep["enc_in_proj"]}] + [
            jax.tree.map(lambda x: x[s], tpp.shd["encoder"][j])
            for s in range(pp) for j in range(lps)]
        rep = {k: v for k, v in tpp.rep.items() if k != "enc_in_proj"}
        return {"encoder": encoder, **rep}
    encoder = []
    for s in range(pp):
        for j in range(lps):
            layer = jax.tree.map(lambda x: x[s], tpp.shd["encoder"][j])
            if j == 0:
                layer = _unpad_first_layer(
                    layer, _stage_in_dim(cfg, s * lps), cfg.bidirectional)
            encoder.append(layer)
    return {"encoder": encoder, **tpp.rep}


def _run_stage(stage_layers, cfg: TransducerConfig, x, lens, *,
               stage_idx=None, dropout: float = 0.0, rngs=None):
    """Apply this stage's layers to one microbatch activation.

    x: (Bm, T, Dmax) zero-padded beyond the true input dim; the padded
    rows of the first layer's w_ih make the extra channels inert.
    dropout (rngs = per-example keys for THIS microbatch) applies at the
    same global-layer sites as the single-device encode: site = global
    layer index (stage_idx * layers-per-stage + j), skipped on the last
    encoder layer — stage_idx is traced (lax.axis_index), so the skip is
    a select.
    """
    from rnn_transducer_tpu.ops.lstm import bilstm_layer, lstm_layer

    lps = len(stage_layers)
    n_layers = cfg.enc_layers
    x = mask_padding(x, lens)  # matches encode()'s input masking
    for j, layer in enumerate(stage_layers):
        if j > 0:  # inner layers consume the true feature width
            x = x[..., : cfg.enc_out_dim]
        if cfg.bidirectional:
            x = bilstm_layer(layer["fwd"], layer["bwd"], x, lens,
                             compute_dtype=cfg.cdtype)
        else:
            x = lstm_layer(layer, x, impl="scan",
                           compute_dtype=cfg.cdtype)[0]
        x = mask_padding(x, lens)
        if dropout > 0.0 and rngs is not None:
            gi = stage_idx * lps + j
            dropped = m._dropout(x, dropout, rngs, site=gi)
            x = jnp.where(gi < n_layers - 1, dropped, x)
    return x  # (Bm, T, enc_out_dim)


def _run_stage_conformer(stage_blocks, cfg: TransducerConfig, x, lens, *,
                         stage_idx=None, dropout: float = 0.0, rngs=None):
    """Apply this stage's conformer blocks to one microbatch activation.

    x: (Bm, T', d_model) — already subsampled + projected (the in_proj
    runs replicated before the pipeline). No inter-block masking, like
    the single-device encode (blocks mask attention/conv by lens
    internally); dropout sites are the GLOBAL block indices, skipped on
    the last block.
    """
    from rnn_transducer_tpu.ops.conformer import conformer_block

    bps = len(stage_blocks)
    n = cfg.enc_layers
    for j, block in enumerate(stage_blocks):
        x = conformer_block(block, x, lens, cfg.enc_heads, cfg.cdtype,
                            att_left=cfg.enc_att_left,
                            chunk_att=cfg.enc_chunk_att)
        if dropout > 0.0 and rngs is not None:
            gi = stage_idx * bps + j
            dropped = m._dropout(x, dropout, rngs, site=gi)
            x = jnp.where(gi < n - 1, dropped, x)
    return x  # (Bm, T', d_model)


def pp_encode(stage_layers, cfg: TransducerConfig, feats, feat_lens, *,
              pp: int, microbatches: int, axis=MODEL_AXIS,
              dropout: float = 0.0, rngs=None, in_proj=None):
    """GPipe-scheduled encoder: feats (Bl, T, F) -> enc_out (Bl, T', De).

    Runs inside shard_map over a (data, model) mesh; stage_layers is this
    device's stage (leading stage axis already squeezed). For conformer
    encoders, frame stacking + the input projection (in_proj, replicated)
    run before the microbatch split, so the inter-stage buffer is the
    uniform post-subsampling (Bm, T', d_model)."""
    s = jax.lax.axis_index(axis)
    M = microbatches
    conformer = cfg.enc_type == "conformer"
    if conformer:
        x = mask_padding(feats.astype(jnp.float32), feat_lens)
        lens_full = feat_lens
        if cfg.time_reduction > 1:
            x, lens_full = m._time_reduce(x, lens_full, cfg.time_reduction)
        cd = cfg.cdtype
        x = (jnp.dot(x.astype(cd), in_proj["w"].astype(cd),
                     preferred_element_type=jnp.float32)
             + in_proj["b"].astype(jnp.float32))
        Bl, T, dbuf = x.shape
        assert Bl % M == 0, (
            f"local batch {Bl} not divisible by microbatches {M}")
        Bm = Bl // M
        De = dbuf
        mb = x.reshape(M, Bm, T, dbuf)
        mb_lens = lens_full.reshape(M, Bm)
        run = _run_stage_conformer
    else:
        Bl, T, F = feats.shape
        assert Bl % M == 0, (
            f"local batch {Bl} not divisible by microbatches {M}")
        Bm = Bl // M
        lens_full = feat_lens
        De = cfg.enc_out_dim
        dbuf = max(cfg.input_dim, De)
        mb = jnp.pad(feats, ((0, 0), (0, 0), (0, dbuf - F))).reshape(
            M, Bm, T, dbuf)
        mb_lens = feat_lens.reshape(M, Bm)
        run = _run_stage
    # (raw uint32 key arrays have a trailing key-data dim — keep it)
    mb_rngs = (rngs.reshape((M, Bm) + rngs.shape[1:])
               if rngs is not None else None)
    K = M + pp - 1
    perm = [(i, i + 1) for i in range(pp - 1)]

    def step(carry, k):
        recv, acc = carry
        my_idx = jnp.clip(k - s, 0, M - 1)
        x0 = jax.lax.dynamic_index_in_dim(mb, my_idx, 0, keepdims=False)
        x_in = jnp.where(s == 0, x0, recv)
        lens = jax.lax.dynamic_index_in_dim(mb_lens, my_idx, 0,
                                            keepdims=False)
        r = (jax.lax.dynamic_index_in_dim(mb_rngs, my_idx, 0,
                                          keepdims=False)
             if mb_rngs is not None else None)
        y = run(stage_layers, cfg, x_in, lens, stage_idx=s,
                dropout=dropout, rngs=r)  # (Bm, T, De)
        recv_new = jax.lax.ppermute(
            jnp.pad(y, ((0, 0), (0, 0), (0, dbuf - De))), axis, perm)
        out_idx = jnp.clip(k - (pp - 1), 0, M - 1)
        write = (s == pp - 1) & (k - (pp - 1) >= 0)
        old = jax.lax.dynamic_index_in_dim(acc, out_idx, 0, keepdims=False)
        acc = jax.lax.dynamic_update_index_in_dim(
            acc, jnp.where(write, y, old), out_idx, 0)
        return (recv_new, acc), None

    recv0 = jnp.zeros((Bm, T, dbuf), jnp.float32)
    acc0 = jnp.zeros((M, Bm, T, De), jnp.float32)
    (_, acc), _ = jax.lax.scan(step, (recv0, acc0), jnp.arange(K))
    # Only the last stage wrote real values; assemble on every stage.
    enc_out = jax.lax.psum(acc, axis).reshape(Bl, T, De)
    if conformer:  # single-device encode masks the final block output
        enc_out = mask_padding(enc_out, lens_full)
    return enc_out, lens_full


def pp_loss_fn(local: TPParams, cfg: TransducerConfig, feats, feat_lens,
               labels, label_lens, *, pp: int, microbatches: int,
               fastemit: float = 0.0, dropout: float = 0.0,
               embed_dropout: float = 0.0, rngs=None, ctc_weight=0.0):
    enc_out, enc_lens = pp_encode(local.shd["encoder"], cfg, feats,
                                  feat_lens, pp=pp,
                                  microbatches=microbatches,
                                  dropout=dropout, rngs=rngs,
                                  in_proj=local.rep.get("enc_in_proj"))
    rep = local.rep
    pred_out, _ = m.predict(rep, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    if cfg.tdt_durations:
        # duration families: predictor/joint/loss already run replicated
        # on the psum-assembled encoder output, so the consumed-frames
        # grid losses drop in unchanged (loss_fn's xla-tier semantics)
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with TDT "
                             "models")
        from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt
        logits, dur_logits = m.joint_tdt(rep, cfg, enc_out, pred_out)
        per_utt = rnnt_loss_tdt(logits, dur_logits, labels, enc_lens,
                                label_lens, cfg.tdt_durations, cfg.blank)
    elif cfg.big_blank_durations:
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with "
                             "multi-blank models")
        from rnn_transducer_tpu.ops.rnnt_multiblank import \
            rnnt_loss_multiblank
        logits = m.joint(rep, cfg, enc_out, pred_out)
        per_utt = rnnt_loss_multiblank(logits, labels, enc_lens,
                                       label_lens,
                                       cfg.big_blank_durations, cfg.blank)
    else:
        logits = m.joint(rep, cfg, enc_out, pred_out)
        per_utt = rnnt_loss(logits, labels, enc_lens, label_lens,
                            cfg.blank, fastemit)
    per_utt = _with_ctc(per_utt, rep, cfg, enc_out, enc_lens, labels,
                        label_lens, ctc_weight)
    return jnp.mean(per_utt), per_utt


def pp_pruned_loss_fn(local: TPParams, cfg: TransducerConfig, feats,
                      feat_lens, labels, label_lens, *, pp: int,
                      microbatches: int, fastemit: float = 0.0,
                      dropout: float = 0.0, embed_dropout: float = 0.0,
                      rngs=None, ctc_weight=0.0, simple_loss_scale=0.5):
    """k2-style pruned two-pass objective on the GPipe-staged encoder.

    Only the encoder is pipeline-sharded; the two-pass objective (simple
    heads, bounds, band joint, banded recursion) runs replicated on the
    psum-assembled enc_out — the single-device pruned_two_pass_loss
    drops in unchanged (rep carries the replicated "simple" heads).
    """
    from rnn_transducer_tpu.ops.rnnt_pruned import pruned_two_pass_loss

    assert cfg.pruned_range > 0, "pp pruned loss needs cfg.pruned_range"
    enc_out, enc_lens = pp_encode(local.shd["encoder"], cfg, feats,
                                  feat_lens, pp=pp,
                                  microbatches=microbatches,
                                  dropout=dropout, rngs=rngs,
                                  in_proj=local.rep.get("enc_in_proj"))
    rep = local.rep
    pred_out, _ = m.predict(rep, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    f, g, w, b = m.joint_activations(rep, cfg, enc_out, pred_out)
    simple_pu, pruned_pu, _ = pruned_two_pass_loss(
        rep["simple"], f, g, w, b, enc_out, pred_out, labels, enc_lens,
        label_lens, cfg.pruned_range, cfg.blank, cfg.cdtype, fastemit)
    pruned_pu = _with_ctc(pruned_pu, rep, cfg, enc_out, enc_lens, labels,
                          label_lens, ctc_weight)
    total = (jnp.mean(pruned_pu)
             + simple_loss_scale * jnp.mean(simple_pu))
    return total, pruned_pu


def init_pp_train_state(key, cfg: TransducerConfig, tcfg: TrainConfig,
                        pp: int) -> TrainState:
    from rnn_transducer_tpu.parallel.tp import _init_ema
    params = split_params_pp(m.init_params(key, cfg), cfg, pp)
    tx = make_optimizer_noclip(tcfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=_init_ema(params, tcfg))


def pp_ctc_loss_fn(local: TPParams, cfg: TransducerConfig, feats,
                   feat_lens, labels, label_lens, *, pp: int,
                   microbatches: int):
    """CTC pretraining loss through the GPipe-staged encoder (the CTC
    head is replicated)."""
    from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
    enc_out, enc_lens = pp_encode(local.shd["encoder"], cfg, feats,
                                  feat_lens, pp=pp,
                                  microbatches=microbatches,
                                  in_proj=local.rep.get("enc_in_proj"))
    per_utt = ctc_loss_from_logits(
        m.ctc_logits(local.rep, cfg, enc_out), labels, enc_lens,
        label_lens, cfg.blank)
    return jnp.mean(per_utt), per_utt


def make_pp_train_step(cfg: TransducerConfig, tcfg: TrainConfig, mesh: Mesh,
                       microbatches: int | None = None,
                       loss_kind: str = "rnnt"):
    """Jitted update step: pipeline-parallel encoder over "model", data
    parallel over "data". Mirrors tp.make_tp_train_step's semantics
    (incl. loss_kind="ctc" for the pretraining phase)."""
    assert loss_kind in ("rnnt", "ctc"), loss_kind
    if tcfg.grad_accum > 1:
        # same contract as tp.make_tp_train_step: never silently drop it
        raise ValueError("grad_accum > 1 is not supported by the "
                         "model-parallel train steps; grow the data axis, "
                         "the per-shard batch, or --microbatches instead")
    pp = mesh.shape[MODEL_AXIS]
    M = microbatches if microbatches is not None else 2 * pp
    tx = make_optimizer_noclip(tcfg)

    def shard_fn(state, feats, feat_lens, labels, label_lens):
        local = _tp_squeeze(state)

        has_do = tcfg.dropout > 0.0 or tcfg.embed_dropout > 0.0
        do = dict(dropout=tcfg.dropout, embed_dropout=tcfg.embed_dropout,
                  rngs=(dropout_rngs(tcfg, local.step, feats.shape[0])
                        if has_do else None),
                  ctc_weight=tcfg.ctc_weight)

        if loss_kind == "ctc":
            def batch_loss(p):
                return pp_ctc_loss_fn(p, cfg, feats, feat_lens, labels,
                                      label_lens, pp=pp, microbatches=M)
        elif tcfg.loss_impl == "pruned":
            def batch_loss(p):
                return pp_pruned_loss_fn(
                    p, cfg, feats, feat_lens, labels, label_lens, pp=pp,
                    microbatches=M, fastemit=tcfg.fastemit_lambda,
                    simple_loss_scale=tcfg.simple_loss_scale, **do)
        else:
            def batch_loss(p):
                return pp_loss_fn(p, cfg, feats, feat_lens, labels,
                                  label_lens, pp=pp, microbatches=M,
                                  fastemit=tcfg.fastemit_lambda, **do)

        loss_params = local.params
        if tcfg.weight_noise_std > 0.0:
            # Noise on the zero-padded first-layer rows is harmless: those
            # rows multiply zero input dims (forward unchanged) and the
            # clean update keeps the clean rows.
            loss_params = apply_weight_noise(local.params, tcfg, local.step,
                                            model_sharded=True)
        (loss, _), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            loss_params)
        grads = _combine_model_grads(grads, pp)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        gnorm = _tp_global_norm(grads, True)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        scale = jnp.where(ok, jnp.minimum(1.0, tcfg.grad_clip_norm
                                          / jnp.maximum(gnorm, 1e-12)), 0.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, local.opt_state, local.params)
        params = optax.apply_updates(local.params, updates)
        params = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                              params, local.params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(new, "ndim")
            else new, opt_state, local.opt_state)
        ema = local.ema
        if tcfg.ema_decay > 0:
            d = tcfg.ema_decay
            ema = jax.tree.map(
                lambda e, q: jnp.where(ok, d * e + (1.0 - d) * q, e),
                local.ema, params)
        new_state = _tp_expand(TrainState(params=params, opt_state=opt_state,
                                          step=local.step + 1, ema=ema))
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "skipped_nonfinite": (~ok).astype(jnp.int32)}

    state_ex = jax.eval_shape(
        lambda: init_pp_train_state(jax.random.PRNGKey(0), cfg, tcfg, pp))
    state_spec = tp_specs(state_ex)
    batch_spec = P(DATA_AXIS)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec, batch_spec, batch_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
