"""The Transducer model: encoder + prediction network + joint.

Mirrors the reference's public API surface (`model forward` producing joint
logits over the (T, U+1) lattice — SURVEY.md §A) as pure functions over an
explicit parameter pytree. No module framework: plain dict pytrees keep
pjit sharding annotations and Pallas kernel substitution trivial.

Encoder: stacked uni/bi LSTM (optionally with time reduction by frame
stacking after the first layer). Prediction network: embedding + stacked
LSTM over blank-prefixed labels. Joint: additive projection + tanh -> vocab
logits, computed in fp32 for parity (BASELINE.json: "logits ... to fp32
tolerance").
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.ops.lstm import (
    bilstm_layer,
    init_lstm_params,
    lstm_cell,
    lstm_layer,
    mask_padding,
)
from rnn_transducer_tpu.ops.quant import maybe_dequant_tree

Params = dict[str, Any]


def _init_linear(key, in_dim, out_dim, dtype=jnp.float32):
    k = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -k, k),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -k, k),
    }


def init_params(key, cfg: TransducerConfig) -> Params:
    keys = jax.random.split(key, 8)
    # --- encoder ---
    enc = []
    in_dim = cfg.input_dim
    ek = jax.random.split(keys[0], max(cfg.enc_layers * 2, 2))
    if cfg.enc_type == "conformer":
        # frame-stacked input projection + enc_layers conformer blocks
        from rnn_transducer_tpu.ops.conformer import init_conformer_block
        assert not cfg.bidirectional, (
            "enc_type='conformer' is inherently bidirectional; leave "
            "bidirectional=False")
        d = cfg.enc_hidden
        enc.append({"in_proj": _init_linear(
            ek[0], cfg.input_dim * max(cfg.time_reduction, 1), d)})
        bk = jax.random.split(ek[1], cfg.enc_layers)
        for i in range(cfg.enc_layers):
            enc.append(init_conformer_block(bk[i], d, cfg.enc_heads,
                                            cfg.enc_ff_mult,
                                            cfg.enc_conv_kernel))
    elif cfg.bidirectional:
        for i in range(cfg.enc_layers):
            enc.append({
                "fwd": init_lstm_params(ek[2 * i], in_dim, cfg.enc_hidden),
                "bwd": init_lstm_params(ek[2 * i + 1], in_dim, cfg.enc_hidden),
            })
            in_dim = 2 * cfg.enc_hidden
            if i == 0 and cfg.time_reduction > 1:
                in_dim *= cfg.time_reduction
    else:
        for i in range(cfg.enc_layers):
            enc.append(init_lstm_params(ek[2 * i], in_dim, cfg.enc_hidden))
            in_dim = cfg.enc_hidden
            if i == 0 and cfg.time_reduction > 1:
                in_dim *= cfg.time_reduction
    # --- prediction network ---
    embed_scale = 1.0
    embed = jax.random.normal(keys[1], (cfg.vocab_size, cfg.embed_dim)) * embed_scale
    pred = []
    if cfg.pred_type == "stateless":
        # bounded-context decoder (k2-style): one projection of the
        # concatenated window embeddings; decode state = label-id buffer
        pred.append(_init_linear(keys[2], cfg.pred_context * cfg.embed_dim,
                                 cfg.pred_hidden))
    else:
        pk = jax.random.split(keys[2], cfg.pred_layers)
        pin = cfg.embed_dim
        for i in range(cfg.pred_layers):
            pred.append(init_lstm_params(pk[i], pin, cfg.pred_hidden))
            pin = cfg.pred_hidden
    # --- joint ---
    joint = {
        "enc_proj": _init_linear(keys[3], cfg.enc_out_dim, cfg.joint_dim),
        "pred_proj": _init_linear(keys[4], cfg.pred_hidden, cfg.joint_dim),
        "out": _init_linear(keys[5], cfg.joint_dim, cfg.n_classes),
    }
    if cfg.tdt_durations:
        if cfg.big_blank_durations:
            raise ValueError("tdt_durations and big_blank_durations are "
                             "mutually exclusive")
        if cfg.joint_experts > 0:
            raise ValueError("TDT with an MoE joint is not supported")
        # TDT duration head: same joint activation, |durations| logits
        joint["dur"] = _init_linear(jax.random.fold_in(keys[5], 1),
                                    cfg.joint_dim,
                                    len(cfg.tdt_durations))
    params = {"encoder": enc, "embed": embed, "predictor": pred,
              "joint": joint}
    if cfg.ctc_head:
        # Auxiliary CTC projection for encoder pretraining (SURVEY.md §B).
        params["ctc_head"] = _init_linear(keys[6], cfg.enc_out_dim,
                                          cfg.vocab_size)
    if cfg.joint_experts > 0:
        from rnn_transducer_tpu.ops.moe import init_moe_params
        params["moe"] = init_moe_params(keys[7], cfg.joint_experts,
                                        cfg.joint_dim, cfg.moe_hidden)
    if cfg.pruned_range > 0:
        # Trivial-joiner heads of the pruned two-pass loss
        # (ops/rnnt_pruned.py): per-frame and per-label-position V-logit
        # projections whose ADDITIVE combination drives the cheap first
        # pass that picks the pruning band.
        sk = jax.random.split(keys[6], 3)
        params["simple"] = {
            "am": _init_linear(sk[1], cfg.enc_out_dim, cfg.vocab_size),
            "lm": _init_linear(sk[2], cfg.pred_hidden, cfg.vocab_size),
        }
    return params


def _dropout(x, rate: float, rngs, site: int):
    """Inverted dropout with PER-EXAMPLE masks (train-time only).

    rngs: (B,) key array, one key per example (derived from the GLOBAL
    batch position by train.loop.loss_fn) — an example draws the same
    mask whether the batch runs on one device or sharded under DP, so
    data-parallel training stays bitwise in lockstep with single-device.
    `site` separates the mask streams of different dropout sites.
    """
    keep = 1.0 - rate
    mask = jax.vmap(
        lambda k: jax.random.bernoulli(jax.random.fold_in(k, site), keep,
                                       x.shape[1:]))(rngs)
    return jnp.where(mask, x / keep, 0.0)


def _time_reduce(x, lens, factor: int):
    """Stack `factor` consecutive frames: (B, T, F) -> (B, T//factor, F*factor)."""
    B, T, F = x.shape
    T2 = T // factor
    x = x[:, : T2 * factor, :].reshape(B, T2, F * factor)
    lens = jnp.minimum((lens.astype(jnp.int32) + factor - 1) // factor, T2)
    return x, lens


def encode(params: Params, cfg: TransducerConfig, feats, feat_lens, *,
           dropout: float = 0.0, rng=None):
    """feats: (B, T, input_dim) -> (enc_out (B, T', enc_out_dim), enc_lens).

    dropout (train-time, rng required): inter-layer dropout on every LSTM
    layer's output except the last — the stacked-nn.LSTM(dropout=...)
    semantics of the reference family (SURVEY.md §B).
    """
    # int8 serving params (ops/quant.py): w_hh stays QUANTIZED so the
    # fused Pallas LSTM can run its int8 recurrent kernel; ops/lstm.py
    # dequantizes it at use everywhere else.
    params = maybe_dequant_tree(params, keep=("w_hh",))
    x = mask_padding(feats.astype(jnp.float32), feat_lens)
    lens = feat_lens
    cd = cfg.cdtype

    if cfg.enc_type == "conformer":
        from rnn_transducer_tpu.ops.conformer import conformer_block
        # frame stacking happens at the INPUT (conv-subsampling role),
        # then one projection to d_model and enc_layers blocks
        if cfg.time_reduction > 1:
            x, lens = _time_reduce(x, lens, cfg.time_reduction)
        proj = params["encoder"][0]["in_proj"]
        x = (jnp.dot(x.astype(cd), proj["w"].astype(cd),
                     preferred_element_type=jnp.float32)
             + proj["b"].astype(jnp.float32))
        blk = lambda p, x: conformer_block(p, x, lens, cfg.enc_heads, cd,
                                           att_left=cfg.enc_att_left,
                                           chunk_att=cfg.enc_chunk_att)
        if cfg.remat_encoder:
            blk = jax.checkpoint(blk)
        n = cfg.enc_layers
        for i, block in enumerate(params["encoder"][1:]):
            x = blk(block, x)
            if dropout > 0.0 and rng is not None and i < n - 1:
                x = _dropout(x, dropout, rng, site=i)
        return mask_padding(x, lens), lens

    def run_layer(layer, x, lens):
        if cfg.bidirectional:
            return bilstm_layer(layer["fwd"], layer["bwd"], x, lens,
                                compute_dtype=cd)
        return lstm_layer(layer, x, compute_dtype=cd)[0]

    if cfg.remat_encoder:
        run_layer = jax.checkpoint(run_layer)
    n = len(params["encoder"])
    for i, layer in enumerate(params["encoder"]):
        x = run_layer(layer, x, lens)
        # No inter-layer mask_padding: pad-region values are garbage but
        # stay in the pad region — the time recurrence only moves t
        # forward, reverse_padded never reads pads into valid positions,
        # and pad-position cotangents are zero, so dW is untouched.
        # Masking IS required before frame stacking (a stacked frame can
        # straddle the valid/pad boundary) and on the final output
        # (downstream contract: zeros past enc_lens). Dropping the
        # intermediate masks removes one full activation-sized select
        # pass per layer (~0.7 ms/layer on the 6x1024 config).
        if dropout > 0.0 and rng is not None and i < n - 1:
            x = _dropout(x, dropout, rng, site=i)
        if i == 0 and cfg.time_reduction > 1:
            x = mask_padding(x, lens)
            x, lens = _time_reduce(x, lens, cfg.time_reduction)
    return mask_padding(x, lens), lens


def init_enc_state(cfg: TransducerConfig, batch: int):
    """Streaming encoder carry: per-layer (h, c) for the unidirectional
    LSTM, or per-block attention/conv caches + a consumed-frame counter
    for the causal conformer (cfg.enc_att_left > 0)."""
    if cfg.enc_type == "conformer":
        from rnn_transducer_tpu.ops.conformer import init_block_cache
        assert cfg.enc_att_left > 0 or cfg.enc_chunk_att > 0, (
            "streaming a conformer requires enc_att_left > 0 (causal/"
            "windowed) or enc_chunk_att > 0 (chunked lookahead); full "
            "attention needs the whole utterance")
        return {"n_seen": jnp.zeros((batch,), jnp.int32),
                "blocks": [init_block_cache(batch, cfg.enc_hidden,
                                            cfg.enc_att_left,
                                            cfg.enc_conv_kernel)
                           for _ in range(cfg.enc_layers)]}
    assert not cfg.bidirectional, "streaming requires a unidirectional encoder"
    return [
        (jnp.zeros((batch, cfg.enc_hidden), jnp.float32),
         jnp.zeros((batch, cfg.enc_hidden), jnp.float32))
        for _ in range(cfg.enc_layers)
    ]


def encode_chunk(params: Params, cfg: TransducerConfig, feats, chunk_lens,
                 enc_state):
    """Streaming encoder step: one chunk of frames with carried LSTM state.

    feats: (B, C, input_dim) with C % time_reduction == 0. Only the final
    chunk of an utterance may be partially valid (chunk_lens < C): LSTM
    state past chunk_lens is garbage, which is harmless once the stream
    ends there. Returns (enc_out (B, C', De), enc_lens', new_enc_state).
    """
    params = maybe_dequant_tree(params, keep=("w_hh",))  # see encode()
    C = feats.shape[1]
    if cfg.time_reduction > 1:
        assert C % cfg.time_reduction == 0, (
            f"chunk frames {C} must be divisible by time_reduction "
            f"{cfg.time_reduction}")
    x = mask_padding(feats.astype(jnp.float32), chunk_lens)
    lens = chunk_lens
    cd = cfg.cdtype
    if cfg.enc_type == "conformer":
        from rnn_transducer_tpu.ops.conformer import conformer_block_chunk
        assert cfg.enc_att_left > 0 or cfg.enc_chunk_att > 0, (
            "streaming a conformer requires enc_att_left > 0 or "
            "enc_chunk_att > 0")
        if cfg.time_reduction > 1:
            x, lens = _time_reduce(x, lens, cfg.time_reduction)
        if cfg.enc_chunk_att > 0:
            assert x.shape[1] % cfg.enc_chunk_att == 0, (
                f"chunked attention: encoded chunk {x.shape[1]} must be a "
                f"multiple of enc_chunk_att {cfg.enc_chunk_att} (chunk "
                "starts must align across streaming and offline)")
        proj = params["encoder"][0]["in_proj"]
        x = (jnp.dot(x.astype(cd), proj["w"].astype(cd),
                     preferred_element_type=jnp.float32)
             + proj["b"].astype(jnp.float32))
        n_seen = enc_state["n_seen"]
        new_blocks = []
        for block, cache in zip(params["encoder"][1:],
                                enc_state["blocks"]):
            x, new_cache = conformer_block_chunk(
                block, x, cache, n_seen, lens, cfg.enc_heads, cd,
                cfg.enc_att_left, chunk_att=cfg.enc_chunk_att)
            new_blocks.append(new_cache)
        new_state = {"n_seen": n_seen + lens.astype(jnp.int32),
                     "blocks": new_blocks}
        return mask_padding(x, lens), lens, new_state
    assert not cfg.bidirectional, "streaming requires a unidirectional encoder"
    new_state = []
    for i, (layer, (h0, c0)) in enumerate(
            zip(params["encoder"], enc_state)):
        x, (h, c) = lstm_layer(layer, x, h0, c0, compute_dtype=cfg.cdtype)
        new_state.append((h, c))
        x = mask_padding(x, lens)
        if i == 0 and cfg.time_reduction > 1:
            x, lens = _time_reduce(x, lens, cfg.time_reduction)
    return x, lens, new_state


def predict(params: Params, cfg: TransducerConfig, labels, *,
            dropout: float = 0.0, embed_dropout: float = 0.0, rng=None):
    """Prediction network over blank-prefixed labels.

    labels: (B, U) -> outputs (B, U+1, pred_hidden): position u conditions on
    labels[:u] (u=0 is the start symbol = blank embedding).
    Returns (outputs, final_states) where final_states is a list of (h, c)
    per layer (used by streaming/step-wise decoding).
    dropout/embed_dropout (train-time, rng required): inter-layer dropout
    between prediction LSTMs and dropout on the label embeddings.
    """
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    B, U = labels.shape
    bos = jnp.full((B, 1), cfg.blank, labels.dtype)
    inp = jnp.concatenate([bos, labels], axis=1)  # (B, U+1)
    x = params["embed"][inp]  # (B, U+1, E)
    if embed_dropout > 0.0 and rng is not None:
        x = _dropout(x, embed_dropout, rng, site=1000)
    if cfg.pred_type == "stateless":
        # window of the last pred_context inputs per position (blank-
        # padded before the start), projected in one matmul
        C = cfg.pred_context
        pad = params["embed"][jnp.full((B, C - 1), cfg.blank,
                                       jnp.int32)]
        xp = jnp.concatenate([pad, x], axis=1)  # (B, U+C, E)
        win = jnp.concatenate(
            [xp[:, c: c + U + 1] for c in range(C)], axis=-1)
        layer = params["predictor"][0]
        out = (jnp.dot(win.astype(cfg.cdtype),
                       layer["w"].astype(cfg.cdtype),
                       preferred_element_type=jnp.float32)
               + layer["b"].astype(jnp.float32))
        # final decode state: ids of the C-1 most recent inputs
        ids = jnp.concatenate(
            [jnp.full((B, C - 1), cfg.blank, jnp.int32),
             inp.astype(jnp.int32)], axis=1)[:, -(C - 1):] if C > 1 else \
            jnp.zeros((B, 0), jnp.int32)
        return out, ids
    states = []
    n = len(params["predictor"])
    for i, layer in enumerate(params["predictor"]):
        x, st = lstm_layer(layer, x, compute_dtype=cfg.cdtype)
        if dropout > 0.0 and rng is not None and i < n - 1:
            x = _dropout(x, dropout, rng, site=1001 + i)
        states.append(st)
    return x, states


def predict_step(params: Params, cfg: TransducerConfig, label, states):
    """Single step of the prediction network (for decoding).

    label: (B,) int32 (the last emitted label; blank id = start symbol).
    states: list per layer of (h, c) each (B, H) — or, for
    pred_type="stateless", the (B, pred_context - 1) int32 buffer of the
    most recent consumed label ids. Returns (out (B, H), states').
    """
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    if cfg.pred_type == "stateless":
        C = cfg.pred_context
        win = jnp.concatenate(
            [states.astype(jnp.int32), label.astype(jnp.int32)[:, None]],
            axis=1)  # (B, C)
        x = params["embed"][win].reshape(label.shape[0],
                                         C * cfg.embed_dim)
        layer = params["predictor"][0]
        out = (jnp.dot(x.astype(cfg.cdtype), layer["w"].astype(cfg.cdtype),
                       preferred_element_type=jnp.float32)
               + layer["b"].astype(jnp.float32))
        return out, win[:, 1:]
    x = params["embed"][label]  # (B, E)
    new_states = []
    for layer, (h, c) in zip(params["predictor"], states):
        x_proj = (
            jnp.dot(x.astype(cfg.cdtype), layer["w_ih"].astype(cfg.cdtype),
                    preferred_element_type=jnp.float32)
            + layer["b"].astype(jnp.float32)
        )
        h, c = lstm_cell(layer, x_proj, h, c, cfg.cdtype)
        new_states.append((h, c))
        x = h
    return x, new_states


def init_pred_state(cfg: TransducerConfig, batch: int):
    if cfg.pred_type == "stateless":
        return jnp.full((batch, cfg.pred_context - 1), cfg.blank,
                        jnp.int32)
    return [
        (jnp.zeros((batch, cfg.pred_hidden), jnp.float32),
         jnp.zeros((batch, cfg.pred_hidden), jnp.float32))
        for _ in range(cfg.pred_layers)
    ]


def _moe_residual(params: Params, cfg: TransducerConfig, z,
                  dense: bool = False):
    """Residual top-1 MoE on joint activations z (..., J). Returns
    (z', aux). The lattice (training) path routes through the static
    capacity buffer; decode steps (tiny token counts) use the dense
    formulation, which never drops a token."""
    from rnn_transducer_tpu.ops.moe import moe_dense, moe_top1
    shape = z.shape
    flat = z.reshape(-1, shape[-1])
    if dense:
        y, aux = moe_dense(params["moe"], flat, compute_dtype=cfg.cdtype)
    else:
        y, aux = moe_top1(params["moe"], flat,
                          capacity_factor=cfg.moe_capacity_factor,
                          compute_dtype=cfg.cdtype)
    return z + y.reshape(shape), aux


def joint(params: Params, cfg: TransducerConfig, enc_out, pred_out,
          with_aux: bool = False):
    """Joint network: broadcast-add over the (T, U+1) lattice -> fp32 logits.

    enc_out: (B, T, De), pred_out: (B, U+1, Dp) -> logits (B, T, U+1, V).
    The two input projections are computed once per side (O(T)+O(U) matmuls);
    only the cheap broadcast add + tanh + output matmul runs on the full
    lattice. fp32 logits for parity. With cfg.joint_experts > 0 a residual
    top-1 MoE FFN (ops/moe.py) runs on the lattice activations;
    `with_aux=True` also returns its load-balance loss.
    """
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_out.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))  # (B, T, J)
    g = (jnp.dot(pred_out.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))  # (B, U1, J)
    z = jnp.tanh(f[:, :, None, :] + g[:, None, :, :])  # (B, T, U1, J)
    aux = jnp.zeros((), jnp.float32)
    if cfg.joint_experts > 0:
        z, aux = _moe_residual(params, cfg, z)
    logits = (jnp.dot(z.astype(cd), jp["out"]["w"].astype(cd),
                      preferred_element_type=jnp.float32)
              + jp["out"]["b"].astype(jnp.float32))
    return (logits, aux) if with_aux else logits  # fp32 (B, T, U1, V)


def joint_step(params: Params, cfg: TransducerConfig, enc_t, pred_u):
    """Joint for single (t, u) positions: enc_t (B, De), pred_u (B, Dp) -> (B, V)."""
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_t.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))
    g = (jnp.dot(pred_u.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))
    z = jnp.tanh(f + g)
    if cfg.joint_experts > 0:
        z, _ = _moe_residual(params, cfg, z, dense=True)
    return (jnp.dot(z.astype(cd), jp["out"]["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + jp["out"]["b"].astype(jnp.float32))


def joint_tdt(params: Params, cfg: TransducerConfig, enc_out, pred_out):
    """TDT joint: token logits + duration logits off one shared activation.

    enc_out: (B, T, De), pred_out: (B, U+1, Dp) ->
    (logits (B, T, U+1, V), dur_logits (B, T, U+1, D)), both fp32.
    """
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_out.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))
    g = (jnp.dot(pred_out.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))
    z = jnp.tanh(f[:, :, None, :] + g[:, None, :, :])
    logits = (jnp.dot(z.astype(cd), jp["out"]["w"].astype(cd),
                      preferred_element_type=jnp.float32)
              + jp["out"]["b"].astype(jnp.float32))
    dur = (jnp.dot(z.astype(cd), jp["dur"]["w"].astype(cd),
                   preferred_element_type=jnp.float32)
           + jp["dur"]["b"].astype(jnp.float32))
    return logits, dur


def joint_step_tdt(params: Params, cfg: TransducerConfig, enc_t, pred_u):
    """TDT joint for single positions: (B, De), (B, Dp) ->
    (logits (B, V), dur_logits (B, D))."""
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_t.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))
    g = (jnp.dot(pred_u.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))
    z = jnp.tanh(f + g)
    logits = (jnp.dot(z.astype(cd), jp["out"]["w"].astype(cd),
                      preferred_element_type=jnp.float32)
              + jp["out"]["b"].astype(jnp.float32))
    dur = (jnp.dot(z.astype(cd), jp["dur"]["w"].astype(cd),
                   preferred_element_type=jnp.float32)
           + jp["dur"]["b"].astype(jnp.float32))
    return logits, dur


def joint_activations(params: Params, cfg: TransducerConfig, enc_out,
                      pred_out):
    """Per-side joint activations for the fused joint+loss op.

    f = enc_proj(enc_out) + b, g = pred_proj(pred_out) + b: everything the
    fused Pallas kernel needs to build logits tiles on-chip.
    """
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_out.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))
    g = (jnp.dot(pred_out.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))
    return f, g, jp["out"]["w"], jp["out"]["b"]


def ctc_logits(params: Params, cfg: TransducerConfig, enc_out):
    """CTC head: encoder output -> (B, T', V) logits (fp32)."""
    params = maybe_dequant_tree(params)  # int8 serving params (ops/quant.py)
    head = params["ctc_head"]
    cd = cfg.cdtype
    return (jnp.dot(enc_out.astype(cd), head["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + head["b"].astype(jnp.float32))


def forward(params: Params, cfg: TransducerConfig, feats, feat_lens, labels,
            with_aux: bool = False, dropout: float = 0.0,
            embed_dropout: float = 0.0, rng=None):
    """Full model forward: features + labels -> joint logits over the lattice.

    Mirrors the reference `Transducer.forward` API (SURVEY.md §3).
    Returns (logits (B, T', U+1, V), enc_lens (B,)); with_aux=True returns
    ((logits, moe_aux), enc_lens) for MoE configs. dropout/embed_dropout
    apply only when an rng is passed (training).
    """
    enc_out, enc_lens = encode(params, cfg, feats, feat_lens,
                               dropout=dropout, rng=rng)
    pred_out, _ = predict(params, cfg, labels, dropout=dropout,
                          embed_dropout=embed_dropout, rng=rng)
    return joint(params, cfg, enc_out, pred_out, with_aux=with_aux), enc_lens
