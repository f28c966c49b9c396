"""Tensor- and sequence-parallel model execution over a (data, model) mesh.

The reference is a single-device script (SURVEY.md §B); model parallelism is
native to this rebuild. Two model-axis strategies, composable with data
parallelism on a 2-D mesh:

  * **Tensor parallel ("tp")** — Megatron-style weight sharding:
      - every LSTM layer's gate/hidden dimension is column-sharded
        gate-wise: shard k owns rows [k·H/mp, (k+1)·H/mp) of h and the
        matching columns of each of the 4 gate blocks of W_ih/W_hh/b.
        The recurrence needs the full h(t) each step, so the scan body
        all-gathers the (B, H/mp) local hidden over the model axis — a
        tiny ICI transfer next to the (B, H) x (H, 4H/mp) matmul it feeds;
      - the joint output projection is vocab-column-sharded with a
        vocab-parallel log-softmax (pmax/psum for the denominator, a
        masked gather + psum for the blank/label scores), so the O(T·U·V)
        lattice work — the dominant cost — splits over the model axis and
        the full (B,T,U+1,V) logits never exist on any one chip;
      - the tiny (B,T,U+1) score tensors feed the replicated lattice
        recursion through ops.rnnt_loss.rnnt_loss_from_lp (custom VJP).

  * **Sequence parallel ("sp")** — weights replicated, the encoder-frame
    axis of the joint+loss lattice sharded: each shard builds logits and
    extracts blank/label scores for its T/mp frames only (full vocab
    locally), then the (B,T,U+1) scores are all-gathered for the
    replicated recursion. Shards the dominant lattice cost with zero
    weight-layout changes; the encoder itself runs replicated.

Gradient combine rules over the model axis (each shard computes the same
replicated loss, so autodiff's per-shard grads are mp x the true partials):
replicated leaves -> pmean over "model"; sharded leaves -> divide by mp.
Data-parallel combine is the usual pmean over "data" afterwards.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import GetAttrKey

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.lstm import mask_padding, reverse_padded
from rnn_transducer_tpu.ops.rnnt_loss import (
    NEG_INF,
    _gather_label_logprobs,
    rnnt_loss_from_lp,
)
from rnn_transducer_tpu.train.loop import TrainState, make_lr_schedule

MODEL_AXIS = "model"
DATA_AXIS = "data"
_PAD_BIAS = -1.0e9  # bias for padded vocab columns: exp() underflows to 0


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                (DATA_AXIS, MODEL_AXIS))


# --------------------------------------------------------------------------
# Parameter layout: TPParams = replicated subtree + stacked sharded subtree
# --------------------------------------------------------------------------

@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("rep", "shd"),
    meta_fields=(),
)
@dataclasses.dataclass
class TPParams:
    """rep: replicated leaves; shd: leaves stacked with a leading mp axis
    (sharded over the model axis by shard_map, so each device sees its
    slice with leading dim 1)."""

    rep: Any
    shd: Any


def _stack_gate_cols(w, mp: int):
    """(I, 4H) gate-major (i,f,g,o) -> (mp, I, 4*(H/mp)): shard k holds,
    for each gate, columns [k*H/mp, (k+1)*H/mp)."""
    I, four_h = w.shape
    H = four_h // 4
    assert H % mp == 0, f"hidden {H} not divisible by model parallel {mp}"
    Hl = H // mp
    w4 = w.reshape(I, 4, mp, Hl)
    return jnp.moveaxis(w4, 2, 0).reshape(mp, I, 4 * Hl)


def _merge_gate_cols(ws):
    """(mp, I, 4Hl) -> (I, 4H), inverse of _stack_gate_cols."""
    mp, I, four_hl = ws.shape
    Hl = four_hl // 4
    w = jnp.moveaxis(ws.reshape(mp, I, 4, Hl), 0, 2)  # (I, 4, mp, Hl)
    return w.reshape(I, 4 * mp * Hl)


def _shard_lstm(p, mp: int):
    return {
        "w_ih": _stack_gate_cols(p["w_ih"], mp),
        "w_hh": _stack_gate_cols(p["w_hh"], mp),
        "b": _stack_gate_cols(p["b"][None, :], mp)[:, 0, :],
    }


def _merge_lstm(p):
    return {
        "w_ih": _merge_gate_cols(p["w_ih"]),
        "w_hh": _merge_gate_cols(p["w_hh"]),
        "b": _merge_gate_cols(p["b"][:, None, :])[0],
    }


def _shard_vocab_out(out, mp: int, vocab: int):
    """Joint out projection (J, V) column-sharded over vocab, padded so
    V is divisible by mp; padded bias columns get _PAD_BIAS so the
    vocab-parallel softmax ignores them."""
    w, b = out["w"], out["b"]
    J, V = w.shape
    Vp = -(-V // mp) * mp
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
        b = jnp.pad(b, (0, Vp - V), constant_values=_PAD_BIAS)
    Vl = Vp // mp
    return {
        "w": jnp.moveaxis(w.reshape(J, mp, Vl), 1, 0),  # (mp, J, Vl)
        "b": b.reshape(mp, Vl),
    }


def _merge_vocab_out(out, vocab: int):
    w, b = out["w"], out["b"]  # (mp, J, Vl), (mp, Vl)
    mp, J, Vl = w.shape
    w = jnp.moveaxis(w, 0, 1).reshape(J, mp * Vl)[:, :vocab]
    return {"w": w, "b": b.reshape(mp * Vl)[:vocab]}


def split_params_tp(params, cfg: TransducerConfig, mp: int) -> TPParams:
    """Full parameter pytree -> TPParams with stacked model shards."""

    def shard_enc_layer(layer):
        if cfg.bidirectional:
            return {"fwd": _shard_lstm(layer["fwd"], mp),
                    "bwd": _shard_lstm(layer["bwd"], mp)}
        return _shard_lstm(layer, mp)

    stateless = cfg.pred_type == "stateless"
    conformer = cfg.enc_type == "conformer"
    if conformer:
        assert cfg.enc_heads % mp == 0 and cfg.enc_hidden % mp == 0, (
            f"conformer tp needs heads {cfg.enc_heads} and d_model "
            f"{cfg.enc_hidden} divisible by mp {mp}")
        blocks = [split_conformer_block_tp(b, mp)
                  for b in params["encoder"][1:]]
        enc_shd = [b[0] for b in blocks]
        enc_rep = [b[1] for b in blocks]
    else:
        enc_shd = [shard_enc_layer(l) for l in params["encoder"]]
        enc_rep = None
    shd = {
        "encoder": enc_shd,
        # n_classes, not vocab_size: multi-blank models append one output
        # column per big-blank duration and the softmax runs over all of
        # them (the padded columns get _PAD_BIAS either way).
        "joint_out": _shard_vocab_out(params["joint"]["out"], mp,
                                      cfg.n_classes),
    }
    rep = {
        "embed": params["embed"],
        "joint": {"enc_proj": params["joint"]["enc_proj"],
                  "pred_proj": params["joint"]["pred_proj"]},
    }
    if "dur" in params["joint"]:
        # TDT duration head: tiny (J, D) projection off the replicated
        # joint activation — replicate it (grad pmean over "model").
        rep["joint"]["dur"] = params["joint"]["dur"]
    if "simple" in params:
        # pruned two-pass trivial-joiner heads: cheap (D, V) projections;
        # the first pass runs replicated (tp_pruned_loss_fn).
        rep["simple"] = params["simple"]
    if stateless:
        # the stateless decoder is one small linear — no LSTM gates to
        # shard; replicate it (grad pmean over the model axis)
        rep["predictor"] = params["predictor"]
    else:
        shd["predictor"] = [_shard_lstm(l, mp) for l in params["predictor"]]
    if conformer:
        rep["enc_in_proj"] = params["encoder"][0]["in_proj"]
        rep["enc_blocks"] = enc_rep
    if "ctc_head" in params:
        rep["ctc_head"] = params["ctc_head"]
    return TPParams(rep=rep, shd=shd)


def merge_params_tp(tp: TPParams, cfg: TransducerConfig) -> dict:
    """TPParams -> full parameter pytree (for eval/decode/checkpoints)."""

    def merge_enc_layer(layer):
        if cfg.bidirectional:
            return {"fwd": _merge_lstm(layer["fwd"]),
                    "bwd": _merge_lstm(layer["bwd"])}
        return _merge_lstm(layer)

    if "enc_in_proj" in tp.rep:  # conformer encoder
        encoder = [{"in_proj": tp.rep["enc_in_proj"]}] + [
            merge_conformer_block_tp(s_, r_)
            for s_, r_ in zip(tp.shd["encoder"], tp.rep["enc_blocks"])]
    else:
        encoder = [merge_enc_layer(l) for l in tp.shd["encoder"]]
    params = {
        "encoder": encoder,
        "embed": tp.rep["embed"],
        "predictor": (tp.rep["predictor"] if "predictor" in tp.rep
                      else [_merge_lstm(l) for l in tp.shd["predictor"]]),
        "joint": {
            "enc_proj": tp.rep["joint"]["enc_proj"],
            "pred_proj": tp.rep["joint"]["pred_proj"],
            "out": _merge_vocab_out(tp.shd["joint_out"], cfg.n_classes),
        },
    }
    if "dur" in tp.rep["joint"]:
        params["joint"]["dur"] = tp.rep["joint"]["dur"]
    if "simple" in tp.rep:
        params["simple"] = tp.rep["simple"]
    if "ctc_head" in tp.rep:
        params["ctc_head"] = tp.rep["ctc_head"]
    return params


def _path_has_shd(path) -> bool:
    return any(isinstance(e, GetAttrKey) and e.name == "shd" for e in path)


def tp_specs(tree):
    """PartitionSpec pytree: leaves under a TPParams.shd field are stacked
    over the model axis; everything else is replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: P(MODEL_AXIS) if _path_has_shd(path) else P(), tree)


def _tp_squeeze(tree):
    """Drop the local leading shard dim (1, ...) -> (...) on shd leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: x[0] if _path_has_shd(path) else x, tree)


def _tp_expand(tree):
    """Re-add the local leading shard dim on shd leaves."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: x[None] if _path_has_shd(path) else x, tree)


def _local_view(tp_local: TPParams) -> dict:
    """Per-shard parameter dict in the regular `params` layout (sharded
    leaves hold this shard's slice)."""
    if "enc_in_proj" in tp_local.rep:  # conformer: pair shd/rep pieces
        encoder = [{"in_proj": tp_local.rep["enc_in_proj"]}] + [
            {"shd": s_, "rep": r_}
            for s_, r_ in zip(tp_local.shd["encoder"],
                              tp_local.rep["enc_blocks"])]
    else:
        encoder = tp_local.shd["encoder"]
    params = {
        "encoder": encoder,
        "embed": tp_local.rep["embed"],
        "predictor": (tp_local.rep["predictor"]
                      if "predictor" in tp_local.rep
                      else tp_local.shd["predictor"]),
        "joint": {
            "enc_proj": tp_local.rep["joint"]["enc_proj"],
            "pred_proj": tp_local.rep["joint"]["pred_proj"],
            "out": tp_local.shd["joint_out"],
        },
    }
    if "dur" in tp_local.rep["joint"]:
        params["joint"]["dur"] = tp_local.rep["joint"]["dur"]
    if "simple" in tp_local.rep:
        params["simple"] = tp_local.rep["simple"]
    if "ctc_head" in tp_local.rep:
        params["ctc_head"] = tp_local.rep["ctc_head"]
    return params


def _with_ctc(per_utt, params, cfg, enc_out, enc_lens, labels,
              label_lens, ctc_weight):
    """Add the joint-CTC multitask term (train.loop loss_fn semantics)
    on the replicated encoder output — the CTC head is replicated over
    the model axis, so every shard adds an identical term."""
    if not ctc_weight:
        return per_utt
    from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
    ctc_pu = ctc_loss_from_logits(
        m.ctc_logits(params, cfg, enc_out), labels, enc_lens, label_lens,
        cfg.blank)
    return per_utt + ctc_weight * ctc_pu



# --------------------------------------------------------------------------
# Tensor-parallel conformer encoder (Megatron-style block sharding)
# --------------------------------------------------------------------------
#
# Per block: FFN first linears column-shard and second linears row-shard
# (one psum each); attention shards HEADS (q/k/v column slices are
# head-contiguous, the relative-position bias shards its head axis, the
# output projection row-shards + psum); the conv module runs GLU +
# depthwise on its channel slice, all-gathers channels for the full-d
# LayerNorm, then row-shards the output pointwise (+psum). LayerNorms
# and the row-sharded output BIASES stay replicated (a psum would add
# them mp times). Activations are replicated between ops — the standard
# 2-collectives-per-sublayer tensor-parallel pattern riding ICI.

def _split_cols(p, mp: int):
    """{"w" (din, dout), "b" (dout,)} -> leading-mp column shards."""
    din, dout = p["w"].shape
    w = p["w"].reshape(din, mp, dout // mp)
    return {"w": jnp.moveaxis(w, 1, 0), "b": p["b"].reshape(mp, -1)}


def _merge_cols(p):
    w = jnp.concatenate(list(p["w"]), axis=-1)
    return {"w": w, "b": p["b"].reshape(-1)}


def _split_rows(w, mp: int):
    din, dout = w.shape
    return w.reshape(mp, din // mp, dout)


def _merge_rows(w):
    return w.reshape(-1, w.shape[-1])


def _split_glu_cols(p, mp: int):
    """conv pw1 (d, 2d): shard the two GLU halves identically so each
    shard's halves pair up."""
    din, d2 = p["w"].shape
    d = d2 // 2
    wa = p["w"][:, :d].reshape(din, mp, d // mp)
    wb = p["w"][:, d:].reshape(din, mp, d // mp)
    w = jnp.concatenate([jnp.moveaxis(wa, 1, 0), jnp.moveaxis(wb, 1, 0)],
                        axis=-1)  # (mp, din, 2*d/mp)
    ba = p["b"][:d].reshape(mp, -1)
    bb = p["b"][d:].reshape(mp, -1)
    return {"w": w, "b": jnp.concatenate([ba, bb], axis=-1)}


def _merge_glu_cols(p):
    mp, din, dl2 = p["w"].shape
    dl = dl2 // 2
    wa = jnp.concatenate([p["w"][c, :, :dl] for c in range(mp)], axis=-1)
    wb = jnp.concatenate([p["w"][c, :, dl:] for c in range(mp)], axis=-1)
    ba = jnp.concatenate([p["b"][c, :dl] for c in range(mp)])
    bb = jnp.concatenate([p["b"][c, dl:] for c in range(mp)])
    return {"w": jnp.concatenate([wa, wb], axis=-1),
            "b": jnp.concatenate([ba, bb])}


def split_conformer_block_tp(blk, mp: int):
    """One ops/conformer.py block -> (sharded piece, replicated piece)."""
    shd = {
        "ff1_in": _split_cols(blk["ff1"]["in"], mp),
        "ff1_out_w": _split_rows(blk["ff1"]["out"]["w"], mp),
        "ff2_in": _split_cols(blk["ff2"]["in"], mp),
        "ff2_out_w": _split_rows(blk["ff2"]["out"]["w"], mp),
        "att_q": _split_cols(blk["att"]["q"], mp),
        "att_k": _split_cols(blk["att"]["k"], mp),
        "att_v": _split_cols(blk["att"]["v"], mp),
        "att_rel": blk["att"]["rel"].reshape(
            mp, -1, blk["att"]["rel"].shape[-1]),
        "att_o_w": _split_rows(blk["att"]["o"]["w"], mp),
        "conv_pw1": _split_glu_cols(blk["conv"]["pw1"], mp),
        "conv_dw_w": jnp.moveaxis(
            blk["conv"]["dw_w"].reshape(blk["conv"]["dw_w"].shape[0], mp,
                                        -1), 1, 0),
        "conv_dw_b": blk["conv"]["dw_b"].reshape(mp, -1),
        "conv_pw2_w": _split_rows(blk["conv"]["pw2"]["w"], mp),
    }
    rep = {
        "ln_ff1": blk["ln_ff1"], "ln_att": blk["ln_att"],
        "ln_conv": blk["ln_conv"], "ln_ff2": blk["ln_ff2"],
        "ln_out": blk["ln_out"], "conv_ln": blk["conv"]["ln"],
        "ff1_out_b": blk["ff1"]["out"]["b"],
        "ff2_out_b": blk["ff2"]["out"]["b"],
        "att_o_b": blk["att"]["o"]["b"],
        "conv_pw2_b": blk["conv"]["pw2"]["b"],
    }
    return shd, rep


def merge_conformer_block_tp(shd, rep):
    """Inverse of split_conformer_block_tp (stacked leading-mp leaves)."""
    return {
        "ln_ff1": rep["ln_ff1"], "ln_att": rep["ln_att"],
        "ln_conv": rep["ln_conv"], "ln_ff2": rep["ln_ff2"],
        "ln_out": rep["ln_out"],
        "ff1": {"in": _merge_cols(shd["ff1_in"]),
                "out": {"w": _merge_rows(shd["ff1_out_w"]),
                        "b": rep["ff1_out_b"]}},
        "ff2": {"in": _merge_cols(shd["ff2_in"]),
                "out": {"w": _merge_rows(shd["ff2_out_w"]),
                        "b": rep["ff2_out_b"]}},
        "att": {"q": _merge_cols(shd["att_q"]),
                "k": _merge_cols(shd["att_k"]),
                "v": _merge_cols(shd["att_v"]),
                "rel": shd["att_rel"].reshape(
                    -1, shd["att_rel"].shape[-1]),
                "o": {"w": _merge_rows(shd["att_o_w"]),
                      "b": rep["att_o_b"]}},
        "conv": {"pw1": _merge_glu_cols(shd["conv_pw1"]),
                 "dw_w": jnp.concatenate(list(shd["conv_dw_w"]), axis=-1),
                 "dw_b": shd["conv_dw_b"].reshape(-1),
                 "ln": rep["conv_ln"],
                 "pw2": {"w": _merge_rows(shd["conv_pw2_w"]),
                         "b": rep["conv_pw2_b"]}},
    }


def _tp_dense(p, x, cd):
    return (jnp.dot(x.astype(cd), p["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + p["b"].astype(jnp.float32))


def tp_conformer_block(shd, rep, x, lens, cfg, *, axis=MODEL_AXIS):
    """One tensor-parallel conformer block on replicated activations
    (mirrors ops/conformer.py conformer_block op for op)."""
    import math as _math

    from rnn_transducer_tpu.ops.conformer import (NEG_INF as ANEG,
                                                  REL_CLIP, _ln)
    from rnn_transducer_tpu.ops.lstm import mask_padding as _mask

    cd = cfg.cdtype
    B, T, D = x.shape
    att_left = cfg.enc_att_left
    psum = lambda a: jax.lax.psum(a, axis)

    def ffn(ln_p, inp, out_w, out_b, xin):
        h = _ln(ln_p, xin)
        h = jax.nn.silu(_tp_dense(inp, h, cd))
        part = jnp.dot(h.astype(cd), out_w.astype(cd),
                       preferred_element_type=jnp.float32)
        return psum(part) + out_b.astype(jnp.float32)

    x = x + 0.5 * ffn(rep["ln_ff1"], shd["ff1_in"], shd["ff1_out_w"],
                      rep["ff1_out_b"], x)

    # ---- head-sharded attention ----
    h = _ln(rep["ln_att"], x)
    hl = shd["att_rel"].shape[0]  # local heads
    dh = (D // cfg.enc_heads)
    q = _tp_dense(shd["att_q"], h, cd).reshape(B, T, hl, dh)
    k = _tp_dense(shd["att_k"], h, cd).reshape(B, T, hl, dh)
    v = _tp_dense(shd["att_v"], h, cd).reshape(B, T, hl, dh)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(cd), k.astype(cd),
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / _math.sqrt(dh))
    t_ids = jnp.arange(T, dtype=jnp.int32)
    ages = t_ids[:, None] - t_ids[None, :]
    rel = jnp.clip(ages, -REL_CLIP, REL_CLIP)
    logits = logits + shd["att_rel"][:, rel + REL_CLIP][None]
    key_ok = (t_ids[None, :] < lens.astype(jnp.int32)[:, None])[:, None, :]
    if cfg.enc_chunk_att > 0:  # chunked (lookahead) attention
        S = cfg.enc_chunk_att
        cs = (t_ids // S) * S
        win = ((t_ids[None, :] >= (cs - att_left)[:, None])
               & (t_ids[None, :] < (cs + S)[:, None]))
        key_ok = key_ok & win[None]
    elif att_left > 0:
        key_ok = key_ok & ((ages >= 0) & (ages <= att_left))[None]
    logits = jnp.where(key_ok[:, None], logits, ANEG)
    w = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", w.astype(cd), v.astype(cd),
                     preferred_element_type=jnp.float32)
    part = jnp.dot(ctx.reshape(B, T, hl * dh).astype(cd),
                   shd["att_o_w"].astype(cd),
                   preferred_element_type=jnp.float32)
    x = x + psum(part) + rep["att_o_b"].astype(jnp.float32)

    # ---- channel-sharded conv module ----
    h = _ln(rep["ln_conv"], x)
    g = _tp_dense(shd["conv_pw1"], h, cd)  # (B, T, 2*dl)
    dl = g.shape[-1] // 2
    g = g[..., :dl] * jax.nn.sigmoid(g[..., dl:])  # GLU, local channels
    g = _mask(g, lens)
    K = shd["conv_dw_w"].shape[0]
    kern = shd["conv_dw_w"].astype(jnp.float32)[:, None, :]
    pad = ([(K - 1, 0)] if (att_left > 0 or cfg.enc_chunk_att > 0)
           else [((K - 1) // 2, K // 2)])
    g = jax.lax.conv_general_dilated(
        g, kern, window_strides=(1,), padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=dl) + shd["conv_dw_b"].astype(jnp.float32)
    full = jax.lax.all_gather(g, axis, axis=2, tiled=True)  # (B, T, D)
    h2 = jax.nn.silu(_ln(rep["conv_ln"], full))
    c = jax.lax.axis_index(axis)
    local = jax.lax.dynamic_slice_in_dim(h2, c * dl, dl, axis=2)
    part = jnp.dot(local.astype(cd), shd["conv_pw2_w"].astype(cd),
                   preferred_element_type=jnp.float32)
    x = x + psum(part) + rep["conv_pw2_b"].astype(jnp.float32)

    x = x + 0.5 * ffn(rep["ln_ff2"], shd["ff2_in"], shd["ff2_out_w"],
                      rep["ff2_out_b"], x)
    return _ln(rep["ln_out"], x)


def tp_conformer_encode(enc_layers, cfg: TransducerConfig, feats,
                        feat_lens, *, axis=MODEL_AXIS, dropout: float = 0.0,
                        rngs=None):
    """Mirror of models.transducer.encode's conformer branch with
    tensor-parallel blocks. enc_layers: _local_view layout — entry 0 =
    {"in_proj": replicated}, then per block {"shd": ..., "rep": ...}."""
    from rnn_transducer_tpu.ops.lstm import mask_padding as _mask

    x = _mask(feats.astype(jnp.float32), feat_lens)
    lens = feat_lens
    cd = cfg.cdtype
    if cfg.time_reduction > 1:
        x, lens = m._time_reduce(x, lens, cfg.time_reduction)
    proj = enc_layers[0]["in_proj"]
    x = (jnp.dot(x.astype(cd), proj["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + proj["b"].astype(jnp.float32))
    n = cfg.enc_layers
    for i, layer in enumerate(enc_layers[1:]):
        x = tp_conformer_block(layer["shd"], layer["rep"], x, lens, cfg,
                               axis=axis)
        if dropout > 0.0 and rngs is not None and i < n - 1:
            x = m._dropout(x, dropout, rngs, site=i)
    return _mask(x, lens), lens


# --------------------------------------------------------------------------
# Tensor-parallel model functions (run inside shard_map)
# --------------------------------------------------------------------------

def tp_lstm_layer(p_local, x, h0=None, c0=None, *, axis=MODEL_AXIS,
                  compute_dtype=jnp.bfloat16):
    """Gate-sharded LSTM layer: x (B, T, I) replicated -> y (B, T, H) full.

    Each step all-gathers the (B, H/mp) local hidden so the recurrent
    matmul contracts over the full H; gates/cell state stay sharded.
    """
    B, T, _ = x.shape
    Hl = p_local["w_hh"].shape[1] // 4
    x_proj = (
        jnp.dot(x.astype(compute_dtype), p_local["w_ih"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + p_local["b"].astype(jnp.float32)
    )  # (B, T, 4Hl)
    if h0 is None:
        h0 = jnp.zeros((B, Hl), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, Hl), jnp.float32)

    def step(carry, xp_t):
        h_l, c_l = carry
        h = jax.lax.all_gather(h_l, axis, axis=1, tiled=True)  # (B, H)
        gates = xp_t + jnp.dot(
            h.astype(compute_dtype), p_local["w_hh"].astype(compute_dtype),
            preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_l + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), jnp.moveaxis(x_proj, 1, 0))
    y_local = jnp.moveaxis(ys, 0, 1)  # (B, T, Hl)
    y = jax.lax.all_gather(y_local, axis, axis=2, tiled=True)  # (B, T, H)
    return y, (h_t, c_t)


def tp_bilstm_layer(p_fwd, p_bwd, x, lens, *, axis=MODEL_AXIS,
                    compute_dtype=jnp.bfloat16):
    y_f, _ = tp_lstm_layer(p_fwd, x, axis=axis, compute_dtype=compute_dtype)
    x_r = reverse_padded(x, lens)
    y_b, _ = tp_lstm_layer(p_bwd, x_r, axis=axis, compute_dtype=compute_dtype)
    return jnp.concatenate([y_f, reverse_padded(y_b, lens)], axis=-1)


def tp_encode(params_local, cfg: TransducerConfig, feats, feat_lens, *,
              axis=MODEL_AXIS, dropout: float = 0.0, rngs=None):
    """Mirror of models.transducer.encode with gate-sharded layers
    (same inter-layer dropout sites as the single-device path; the
    replicated layer outputs draw identical masks on every model
    shard)."""
    if cfg.enc_type == "conformer":
        return tp_conformer_encode(params_local["encoder"], cfg, feats,
                                   feat_lens, axis=axis, dropout=dropout,
                                   rngs=rngs)
    x = mask_padding(feats.astype(jnp.float32), feat_lens)
    lens = feat_lens
    cd = cfg.cdtype
    n = len(params_local["encoder"])
    for i, layer in enumerate(params_local["encoder"]):
        if cfg.bidirectional:
            x = tp_bilstm_layer(layer["fwd"], layer["bwd"], x, lens,
                                axis=axis, compute_dtype=cd)
        else:
            x = tp_lstm_layer(layer, x, axis=axis, compute_dtype=cd)[0]
        x = mask_padding(x, lens)
        if dropout > 0.0 and rngs is not None and i < n - 1:
            x = m._dropout(x, dropout, rngs, site=i)
        if i == 0 and cfg.time_reduction > 1:
            x, lens = m._time_reduce(x, lens, cfg.time_reduction)
    return x, lens


def tp_predict(params_local, cfg: TransducerConfig, labels, *,
               axis=MODEL_AXIS, dropout: float = 0.0,
               embed_dropout: float = 0.0, rngs=None):
    if cfg.pred_type == "stateless":
        # replicated tiny decoder: the single-device path verbatim
        return m.predict(params_local, cfg, labels, dropout=dropout,
                         embed_dropout=embed_dropout, rng=rngs)[0]
    B, U = labels.shape
    bos = jnp.full((B, 1), cfg.blank, labels.dtype)
    x = params_local["embed"][jnp.concatenate([bos, labels], axis=1)]
    if embed_dropout > 0.0 and rngs is not None:
        x = m._dropout(x, embed_dropout, rngs, site=1000)
    n = len(params_local["predictor"])
    for i, layer in enumerate(params_local["predictor"]):
        x, _ = tp_lstm_layer(layer, x, axis=axis, compute_dtype=cfg.cdtype)
        if dropout > 0.0 and rngs is not None and i < n - 1:
            x = m._dropout(x, dropout, rngs, site=1001 + i)
    return x


def _joint_z(params_local, cfg: TransducerConfig, enc_out, pred_out):
    """Replicated joint pre-activation z = tanh(f + g): (B, T, U1, J) fp32."""
    jp = params_local["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_out.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))
    g = (jnp.dot(pred_out.astype(cd), jp["pred_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["pred_proj"]["b"].astype(jnp.float32))
    return jnp.tanh(f[:, :, None, :] + g[:, None, :, :])


def tp_joint_loss(params_local, cfg: TransducerConfig, enc_out, enc_lens,
                  pred_out, labels, label_lens, *, axis=MODEL_AXIS,
                  fastemit=0.0):
    """Vocab-parallel joint + RNN-T loss.

    The out projection is V-column-sharded: each shard builds its
    (B, T, U1, V/mp) logits slice, the log-softmax denominator is a
    pmax/psum reduction, and the blank/label scores are masked gathers
    psum-ed across shards. Only (B, T, U1) score tensors are exchanged.
    """
    z = _joint_z(params_local, cfg, enc_out, pred_out)
    out = params_local["joint"]["out"]
    cd = cfg.cdtype
    logits_l = (jnp.dot(z.astype(cd), out["w"].astype(cd),
                        preferred_element_type=jnp.float32)
                + out["b"].astype(jnp.float32))  # (B, T, U1, Vl)
    B, T, U1, Vl = logits_l.shape
    # stop_gradient BEFORE pmax: pmax has no differentiation rule, and the
    # shift cancels analytically in the softmax gradient anyway.
    mx = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(logits_l, axis=-1)), axis)  # (B,T,U1)
    den = mx + jnp.log(jax.lax.psum(
        jnp.sum(jnp.exp(logits_l - mx[..., None]), axis=-1), axis))

    v0 = jax.lax.axis_index(axis) * Vl

    def pick(ids):
        """logit value at global vocab id (exactly one shard owns each id)."""
        loc = ids.astype(jnp.int32) - v0
        ok = (loc >= 0) & (loc < Vl)
        val = jnp.take_along_axis(
            logits_l, jnp.clip(loc, 0, Vl - 1)[..., None], axis=-1)[..., 0]
        return jax.lax.psum(jnp.where(ok, val, 0.0), axis)

    lp_blank = pick(jnp.full((B, T, U1), cfg.blank, jnp.int32)) - den
    lab = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1)
    lp_y = pick(jnp.broadcast_to(lab[:, None, :], (B, T, U1))) - den
    lp_y = lp_y.at[:, :, U1 - 1].set(NEG_INF)  # u = U has no label

    if cfg.tdt_durations:
        # Duration head off the replicated joint activation: (B,T,U1,D)
        # is identical on every shard, so no collective is needed —
        # only the vocab-sharded token scores crossed chips above.
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with TDT "
                             "models")
        from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt_from_lp
        dur = params_local["joint"]["dur"]
        dur_l = (jnp.dot(z.astype(cd), dur["w"].astype(cd),
                         preferred_element_type=jnp.float32)
                 + dur["b"].astype(jnp.float32))
        lp_dur = jax.nn.log_softmax(dur_l, axis=-1)
        return rnnt_loss_tdt_from_lp(lp_blank, lp_y, lp_dur, enc_lens,
                                     label_lens, cfg.tdt_durations)
    if cfg.big_blank_durations:
        # Multi-blank: each big-blank column vocab_size+k lives on exactly
        # one shard; pick() extracts it like any other token score.
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with "
                             "multi-blank models")
        from rnn_transducer_tpu.ops.rnnt_multiblank import \
            rnnt_loss_multiblank_from_lp
        cols = tuple(cfg.vocab_size + k
                     for k in range(len(cfg.big_blank_durations)))
        lp_blanks = jnp.stack(
            [lp_blank] + [pick(jnp.full((B, T, U1), c, jnp.int32)) - den
                          for c in cols], axis=-1)
        return rnnt_loss_multiblank_from_lp(lp_blanks, lp_y, enc_lens,
                                            label_lens,
                                            cfg.big_blank_durations)
    return rnnt_loss_from_lp(lp_blank, lp_y, enc_lens, label_lens, fastemit)


def tp_ctc_loss_fn(params_local, cfg: TransducerConfig, feats, feat_lens,
                   labels, label_lens, *, axis=MODEL_AXIS):
    """CTC pretraining loss with the gate-sharded encoder (the CTC head
    is replicated; logits are identical on every model shard)."""
    from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
    enc_out, enc_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                  axis=axis)
    per_utt = ctc_loss_from_logits(
        m.ctc_logits(params_local, cfg, enc_out), labels, enc_lens,
        label_lens, cfg.blank)
    return jnp.mean(per_utt), per_utt


def rep_ctc_loss_fn(params, cfg: TransducerConfig, feats, feat_lens,
                    labels, label_lens):
    """CTC pretraining loss on fully replicated params (sp/ep modes —
    the model axis carries no CTC computation; grads pmean to
    themselves)."""
    from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    per_utt = ctc_loss_from_logits(
        m.ctc_logits(params, cfg, enc_out), labels, enc_lens, label_lens,
        cfg.blank)
    return jnp.mean(per_utt), per_utt


def tp_loss_fn(params_local, cfg: TransducerConfig, feats, feat_lens,
               labels, label_lens, *, axis=MODEL_AXIS, fastemit=0.0,
               dropout=0.0, embed_dropout=0.0, rngs=None, ctc_weight=0.0):
    enc_out, enc_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                  axis=axis, dropout=dropout, rngs=rngs)
    pred_out = tp_predict(params_local, cfg, labels, axis=axis,
                          dropout=dropout, embed_dropout=embed_dropout,
                          rngs=rngs)
    per_utt = tp_joint_loss(params_local, cfg, enc_out, enc_lens, pred_out,
                            labels, label_lens, axis=axis, fastemit=fastemit)
    per_utt = _with_ctc(per_utt, params_local, cfg, enc_out, enc_lens,
                        labels, label_lens, ctc_weight)
    return jnp.mean(per_utt), per_utt


# --------------------------------------------------------------------------
# Sequence-parallel joint + loss (weights replicated, frames sharded)
# --------------------------------------------------------------------------

def sp_joint_loss(params, cfg: TransducerConfig, enc_out, enc_lens,
                  pred_out, labels, label_lens, *, axis=MODEL_AXIS,
                  fastemit=0.0):
    """Frame-sharded joint + RNN-T loss.

    enc_out is padded to a multiple of the model-axis size and each shard
    builds logits + extracts blank/label scores for its own frame slice
    (full vocab locally); the (B, T, U1) scores are all-gathered for the
    replicated lattice recursion. Padded frames land beyond enc_lens so
    the loss masking already ignores them.
    """
    sp = jax.lax.axis_size(axis)
    B, T, _ = enc_out.shape
    Tp = -(-T // sp) * sp
    if Tp != T:
        enc_out = jnp.pad(enc_out, ((0, 0), (0, Tp - T), (0, 0)))
    Tl = Tp // sp
    t0 = jax.lax.axis_index(axis) * Tl
    enc_l = jax.lax.dynamic_slice_in_dim(enc_out, t0, Tl, axis=1)
    z = _joint_z(params, cfg, enc_l, pred_out)  # (B, Tl, U1, J)
    out = params["joint"]["out"]
    cd = cfg.cdtype
    logits_l = (jnp.dot(z.astype(cd), out["w"].astype(cd),
                        preferred_element_type=jnp.float32)
                + out["b"].astype(jnp.float32))  # (B, Tl, U1, C)
    lp = jax.nn.log_softmax(logits_l, axis=-1)
    gather_t = lambda a: jax.lax.all_gather(a, axis, axis=1,
                                            tiled=True)[:, :T]
    lp_y = gather_t(_gather_label_logprobs(lp, labels))
    if cfg.tdt_durations:
        # duration head off the same shard-local activation; only the
        # (B, T, U1) / (B, T, U1, D) streams travel the model axis
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with TDT "
                             "models")
        from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt_from_lp
        dur = params["joint"]["dur"]
        dur_l = (jnp.dot(z.astype(cd), dur["w"].astype(cd),
                         preferred_element_type=jnp.float32)
                 + dur["b"].astype(jnp.float32))
        lp_dur = gather_t(jax.nn.log_softmax(dur_l, axis=-1))
        return rnnt_loss_tdt_from_lp(gather_t(lp[..., cfg.blank]), lp_y,
                                     lp_dur, enc_lens, label_lens,
                                     cfg.tdt_durations)
    if cfg.big_blank_durations:
        if fastemit:
            raise ValueError("fastemit_lambda is not supported with "
                             "multi-blank models")
        from rnn_transducer_tpu.ops.rnnt_multiblank import \
            rnnt_loss_multiblank_from_lp
        cols = (cfg.blank,) + tuple(
            cfg.vocab_size + k
            for k in range(len(cfg.big_blank_durations)))
        lp_blanks = gather_t(jnp.stack([lp[..., c] for c in cols],
                                       axis=-1))
        return rnnt_loss_multiblank_from_lp(lp_blanks, lp_y, enc_lens,
                                            label_lens,
                                            cfg.big_blank_durations)
    lp_blank = gather_t(lp[..., cfg.blank])
    return rnnt_loss_from_lp(lp_blank, lp_y, enc_lens, label_lens, fastemit)


def sp_loss_fn(params, cfg: TransducerConfig, feats, feat_lens, labels,
               label_lens, *, axis=MODEL_AXIS, fastemit=0.0,
               dropout=0.0, embed_dropout=0.0, rngs=None, ctc_weight=0.0):
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens,
                                 dropout=dropout, rng=rngs)
    pred_out, _ = m.predict(params, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    per_utt = sp_joint_loss(params, cfg, enc_out, enc_lens, pred_out,
                            labels, label_lens, axis=axis, fastemit=fastemit)
    per_utt = _with_ctc(per_utt, params, cfg, enc_out, enc_lens, labels,
                        label_lens, ctc_weight)
    return jnp.mean(per_utt), per_utt


def sp_pruned_loss_fn(params, cfg: TransducerConfig, feats, feat_lens,
                      labels, label_lens, *, axis=MODEL_AXIS, fastemit=0.0,
                      dropout=0.0, embed_dropout=0.0, rngs=None,
                      ctc_weight=0.0, simple_loss_scale=0.5):
    """k2-style pruned two-pass objective under sequence parallelism.

    The cheap trivial-joiner first pass and the (B, T) pruning bounds
    run replicated; the EXPENSIVE band joint — the (B·T·S, J) x (J, V)
    matmuls that dominate large-vocab training — runs on each shard's
    T/mp frame slice only, and the tiny (B, T, S) band log-prob streams
    are all-gathered for the replicated banded lattice recursion
    (custom VJP). Same collective pattern as sp_joint_loss.
    """
    from rnn_transducer_tpu.ops.rnnt_loss import occupancies_from_lp
    from rnn_transducer_tpu.ops.rnnt_pruned import (prune_bounds,
                                                    rnnt_loss_banded,
                                                    simple_lp, _pruned_lp)

    assert cfg.pruned_range > 0, "sp pruned loss needs cfg.pruned_range"
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens,
                                 dropout=dropout, rng=rngs)
    pred_out, _ = m.predict(params, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    f, g, w, b = m.joint_activations(params, cfg, enc_out, pred_out)
    cd = cfg.cdtype
    ps = params["simple"]
    am = (jnp.einsum("btd,dv->btv", enc_out.astype(cd),
                     ps["am"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + ps["am"]["b"].astype(jnp.float32))
    lm = (jnp.einsum("bud,dv->buv", pred_out.astype(cd),
                     ps["lm"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + ps["lm"]["b"].astype(jnp.float32))
    lpb_s, lpy_s = simple_lp(am, lm, labels, cfg.blank)
    simple_pu = rnnt_loss_from_lp(lpb_s, lpy_s, enc_lens, label_lens,
                                  fastemit)
    gb, gy = occupancies_from_lp(jax.lax.stop_gradient(lpb_s),
                                 jax.lax.stop_gradient(lpy_s),
                                 enc_lens, label_lens)
    sb = prune_bounds(gb + gy, cfg.pruned_range, enc_lens, label_lens)
    sb = jax.lax.stop_gradient(sb)

    U1 = g.shape[1]
    S = min(cfg.pruned_range, U1)
    sp = jax.lax.axis_size(axis)
    B, T, _ = f.shape
    Tp = -(-T // sp) * sp
    f_p = jnp.pad(f, ((0, 0), (0, Tp - T), (0, 0))) if Tp != T else f
    sb_p = jnp.pad(sb, ((0, 0), (0, Tp - T))) if Tp != T else sb
    Tl = Tp // sp
    t0 = jax.lax.axis_index(axis) * Tl
    f_l = jax.lax.dynamic_slice_in_dim(f_p, t0, Tl, axis=1)
    sb_l = jax.lax.dynamic_slice_in_dim(sb_p, t0, Tl, axis=1)
    lpb_l, lpy_l = _pruned_lp(f_l, g, w, b, labels, sb_l, S, cfg.blank, cd)
    gather_t = lambda a: jax.lax.all_gather(a, axis, axis=1,
                                            tiled=True)[:, :T]
    pruned_pu = rnnt_loss_banded(gather_t(lpb_l), gather_t(lpy_l), sb,
                                 enc_lens, label_lens, U1, fastemit)
    pruned_pu = _with_ctc(pruned_pu, params, cfg, enc_out, enc_lens,
                          labels, label_lens, ctc_weight)
    total = (jnp.mean(pruned_pu)
             + simple_loss_scale * jnp.mean(simple_pu))
    return total, pruned_pu


def _tp_band_lp_chunk(f_c, u_c, lab_w, g, w_l, b_l, blank, cd, axis):
    """One time-chunk of the vocab-sharded band joint -> (lpb, lpy).

    Same contract as ops.rnnt_pruned._pruned_lp_chunk, but logits cover
    this shard's V/mp columns only: the log-softmax denominator is a
    pmax/psum reduction and the blank/label scores are masked local
    gathers psum-ed across shards (exactly one shard owns each vocab
    id) — the tp_joint_loss pattern applied to the (B, Tc, S) band.
    """
    B, Tc, S = u_c.shape
    U1 = g.shape[1]
    Vl = w_l.shape[1]
    onehot_u = (u_c[..., None]
                == jax.lax.broadcasted_iota(jnp.int32, (B, Tc, S, U1), 3)
                ).astype(jnp.float32)
    g_w = jnp.einsum("btsu,buj->btsj", onehot_u, g,
                     preferred_element_type=jnp.float32)
    z = jnp.tanh(f_c[:, :, None, :] + g_w)  # (B, Tc, S, J)
    logits_l = (jnp.einsum("btsj,jv->btsv", z.astype(cd), w_l.astype(cd),
                           preferred_element_type=jnp.float32)
                + b_l.astype(jnp.float32))  # (B, Tc, S, Vl)
    mx = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(logits_l, axis=-1)), axis)
    den = mx + jnp.log(jax.lax.psum(
        jnp.sum(jnp.exp(logits_l - mx[..., None]), axis=-1), axis))
    v0 = jax.lax.axis_index(axis) * Vl

    def pick(ids):
        loc = ids.astype(jnp.int32) - v0
        ok = (loc >= 0) & (loc < Vl)
        val = jnp.take_along_axis(
            logits_l, jnp.clip(loc, 0, Vl - 1)[..., None], axis=-1)[..., 0]
        return jax.lax.psum(jnp.where(ok, val, 0.0), axis)

    lpb_w = pick(jnp.full((B, Tc, S), blank, jnp.int32)) - den
    lpy_w = pick(lab_w) - den
    return lpb_w, lpy_w


def tp_pruned_loss_fn(params_local, cfg: TransducerConfig, feats, feat_lens,
                      labels, label_lens, *, axis=MODEL_AXIS, fastemit=0.0,
                      dropout=0.0, embed_dropout=0.0, rngs=None,
                      ctc_weight=0.0, simple_loss_scale=0.5):
    """k2-style pruned two-pass objective under tensor parallelism.

    The encoder/predictor run gate-sharded (the reason to be in tp);
    the cheap trivial-joiner first pass and the pruning bounds run
    replicated (the simple heads are replicated); the EXPENSIVE band
    joint — (B·T·S, J) x (J, V) — splits its vocab columns mp ways via
    _tp_band_lp_chunk, so each shard holds only (B, Tc, S, V/mp) chunk
    logits and only (B, T, S) score streams cross chips. The banded
    lattice recursion (custom VJP) runs replicated.
    """
    from rnn_transducer_tpu.ops.rnnt_loss import occupancies_from_lp
    from rnn_transducer_tpu.ops.rnnt_pruned import (_CHUNK_BYTES,
                                                    prune_bounds,
                                                    rnnt_loss_banded,
                                                    simple_lp)

    assert cfg.pruned_range > 0, "tp pruned loss needs cfg.pruned_range"
    enc_out, enc_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                  axis=axis, dropout=dropout, rngs=rngs)
    pred_out = tp_predict(params_local, cfg, labels, axis=axis,
                          dropout=dropout, embed_dropout=embed_dropout,
                          rngs=rngs)
    f, g, w_l, b_l = m.joint_activations(params_local, cfg, enc_out,
                                         pred_out)
    cd = cfg.cdtype
    ps = params_local["simple"]
    am = (jnp.einsum("btd,dv->btv", enc_out.astype(cd),
                     ps["am"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + ps["am"]["b"].astype(jnp.float32))
    lm = (jnp.einsum("bud,dv->buv", pred_out.astype(cd),
                     ps["lm"]["w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + ps["lm"]["b"].astype(jnp.float32))
    lpb_s, lpy_s = simple_lp(am, lm, labels, cfg.blank)
    simple_pu = rnnt_loss_from_lp(lpb_s, lpy_s, enc_lens, label_lens,
                                  fastemit)
    gb, gy = occupancies_from_lp(jax.lax.stop_gradient(lpb_s),
                                 jax.lax.stop_gradient(lpy_s),
                                 enc_lens, label_lens)
    sb = prune_bounds(gb + gy, cfg.pruned_range, enc_lens, label_lens)
    sb = jax.lax.stop_gradient(sb)

    U1 = g.shape[1]
    S = min(cfg.pruned_range, U1)
    lpb_w, lpy_w = _tp_banded_streams(f, g, w_l, b_l, labels, sb, S,
                                      cfg.blank, cd, axis)
    pruned_pu = rnnt_loss_banded(lpb_w, lpy_w, sb, enc_lens, label_lens,
                                 U1, fastemit)
    pruned_pu = _with_ctc(pruned_pu, params_local, cfg, enc_out, enc_lens,
                          labels, label_lens, ctc_weight)
    total = (jnp.mean(pruned_pu)
             + simple_loss_scale * jnp.mean(simple_pu))
    return total, pruned_pu


def _tp_banded_streams(f, g, w_l, b_l, labels, sb, S, blank, cd, axis):
    """Vocab-sharded band joint over rematerialized T-chunks ->
    (lpb_w, lpy_w) (B, T, S) replicated streams (shared by the pruned
    and alignment-restricted objectives under tp)."""
    from rnn_transducer_tpu.ops.rnnt_pruned import _CHUNK_BYTES

    B, T, _ = f.shape
    U1 = g.shape[1]
    u = sb[:, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    u_c = jnp.clip(u, 0, U1 - 1)  # (B, T, S)
    lab_pad = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1)
    lab_w = jnp.take_along_axis(lab_pad[:, None].repeat(T, 1), u_c, axis=2)

    Vl = w_l.shape[1]
    body = jax.checkpoint(functools.partial(
        _tp_band_lp_chunk, g=g, w_l=w_l, b_l=b_l, blank=blank, cd=cd,
        axis=axis))
    tc = max(1, min(T, _CHUNK_BYTES // max(1, B * S * Vl * 4)))
    if tc >= T:
        return body(f, u_c, lab_w)
    nc = -(-T // tc)
    pad = nc * tc - T

    def padc(x):
        x = jnp.pad(x, [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2))
        return jnp.moveaxis(x.reshape((B, nc, tc) + x.shape[2:]), 1, 0)

    lpb_w, lpy_w = jax.lax.map(
        lambda args: body(*args), (padc(f), padc(u_c), padc(lab_w)))
    lpb_w = jnp.moveaxis(lpb_w, 0, 1).reshape(B, nc * tc, S)[:, :T]
    lpy_w = jnp.moveaxis(lpy_w, 0, 1).reshape(B, nc * tc, S)[:, :T]
    return lpb_w, lpy_w


# --------------------------------------------------------------------------
# Knowledge distillation / alignment-restricted training under sp and tp
# (VERDICT r3 missing #5: these two rode teacher params only through the
# dp step; here the teacher rides the sharded steps as the same replicated
# traced argument — see make_tp_train_step's uses_teacher plumbing.)
# --------------------------------------------------------------------------

def _frame_slice(a, axis):
    """Pad dim 1 (time) to a multiple of the model-axis size and take this
    shard's slice. Returns (local, t0, T_original)."""
    sp = jax.lax.axis_size(axis)
    T = a.shape[1]
    Tp = -(-T // sp) * sp
    if Tp != T:
        pad = [(0, 0)] * a.ndim
        pad[1] = (0, Tp - T)
        a = jnp.pad(a, pad)
    Tl = Tp // sp
    t0 = jax.lax.axis_index(axis) * Tl
    return jax.lax.dynamic_slice_in_dim(a, t0, Tl, axis=1), t0, T


def _kd_per_utt(kd_cell_sum, enc_lens, label_lens, tau, axis):
    """Per-utterance KD from shard-local masked KL sums: psum the partials
    and divide by the GLOBAL valid-cell count (= enc_lens * (label_lens+1),
    computable replicated), scaled by tau^2 (Hinton)."""
    num = jax.lax.psum(kd_cell_sum, axis)
    denom = (enc_lens * (label_lens + 1)).astype(num.dtype)
    return num / jnp.maximum(denom, 1.0) * tau * tau


def sp_distill_loss_fn(params, cfg: TransducerConfig, teacher_params,
                       teacher_cfg: TransducerConfig, feats, feat_lens,
                       labels, label_lens, *, axis=MODEL_AXIS,
                       distill_weight, distill_temp=1.0, dropout=0.0,
                       embed_dropout=0.0, rngs=None):
    """RNN-T NLL + lattice KD under sequence parallelism.

    Student encode/predict run replicated (as in sp_loss_fn); BOTH the
    student's and the stop-gradient teacher's (B, T, U1, V) lattices are
    built only on each shard's T/mp frame slice — the O(T·U·V)
    softmax/KL work that dominates KD is exactly what the model axis
    shards. Only (B, T, U1) score streams and per-utterance partial KD
    sums cross chips. Semantics mirror train/loop.py distill_loss_fn.
    """
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens,
                                 dropout=dropout, rng=rngs)
    pred_out, _ = m.predict(params, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    t_enc, _ = m.encode(teacher_params, teacher_cfg, feats, feat_lens)
    t_pred, _ = m.predict(teacher_params, teacher_cfg, labels)

    enc_l, t0, T = _frame_slice(enc_out, axis)
    tenc_l, _, _ = _frame_slice(t_enc, axis)
    z = _joint_z(params, cfg, enc_l, pred_out)
    out = params["joint"]["out"]
    cd = cfg.cdtype
    logits_l = (jnp.dot(z.astype(cd), out["w"].astype(cd),
                        preferred_element_type=jnp.float32)
                + out["b"].astype(jnp.float32))  # (B, Tl, U1, V)
    lp = jax.nn.log_softmax(logits_l, axis=-1)
    gather_t = lambda a: jax.lax.all_gather(a, axis, axis=1,
                                            tiled=True)[:, :T]
    per_utt = rnnt_loss_from_lp(
        gather_t(lp[..., cfg.blank]),
        gather_t(_gather_label_logprobs(lp, labels)), enc_lens, label_lens)

    t_logits_l = jax.lax.stop_gradient(
        m.joint(teacher_params, teacher_cfg, tenc_l, t_pred))
    tau = distill_temp
    lp_s = jax.nn.log_softmax(logits_l / tau, axis=-1)
    lp_t = jax.nn.log_softmax(t_logits_l.astype(jnp.float32) / tau, axis=-1)
    kl = jnp.sum(jnp.exp(lp_t) * (lp_t - lp_s), axis=-1)  # (B, Tl, U1)
    Tl, U1 = kl.shape[1], kl.shape[2]
    gt = t0 + jnp.arange(Tl)
    mask = ((gt[None, :, None] < enc_lens[:, None, None])
            & (jnp.arange(U1)[None, None, :] <= label_lens[:, None, None])
            ).astype(kl.dtype)
    kd_pu = _kd_per_utt(jnp.sum(kl * mask, axis=(1, 2)), enc_lens,
                        label_lens, tau, axis)
    per_utt = per_utt + distill_weight * kd_pu
    return jnp.mean(per_utt), per_utt


def tp_distill_loss_fn(params_local, cfg: TransducerConfig, teacher_params,
                       teacher_cfg: TransducerConfig, feats, feat_lens,
                       labels, label_lens, *, axis=MODEL_AXIS,
                       distill_weight, distill_temp=1.0, dropout=0.0,
                       embed_dropout=0.0, rngs=None):
    """RNN-T NLL + lattice KD under tensor parallelism.

    The student runs the gate-sharded encoder/predictor + vocab-parallel
    joint (as in tp_loss_fn); the KD KL reduces vocab-parallel — each
    shard sums p_t * (lp_t - lp_s) over its own V/mp logit columns
    (teacher columns sliced from the replicated stop-gradient teacher
    lattice; padded columns carry p_t = 0) and only per-utterance
    partial sums psum across shards. Both student normalizers (the NLL
    streams at temperature 1, the KD at tau) use tp_joint_loss's
    pmax/psum reduction.
    """
    enc_out, enc_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                  axis=axis, dropout=dropout, rngs=rngs)
    pred_out = tp_predict(params_local, cfg, labels, axis=axis,
                          dropout=dropout, embed_dropout=embed_dropout,
                          rngs=rngs)
    z = _joint_z(params_local, cfg, enc_out, pred_out)
    out = params_local["joint"]["out"]
    cd = cfg.cdtype
    logits_l = (jnp.dot(z.astype(cd), out["w"].astype(cd),
                        preferred_element_type=jnp.float32)
                + out["b"].astype(jnp.float32))  # (B, T, U1, Vl)
    B, T, U1, Vl = logits_l.shape

    def lsm_den(x):
        mx = jax.lax.pmax(jax.lax.stop_gradient(jnp.max(x, axis=-1)), axis)
        return mx + jnp.log(jax.lax.psum(
            jnp.sum(jnp.exp(x - mx[..., None]), axis=-1), axis))

    den = lsm_den(logits_l)
    v0 = jax.lax.axis_index(axis) * Vl

    def pick(ids):
        loc = ids.astype(jnp.int32) - v0
        ok = (loc >= 0) & (loc < Vl)
        val = jnp.take_along_axis(
            logits_l, jnp.clip(loc, 0, Vl - 1)[..., None], axis=-1)[..., 0]
        return jax.lax.psum(jnp.where(ok, val, 0.0), axis)

    lp_blank = pick(jnp.full((B, T, U1), cfg.blank, jnp.int32)) - den
    lab = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1)
    lp_y = pick(jnp.broadcast_to(lab[:, None, :], (B, T, U1))) - den
    lp_y = lp_y.at[:, :, U1 - 1].set(NEG_INF)
    per_utt = rnnt_loss_from_lp(lp_blank, lp_y, enc_lens, label_lens)

    t_logits, _ = m.forward(teacher_params, teacher_cfg, feats, feat_lens,
                            labels)
    t_logits = jax.lax.stop_gradient(t_logits).astype(jnp.float32)
    tau = distill_temp
    lp_t = jax.nn.log_softmax(t_logits / tau, axis=-1)  # (B, T, U1, V)
    V = lp_t.shape[-1]
    Vp = jax.lax.axis_size(axis) * Vl
    if Vp != V:  # student out projection is padded to V % mp == 0
        lp_t = jnp.pad(lp_t, ((0, 0), (0, 0), (0, 0), (0, Vp - V)),
                       constant_values=NEG_INF)
    lp_t_l = jax.lax.dynamic_slice_in_dim(lp_t, v0, Vl, axis=-1)
    lps_l = logits_l / tau
    lp_s_l = lps_l - lsm_den(lps_l)[..., None]
    p_t = jnp.exp(lp_t_l)
    kl_l = jnp.sum(jnp.where(p_t > 0, p_t * (lp_t_l - lp_s_l), 0.0),
                   axis=-1)  # (B, T, U1) shard-partial
    mask = ((jnp.arange(T)[None, :, None] < enc_lens[:, None, None])
            & (jnp.arange(U1)[None, None, :] <= label_lens[:, None, None])
            ).astype(kl_l.dtype)
    kd_pu = _kd_per_utt(jnp.sum(kl_l * mask, axis=(1, 2)), enc_lens,
                        label_lens, tau, axis)
    per_utt = per_utt + distill_weight * kd_pu
    return jnp.mean(per_utt), per_utt


def sp_ar_loss_fn(params, cfg: TransducerConfig, teacher_params,
                  teacher_cfg, feats, feat_lens, labels, label_lens, *,
                  axis=MODEL_AXIS, ar_range, ar_left=-1, fastemit=0.0,
                  dropout=0.0, embed_dropout=0.0, rngs=None,
                  ctc_weight=0.0):
    """Alignment-restricted RNN-T (loss_impl='ar') under sequence
    parallelism.

    Both O(T·U·V) lattices — the aligner's Viterbi score extraction and
    the student's banded joint — run on each shard's T/mp frame slice;
    only (B, T, U1) / (B, T, S) streams cross the model axis. The
    Viterbi backtrace, band bounds and banded recursion run replicated
    (cheap O(T·U) scans). teacher_params=None self-aligns on the live
    model under stop_gradient; the aligner always runs clean (no
    dropout) so the band does not jitter with the regularizer's masks.
    """
    from rnn_transducer_tpu.ops.rnnt_align import (emit_frames_device,
                                                   rnnt_viterbi)
    from rnn_transducer_tpu.ops.rnnt_pruned import (_pruned_lp,
                                                    alignment_bounds,
                                                    rnnt_loss_banded)

    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens,
                                 dropout=dropout, rng=rngs)
    pred_out, _ = m.predict(params, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)
    f, g, w, b = m.joint_activations(params, cfg, enc_out, pred_out)

    a_params = (jax.lax.stop_gradient(params) if teacher_params is None
                else teacher_params)
    a_cfg = cfg if teacher_params is None else teacher_cfg
    a_enc, a_lens = m.encode(a_params, a_cfg, feats, feat_lens)
    a_pred, _ = m.predict(a_params, a_cfg, labels)
    aenc_l, _, Ta = _frame_slice(a_enc, axis)
    a_lp = jax.lax.stop_gradient(jax.nn.log_softmax(
        m.joint(a_params, a_cfg, aenc_l, a_pred).astype(jnp.float32),
        axis=-1))
    gather_t = lambda x: jax.lax.all_gather(x, axis, axis=1,
                                            tiled=True)[:, :Ta]
    _, K = rnnt_viterbi(gather_t(a_lp[..., a_cfg.blank]),
                        gather_t(_gather_label_logprobs(a_lp, labels)),
                        a_lens, label_lens)
    emit = emit_frames_device(K, a_lens, label_lens)
    U1 = labels.shape[1] + 1
    T = enc_out.shape[1]
    sb = jax.lax.stop_gradient(alignment_bounds(
        emit, T, ar_range, enc_lens, label_lens, U1,
        left_labels=None if ar_left < 0 else ar_left))

    S = min(ar_range, U1)
    f_l, _, _ = _frame_slice(f, axis)
    sb_l, _, _ = _frame_slice(sb, axis)
    lpb_l, lpy_l = _pruned_lp(f_l, g, w, b, labels, sb_l, S, cfg.blank,
                              cfg.cdtype)
    per_utt = rnnt_loss_banded(gather_t(lpb_l), gather_t(lpy_l), sb,
                               enc_lens, label_lens, U1, fastemit)
    per_utt = _with_ctc(per_utt, params, cfg, enc_out, enc_lens, labels,
                        label_lens, ctc_weight)
    return jnp.mean(per_utt), per_utt


def tp_ar_loss_fn(params_local, cfg: TransducerConfig, teacher_params,
                  teacher_cfg, feats, feat_lens, labels, label_lens, *,
                  axis=MODEL_AXIS, ar_range, ar_left=-1, fastemit=0.0,
                  dropout=0.0, embed_dropout=0.0, rngs=None,
                  ctc_weight=0.0):
    """Alignment-restricted RNN-T under tensor parallelism.

    Student: gate-sharded encoder/predictor; the banded joint splits its
    vocab columns mp ways (_tp_banded_streams — the tp_pruned machinery
    with alignment bounds instead of simple-pass bounds). Aligner
    streams: self-alignment extracts them vocab-parallel from the live
    sharded params under stop_gradient (tp_joint_loss's pick/den
    pattern); a teacher checkpoint (plain replicated params) runs a
    plain replicated forward. Backtrace/bounds/banded recursion run
    replicated.
    """
    from rnn_transducer_tpu.ops.rnnt_align import (emit_frames_device,
                                                   rnnt_viterbi)
    from rnn_transducer_tpu.ops.rnnt_pruned import (alignment_bounds,
                                                    rnnt_loss_banded)

    enc_out, enc_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                  axis=axis, dropout=dropout, rngs=rngs)
    pred_out = tp_predict(params_local, cfg, labels, axis=axis,
                          dropout=dropout, embed_dropout=embed_dropout,
                          rngs=rngs)
    f, g, w_l, b_l = m.joint_activations(params_local, cfg, enc_out,
                                         pred_out)
    B, T, _ = f.shape
    U1 = labels.shape[1] + 1

    if teacher_params is None:
        # self-alignment: vocab-parallel streams from the live params
        # (clean forward — recomputed without dropout when dropout is on)
        if dropout or embed_dropout:
            a_enc, a_lens = tp_encode(params_local, cfg, feats, feat_lens,
                                      axis=axis)
            a_pred = tp_predict(params_local, cfg, labels, axis=axis)
        else:
            a_enc, a_lens, a_pred = enc_out, enc_lens, pred_out
        z = _joint_z(params_local, cfg, a_enc, a_pred)
        out = params_local["joint"]["out"]
        cd = cfg.cdtype
        logits_l = jax.lax.stop_gradient(
            jnp.dot(z.astype(cd), out["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + out["b"].astype(jnp.float32))
        Vl = logits_l.shape[-1]
        mx = jax.lax.pmax(jnp.max(logits_l, axis=-1), axis)
        den = mx + jnp.log(jax.lax.psum(
            jnp.sum(jnp.exp(logits_l - mx[..., None]), axis=-1), axis))
        v0 = jax.lax.axis_index(axis) * Vl

        def pick(ids):
            loc = ids.astype(jnp.int32) - v0
            ok = (loc >= 0) & (loc < Vl)
            val = jnp.take_along_axis(
                logits_l, jnp.clip(loc, 0, Vl - 1)[..., None],
                axis=-1)[..., 0]
            return jax.lax.psum(jnp.where(ok, val, 0.0), axis)

        a_lpb = pick(jnp.full((B, T, U1), cfg.blank, jnp.int32)) - den
        lab = jnp.concatenate(
            [labels.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)],
            axis=1)
        a_lpy = pick(jnp.broadcast_to(lab[:, None, :], (B, T, U1))) - den
        a_lpy = a_lpy.at[:, :, U1 - 1].set(NEG_INF)
    else:
        a_logits, a_lens = m.forward(teacher_params, teacher_cfg, feats,
                                     feat_lens, labels)
        a_lp = jax.lax.stop_gradient(jax.nn.log_softmax(
            a_logits.astype(jnp.float32), axis=-1))
        a_lpb = a_lp[..., teacher_cfg.blank]
        a_lpy = _gather_label_logprobs(a_lp, labels)
    _, K = rnnt_viterbi(a_lpb, a_lpy, a_lens, label_lens)
    emit = emit_frames_device(K, a_lens, label_lens)
    sb = jax.lax.stop_gradient(alignment_bounds(
        emit, T, ar_range, enc_lens, label_lens, U1,
        left_labels=None if ar_left < 0 else ar_left))

    S = min(ar_range, U1)
    lpb_w, lpy_w = _tp_banded_streams(f, g, w_l, b_l, labels, sb, S,
                                      cfg.blank, cfg.cdtype, axis)
    per_utt = rnnt_loss_banded(lpb_w, lpy_w, sb, enc_lens, label_lens,
                               U1, fastemit)
    per_utt = _with_ctc(per_utt, params_local, cfg, enc_out, enc_lens,
                        labels, label_lens, ctc_weight)
    return jnp.mean(per_utt), per_utt


# --------------------------------------------------------------------------
# Expert parallel ("ep"): frame-sharded lattice + expert-sharded MoE joint
# --------------------------------------------------------------------------
#
# For MoE-joint configs (cfg.joint_experts > 0, ops/moe.py). The lattice
# is frame-sharded exactly like "sp"; the expert FFN weights shard over the
# model axis and each shard's lattice tokens reach their experts through
# two all_to_alls (ops.moe.moe_top1_ep). Non-expert weights replicate.

def split_params_ep(params, cfg: TransducerConfig, mp: int) -> TPParams:
    E = cfg.joint_experts
    assert E > 0, "ep mode needs cfg.joint_experts > 0"
    assert E % mp == 0, f"experts {E} not divisible by model parallel {mp}"
    moe = params["moe"]
    shd = {"moe": {k: moe[k].reshape((mp, E // mp) + moe[k].shape[1:])
                   for k in ("w1", "b1", "w2", "b2")}}
    rep = {k: v for k, v in params.items() if k != "moe"}
    rep["moe_router"] = moe["router"]  # router replicated (needs all E cols)
    return TPParams(rep=rep, shd=shd)


def merge_params_ep(tpp: TPParams, cfg: TransducerConfig) -> dict:
    params = {k: v for k, v in tpp.rep.items() if k != "moe_router"}
    moe = {"router": tpp.rep["moe_router"]}
    for k, v in tpp.shd["moe"].items():
        moe[k] = v.reshape((-1,) + v.shape[2:])
    params["moe"] = moe
    return params


def init_ep_train_state(key, cfg: TransducerConfig, tcfg: TrainConfig,
                        mp: int) -> TrainState:
    params = split_params_ep(m.init_params(key, cfg), cfg, mp)
    tx = make_optimizer_noclip(tcfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=_init_ema(params, tcfg))


def ep_loss_fn(local: TPParams, cfg: TransducerConfig, feats, feat_lens,
               labels, label_lens, *, axis=MODEL_AXIS, fastemit=0.0,
               dropout=0.0, embed_dropout=0.0, rngs=None, ctc_weight=0.0):
    """Frame-sharded joint + loss with the expert-parallel MoE residual.

    Returns (mean loss + aux, per_utt). Capacity semantics under ep: each
    (source shard, expert) pair gets C = ceil(N_local * cf / E) slots —
    with an ample capacity factor this routes identically to the
    single-device moe_top1.
    """
    from rnn_transducer_tpu.ops.moe import moe_top1_ep

    rep = {k: v for k, v in local.rep.items() if k != "moe_router"}
    moe_local = dict(local.shd["moe"])
    moe_local["router"] = local.rep["moe_router"]

    enc_out, enc_lens = m.encode(rep, cfg, feats, feat_lens,
                                 dropout=dropout, rng=rngs)
    pred_out, _ = m.predict(rep, cfg, labels, dropout=dropout,
                            embed_dropout=embed_dropout, rng=rngs)

    mp = jax.lax.axis_size(axis)
    B, T, _ = enc_out.shape
    Tp = -(-T // mp) * mp
    if Tp != T:
        enc_out = jnp.pad(enc_out, ((0, 0), (0, Tp - T), (0, 0)))
    Tl = Tp // mp
    t0 = jax.lax.axis_index(axis) * Tl
    enc_l = jax.lax.dynamic_slice_in_dim(enc_out, t0, Tl, axis=1)
    z = _joint_z(rep, cfg, enc_l, pred_out)  # (B, Tl, U1, J)
    y, aux = moe_top1_ep(moe_local, z.reshape(-1, z.shape[-1]), axis=axis,
                         n_shards=mp,
                         capacity_factor=cfg.moe_capacity_factor,
                         compute_dtype=cfg.cdtype,
                         stats_axes=(axis, DATA_AXIS))
    z = z + y.reshape(z.shape)
    out = rep["joint"]["out"]
    cd = cfg.cdtype
    logits_l = (jnp.dot(z.astype(cd), out["w"].astype(cd),
                        preferred_element_type=jnp.float32)
                + out["b"].astype(jnp.float32))  # (B, Tl, U1, V)
    lp = jax.nn.log_softmax(logits_l, axis=-1)
    lp_blank = jax.lax.all_gather(lp[..., cfg.blank], axis, axis=1,
                                  tiled=True)[:, :T]
    lp_y = jax.lax.all_gather(
        _gather_label_logprobs(lp, labels), axis, axis=1, tiled=True)[:, :T]
    per_utt = rnnt_loss_from_lp(lp_blank, lp_y, enc_lens, label_lens,
                                fastemit)
    per_utt = _with_ctc(per_utt, rep, cfg, enc_out[:, :T], enc_lens,
                        labels, label_lens, ctc_weight)
    return jnp.mean(per_utt) + cfg.moe_aux_weight * aux, per_utt


# --------------------------------------------------------------------------
# Training step over the 2-D mesh
# --------------------------------------------------------------------------

def _combine_model_grads(grads, mp: int):
    """Model-axis grad combine: each shard computed the same replicated
    loss, so autodiff grads are mp x the true partials. Replicated leaves
    additionally need the cross-shard partial sum (pmean = psum / mp);
    sharded leaves are owned by one shard (divide by mp only)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g: g / mp if _path_has_shd(path)
        else jax.lax.pmean(g, MODEL_AXIS), grads)


def _tp_global_norm(grads, is_tp: bool):
    """Global grad norm with sharded leaves psum-ed over the model axis."""
    if not is_tp:
        return optax.global_norm(grads)
    sq = jax.tree_util.tree_map_with_path(
        lambda path, g: (jax.lax.psum(jnp.sum(g * g), MODEL_AXIS)
                         if _path_has_shd(path) else jnp.sum(g * g)), grads)
    return jnp.sqrt(sum(jax.tree.leaves(sq)))


def apply_weight_noise(params, tcfg: TrainConfig, step, model_sharded: bool):
    """Graves weight noise for the model-parallel train steps.

    Mirrors train.loop.make_train_step's semantics: gradients are taken at
    params + eps with eps ~ N(0, std); the update applies to the clean
    params. The key folds in the (replicated) step counter so data-axis
    shards stay in lockstep. Leaves sharded over the model axis (`shd` in
    TPParams) additionally fold in the model-axis index: each shard owns
    *distinct* weights, so each draws independent noise, while replicated
    leaves draw identical noise on every shard and stay bitwise in sync.
    Must be called inside shard_map (uses lax.axis_index(MODEL_AXIS))."""
    base = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed ^ 0x5EED), step)
    mi = jax.lax.axis_index(MODEL_AXIS) if model_sharded else None
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    noisy = []
    for i, (path, leaf) in enumerate(flat):
        k = jax.random.fold_in(base, i)
        if model_sharded and _path_has_shd(path):
            k = jax.random.fold_in(k, mi)
        noisy.append(leaf + tcfg.weight_noise_std
                     * jax.random.normal(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, noisy)


def dropout_rngs(tcfg: TrainConfig, step, local_batch: int):
    """Per-example dropout keys for the model-parallel train steps.

    Identical semantics to train.loop.loss_fn: one key per GLOBAL batch
    position (data-axis index * local batch + local index) folded into
    the per-step key, so dp x model runs draw the same masks as the
    single-device trajectory; the model axis replicates the batch, so
    every model shard derives identical keys and activations stay in
    sync. Must be called inside shard_map."""
    base = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed ^ 0xD120), step)
    idx = (jax.lax.axis_index(DATA_AXIS) * local_batch
           + jnp.arange(local_batch))
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base, idx)


def make_optimizer_noclip(tcfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW without the global-norm clip (applied manually in the TP step,
    where the norm needs a model-axis psum optax cannot express)."""
    return optax.adamw(make_lr_schedule(tcfg), weight_decay=tcfg.weight_decay)


def _init_ema(params, tcfg: TrainConfig):
    """EMA starts as a copy of the (possibly sharded) params — same
    rule as train.loop.init_train_state; None when off so the
    checkpoint layout is unchanged."""
    return (jax.tree.map(jnp.copy, params) if tcfg.ema_decay > 0 else None)


def init_tp_train_state(key, cfg: TransducerConfig, tcfg: TrainConfig,
                        mp: int) -> TrainState:
    params = split_params_tp(m.init_params(key, cfg), cfg, mp)
    tx = make_optimizer_noclip(tcfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=_init_ema(params, tcfg))


def init_sp_train_state(key, cfg: TransducerConfig,
                        tcfg: TrainConfig) -> TrainState:
    """Replicated-params state for mode="sp" (noclip optimizer layout)."""
    params = m.init_params(key, cfg)
    tx = make_optimizer_noclip(tcfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=_init_ema(params, tcfg))


def make_tp_train_step(cfg: TransducerConfig, tcfg: TrainConfig, mesh: Mesh,
                       mode: str = "tp", loss_kind: str = "rnnt",
                       teacher_cfg=None):
    """Jitted update step over a (data, model) mesh.

    mode="tp": TPParams state (gate-sharded LSTMs + vocab-parallel loss).
    mode="sp": plain replicated params, frame-sharded joint+loss.
    mode="ep": TPParams state (expert-sharded MoE joint, frame-sharded
    lattice; cfg.joint_experts > 0).
    Batches are sharded over "data" and replicated over "model".
    loss_kind="ctc" builds the CTC-pretraining phase step (auxiliary
    encoder head; same state/optimizer layout, so train.py swaps
    between the phase steps freely). loss_kind="mwer" (mode="sp" only —
    params replicated, so the in-step beam search runs identically on
    every shard) builds the MWER fine-tuning phase step.

    Distillation (tcfg.distill_weight > 0, needs teacher_cfg) and
    alignment-restricted training (tcfg.ar_range > 0; teacher_cfg only
    with an aligner checkpoint) are supported for mode="sp"/"tp": the
    teacher/aligner params ride the step as an extra traced argument,
    replicated over BOTH mesh axes (in_spec P()), exactly like the dp
    step in train/loop.py. "ep" routes the joint through MoE experts,
    which neither objective models; "pp" is built in
    parallel/pipeline.py (stage-sliced params cannot host a replicated
    teacher forward without assembling the full lattice on every stage).
    """
    from rnn_transducer_tpu.train.loop import (check_ar_compat,
                                               check_distill_compat)

    assert mode in ("tp", "sp", "ep"), mode
    assert loss_kind in ("rnnt", "ctc", "mwer"), loss_kind
    if tcfg.grad_accum > 1:
        # the manual clip-then-update sequence below applies the optimizer
        # every step; silently dropping the accumulation would train at the
        # wrong effective batch (cf. the weight-noise ADVICE fix)
        raise ValueError("grad_accum > 1 is not supported by the "
                         "model-parallel train steps; grow the data axis "
                         "or the per-shard batch instead")
    if loss_kind == "mwer":
        assert mode == "sp", "MWER needs replicated params (mode='sp')"
    if tcfg.loss_impl == "pruned" and loss_kind == "rnnt":
        assert mode in ("sp", "tp"), (
            "the pruned loss under model parallelism requires mode='sp' "
            "(frame-sharded band) or mode='tp' (vocab-sharded band)")
    distilling = loss_kind == "rnnt" and tcfg.distill_weight > 0.0
    ar = loss_kind == "rnnt" and tcfg.ar_range > 0
    if distilling:
        if ar:
            raise ValueError("ar_range and distill_weight are mutually "
                             "exclusive (one teacher slot)")
        if teacher_cfg is None:
            raise ValueError("distill_weight > 0 needs teacher_cfg (and "
                             "the step must be called with teacher_params)")
        if mode not in ("sp", "tp"):
            raise ValueError("distillation under model parallelism "
                             "requires mode='sp' or 'tp'")
        check_distill_compat(cfg, teacher_cfg, tcfg)
    if ar:
        if mode not in ("sp", "tp"):
            raise ValueError("alignment-restricted training under model "
                             "parallelism requires mode='sp' or 'tp'")
        if tcfg.loss_impl not in ("auto", "ar"):
            raise ValueError("ar_range > 0 trains with loss_impl='auto'|"
                             f"'ar' (got {tcfg.loss_impl!r})")
        if teacher_cfg is not None:
            check_ar_compat(cfg, teacher_cfg)
    uses_teacher = distilling or (ar and teacher_cfg is not None)
    mp = mesh.shape[MODEL_AXIS]
    tx = make_optimizer_noclip(tcfg)
    is_tp = mode in ("tp", "ep")  # TPParams state layout + shd grad rules

    def shard_fn(state, feats, feat_lens, labels, label_lens,
                 teacher_params=None):
        local = _tp_squeeze(state) if is_tp else state
        fe = tcfg.fastemit_lambda
        has_do = tcfg.dropout > 0.0 or tcfg.embed_dropout > 0.0
        do = dict(dropout=tcfg.dropout, embed_dropout=tcfg.embed_dropout,
                  rngs=(dropout_rngs(tcfg, local.step, feats.shape[0])
                        if has_do else None),
                  ctc_weight=tcfg.ctc_weight)
        if loss_kind == "mwer":
            from rnn_transducer_tpu.train.mwer import mwer_loss_fn

            def batch_loss(p):
                return mwer_loss_fn(p, cfg, feats, feat_lens, labels,
                                    label_lens, beam=tcfg.mwer_beam,
                                    expansions=tcfg.mwer_expansions,
                                    max_symbols=tcfg.mwer_max_symbols,
                                    nll_weight=tcfg.mwer_nll_weight)
        elif loss_kind == "ctc":
            if mode == "tp":
                def batch_loss(p):
                    return tp_ctc_loss_fn(_local_view(p), cfg, feats,
                                          feat_lens, labels, label_lens)
            elif mode == "ep":
                def batch_loss(p):
                    rep = {k: v for k, v in p.rep.items()
                           if k != "moe_router"}
                    return rep_ctc_loss_fn(rep, cfg, feats, feat_lens,
                                           labels, label_lens)
            else:
                def batch_loss(p):
                    return rep_ctc_loss_fn(p, cfg, feats, feat_lens,
                                           labels, label_lens)
        elif distilling:
            kd = dict(distill_weight=tcfg.distill_weight,
                      distill_temp=tcfg.distill_temp, dropout=tcfg.dropout,
                      embed_dropout=tcfg.embed_dropout, rngs=do["rngs"])
            if mode == "tp":
                def batch_loss(p):
                    return tp_distill_loss_fn(
                        _local_view(p), cfg, teacher_params, teacher_cfg,
                        feats, feat_lens, labels, label_lens, **kd)
            else:
                def batch_loss(p):
                    return sp_distill_loss_fn(
                        p, cfg, teacher_params, teacher_cfg, feats,
                        feat_lens, labels, label_lens, **kd)
        elif ar:
            arkw = dict(ar_range=tcfg.ar_range, ar_left=tcfg.ar_left,
                        fastemit=fe, **do)
            if mode == "tp":
                def batch_loss(p):
                    return tp_ar_loss_fn(
                        _local_view(p), cfg, teacher_params, teacher_cfg,
                        feats, feat_lens, labels, label_lens, **arkw)
            else:
                def batch_loss(p):
                    return sp_ar_loss_fn(
                        p, cfg, teacher_params, teacher_cfg, feats,
                        feat_lens, labels, label_lens, **arkw)
        elif mode == "tp":
            if tcfg.loss_impl == "pruned":
                def batch_loss(p):
                    return tp_pruned_loss_fn(
                        _local_view(p), cfg, feats, feat_lens, labels,
                        label_lens, fastemit=fe,
                        simple_loss_scale=tcfg.simple_loss_scale, **do)
            else:
                def batch_loss(p):
                    return tp_loss_fn(_local_view(p), cfg, feats, feat_lens,
                                      labels, label_lens, fastemit=fe, **do)
        elif mode == "ep":
            def batch_loss(p):
                return ep_loss_fn(p, cfg, feats, feat_lens, labels,
                                  label_lens, fastemit=fe, **do)
        elif tcfg.loss_impl == "pruned":
            def batch_loss(p):
                return sp_pruned_loss_fn(
                    p, cfg, feats, feat_lens, labels, label_lens,
                    fastemit=fe,
                    simple_loss_scale=tcfg.simple_loss_scale, **do)
        else:
            def batch_loss(p):
                return sp_loss_fn(p, cfg, feats, feat_lens, labels,
                                  label_lens, fastemit=fe, **do)
        loss_params = local.params
        if tcfg.weight_noise_std > 0.0:
            loss_params = apply_weight_noise(local.params, tcfg, local.step,
                                             model_sharded=is_tp)
        (loss, _), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            loss_params)
        if is_tp:
            grads = _combine_model_grads(grads, mp)
        else:
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, MODEL_AXIS),
                                 grads)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, DATA_AXIS), grads)
        # Manual global-norm clip + non-finite step guard (mirrors
        # train.loop.make_train_step's semantics).
        gnorm = _tp_global_norm(grads, is_tp)
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
            # params are already ok-selected; on a skipped step keep the
            # old EMA (matches train.loop's cond semantics)
            ema = jax.tree.map(
                lambda e, q: jnp.where(ok, d * e + (1.0 - d) * q, e),
                local.ema, params)
        new_local = TrainState(params=params, opt_state=opt_state,
                               step=local.step + 1, ema=ema)
        new_state = _tp_expand(new_local) if is_tp else new_local
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "skipped_nonfinite": (~ok).astype(jnp.int32)}

    if is_tp:
        init = init_tp_train_state if mode == "tp" else init_ep_train_state
        state_ex = jax.eval_shape(
            lambda: init(jax.random.PRNGKey(0), cfg, tcfg, mp))
        state_spec = tp_specs(state_ex)
    else:
        state_spec = TrainState(params=P(), opt_state=P(), step=P())
    batch_spec = P(DATA_AXIS)
    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, batch_spec, batch_spec,
                  batch_spec) + ((P(),) if uses_teacher else ()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_tp_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place a TPParams TrainState on the mesh (stacked leaves over the
    model axis, everything else replicated)."""
    specs = tp_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def shard_batch_2d(mesh: Mesh, batch):
    """Batch: leading dim sharded over "data", replicated over "model"."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
