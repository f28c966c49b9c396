"""Conformer encoder blocks (Gulati et al. 2020) — pure XLA, TPU-first.

A second encoder family beside the stacked LSTM (`TransducerConfig.
enc_type="conformer"`). Where the LSTM's sequential recurrence caps MXU
occupancy at the batch dimension, the conformer is matmul-dense over the
whole (B, T) plane — attention and FFN matmuls tile natively onto the
MXU with no per-step serialization, so it is the throughput-oriented
choice for offline/bidirectional recognition.

Per block (macaron order): half-FFN -> MHSA (T5-style learned relative
position bias, clipped at +/-`REL_CLIP` frames) -> conv module
(pointwise-GLU -> depthwise -> pointwise) -> half-FFN -> final LN.
Design deviations from the paper, chosen for TPU/JAX cleanliness and
documented here:

* relative position: a learned per-head bias table indexed by the
  clipped signed distance (T5 style) instead of Transformer-XL's shifted
  content/position matmuls — one gather + add, no extra matmuls, exact
  masking.
* the conv module normalizes with LayerNorm over channels, not
  BatchNorm: no running statistics in the param tree, identical
  train/eval behavior, and no cross-utterance coupling under DP.

Variable lengths: attention masks padded KEY positions to -inf before
the softmax, and every block's output is re-masked, so padded frames
never influence valid ones — tests pin exact pad-length invariance.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.ops.lstm import mask_padding

NEG_INF = -1.0e30
REL_CLIP = 64  # max relative distance the position bias distinguishes


def _linear(key, din, dout):
    k = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (din, dout), jnp.float32, -k, k),
            "b": jax.random.uniform(kb, (dout,), jnp.float32, -k, k)}


def _ln_params(d):
    return {"g": jnp.ones((d,), jnp.float32),
            "b": jnp.zeros((d,), jnp.float32)}


def init_conformer_block(key, d: int, heads: int, ff_mult: int,
                         conv_kernel: int):
    ks = jax.random.split(key, 12)
    dh = d // heads
    assert d % heads == 0, f"d_model {d} % heads {heads} != 0"
    return {
        "ln_ff1": _ln_params(d), "ln_att": _ln_params(d),
        "ln_conv": _ln_params(d), "ln_ff2": _ln_params(d),
        "ln_out": _ln_params(d),
        "ff1": {"in": _linear(ks[0], d, ff_mult * d),
                "out": _linear(ks[1], ff_mult * d, d)},
        "ff2": {"in": _linear(ks[2], d, ff_mult * d),
                "out": _linear(ks[3], ff_mult * d, d)},
        "att": {"q": _linear(ks[4], d, d), "k": _linear(ks[5], d, d),
                "v": _linear(ks[6], d, d), "o": _linear(ks[7], d, d),
                # T5-style learned relative position bias per head
                "rel": jax.random.normal(ks[8], (heads, 2 * REL_CLIP + 1),
                                         jnp.float32) * 0.02},
        "conv": {"pw1": _linear(ks[9], d, 2 * d),  # GLU halves it back
                 "dw_w": jax.random.normal(ks[10], (conv_kernel, d),
                                           jnp.float32)
                 * (1.0 / math.sqrt(conv_kernel)),
                 "dw_b": jnp.zeros((d,), jnp.float32),
                 "ln": _ln_params(d),
                 "pw2": _linear(ks[11], d, d)},
    }


def _ln(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]


def _dense(p, x, cd):
    return (jnp.dot(x.astype(cd), p["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + p["b"].astype(jnp.float32))


def _ffn(p, x, cd):
    return _dense(p["out"], jax.nn.silu(_dense(p["in"], x, cd)), cd)


def _mhsa(p, x, lens, heads, cd):
    """Full self-attention with clipped relative position bias; padded
    key positions are masked before the softmax."""
    B, T, D = x.shape
    dh = D // heads
    split = lambda y: y.reshape(B, T, heads, dh)
    q = split(_dense(p["q"], x, cd))
    k = split(_dense(p["k"], x, cd))
    v = split(_dense(p["v"], x, cd))
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(cd), k.astype(cd),
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(dh))
    t_ids = jnp.arange(T, dtype=jnp.int32)
    rel = jnp.clip(t_ids[:, None] - t_ids[None, :], -REL_CLIP, REL_CLIP)
    logits = logits + p["rel"][:, rel + REL_CLIP][None]  # (1,H,T,T)
    key_valid = t_ids[None, :] < lens.astype(jnp.int32)[:, None]  # (B, T)
    logits = jnp.where(key_valid[:, None, None, :], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", w.astype(cd), v.astype(cd),
                     preferred_element_type=jnp.float32)
    return _dense(p["o"], out.reshape(B, T, D), cd)


def _conv_module(p, x, lens, cd):
    """Pointwise-GLU -> depthwise conv (SAME) -> LN -> swish -> pointwise.

    The GLU output is masked immediately before the depthwise conv —
    that is the only op whose window crosses frame boundaries, and the
    pointwise bias makes pad rows nonzero even for zeroed inputs, so
    masking the block input alone would still leak pads into the last
    valid frames."""
    B, T, D = x.shape
    h = _dense(p["pw1"], x, cd)  # (B, T, 2D)
    h = h[..., :D] * jax.nn.sigmoid(h[..., D:])  # GLU
    h = mask_padding(h, lens)
    # depthwise conv in f32: it is VPU work (2*T*K*D flops, no MXU win
    # from bf16) and mixed-dtype operands break the conv transpose rule
    kern = p["dw_w"].astype(jnp.float32)[:, None, :]  # (K, 1, D) WIO
    h = jax.lax.conv_general_dilated(
        h, kern, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=D) + p["dw_b"].astype(jnp.float32)
    h = jax.nn.silu(_ln(p["ln"], h))
    return _dense(p["pw2"], h, cd)


def conformer_block(p, x, lens, heads, cd):
    x = x + 0.5 * _ffn(p["ff1"], _ln(p["ln_ff1"], x), cd)
    x = x + _mhsa(p["att"], _ln(p["ln_att"], x), lens, heads, cd)
    x = x + _conv_module(p["conv"], _ln(p["ln_conv"], x), lens, cd)
    x = x + 0.5 * _ffn(p["ff2"], _ln(p["ln_ff2"], x), cd)
    return _ln(p["ln_out"], x)
