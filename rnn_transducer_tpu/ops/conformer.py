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
    from rnn_transducer_tpu.ops.fused_ln import (fused_layer_norm,
                                                 fused_ln_enabled)
    if fused_ln_enabled(x.shape[-1]):
        return fused_layer_norm(x, p["g"], p["b"])
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]


def _ln_silu(p, x):
    """silu(LayerNorm(x)) — fused into one Pallas pass on TPU (the conv
    module's LN -> swish pair; same numerics as the two-op form)."""
    from rnn_transducer_tpu.ops.fused_ln import (fused_layer_norm,
                                                 fused_ln_enabled)
    if fused_ln_enabled(x.shape[-1]):
        return fused_layer_norm(x, p["g"], p["b"], "silu")
    return jax.nn.silu(_ln(p, x))


def _dense(p, x, cd, out_dtype=None):
    """f32-accumulated matmul + bias. out_dtype=cd emits the result in
    the compute dtype AT THE SOURCE — for activations whose only consumer
    casts to cd anyway (FFN/GLU hiddens, q/k/v) the f32 materialization
    between two fusions is pure HBM waste (measured: ~4.6 ms/step of
    elementwise loop fusions at B=32 libri100_conformer, about half of it
    these round trips). Bit-identical when cd == float32."""
    y = (jnp.dot(x.astype(cd), p["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + p["b"].astype(jnp.float32))
    return y.astype(out_dtype) if out_dtype is not None else y


def _ffn(p, x, cd):
    return _dense(p["out"],
                  jax.nn.silu(_dense(p["in"], x, cd, out_dtype=cd)), cd)


def _attend(p, q_in, kv_in, ages, key_ok, heads, cd):
    """Shared attention core. q_in: (B, Tq, D); kv_in: (B, Tk, D);
    ages: (Tq, Tk) signed query-key distance (query_pos - key_pos);
    key_ok: (B, Tq, Tk) or (B, 1, Tk) validity mask."""
    B, Tq, D = q_in.shape
    Tk = kv_in.shape[1]
    dh = D // heads
    q = _dense(p["q"], q_in, cd, out_dtype=cd).reshape(B, Tq, heads, dh)
    k = _dense(p["k"], kv_in, cd, out_dtype=cd).reshape(B, Tk, heads, dh)
    v = _dense(p["v"], kv_in, cd, out_dtype=cd).reshape(B, Tk, heads, dh)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (1.0 / math.sqrt(dh))
    rel = jnp.clip(ages, -REL_CLIP, REL_CLIP)
    logits = logits + p["rel"][:, rel + REL_CLIP][None]  # (1,H,Tq,Tk)
    logits = jnp.where(key_ok[:, None], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)  # f32 (softmax stays full precision)
    out = jnp.einsum("bhts,bshd->bthd", w.astype(cd), v,
                     preferred_element_type=jnp.float32).astype(cd)
    return _dense(p["o"], out.reshape(B, Tq, D), cd)


def _mhsa(p, x, lens, heads, cd, att_left: int = 0, chunk_att: int = 0):
    """Self-attention with clipped relative position bias; padded key
    positions are masked before the softmax. att_left > 0 restricts each
    query to the causal window [t - att_left, t] (the streamable
    configuration — ages outside [0, att_left] are masked).
    chunk_att = S > 0 selects CHUNKED attention instead: query t sees its
    whole S-frame chunk (in-chunk future included) plus att_left frames
    of left context measured from the chunk start — the lookahead
    streaming form (latency = S frames)."""
    B, T, D = x.shape
    t_ids = jnp.arange(T, dtype=jnp.int32)
    ages = t_ids[:, None] - t_ids[None, :]  # (T, T)
    key_ok = (t_ids[None, :] < lens.astype(jnp.int32)[:, None])[:, None, :]
    if chunk_att > 0:
        cs = (t_ids // chunk_att) * chunk_att  # chunk start per query
        win = ((t_ids[None, :] >= (cs - att_left)[:, None])
               & (t_ids[None, :] < (cs + chunk_att)[:, None]))
        key_ok = key_ok & win[None]
    elif att_left > 0:
        key_ok = key_ok & ((ages >= 0) & (ages <= att_left))[None]
    return _attend(p, x, x, ages, key_ok, heads, cd)


def _conv_module(p, x, lens, cd, causal: bool = False):
    """Pointwise-GLU -> depthwise conv -> LN -> swish -> pointwise.

    The GLU output is masked immediately before the depthwise conv —
    that is the only op whose window crosses frame boundaries, and the
    pointwise bias makes pad rows nonzero even for zeroed inputs, so
    masking the block input alone would still leak pads into the last
    valid frames."""
    B, T, D = x.shape
    h = _dense(p["pw1"], x, cd, out_dtype=cd)  # (B, T, 2D)
    h = h[..., :D] * jax.nn.sigmoid(h[..., D:])  # GLU, in cd
    h = mask_padding(h, lens)
    return _dw_and_out(p, h, cd, causal=causal)


def _dw_and_out(p, h, cd, causal: bool, valid_from: int = 0):
    """Depthwise conv + LN + swish + pointwise-out over GLU activations.

    causal pads K-1 zeros on the LEFT only (the streamable form — the
    chunked path swaps that zero pad for carried history); valid_from
    drops leading context frames from the output (chunked path)."""
    K = p["dw_w"].shape[0]
    # Depthwise conv as K statically-unrolled shifted multiply-adds, in
    # f32 (pure VPU work, 2*T*K*D flops). lax.conv_general_dilated with
    # feature_group_count=D lowers to a "convolution fusion" that costs
    # 1.06 ms for 47 MFLOP at (B=32, T=100, D=512, K=15) on v5e — 54% of
    # the conformer train step was depthwise convs (round-4 profile).
    # The unrolled tap sum fuses into one elementwise pass (~20 us HBM
    # bound) and its autodiff transpose is the same shape of pass.
    kern = p["dw_w"].astype(jnp.float32)  # (K, D)
    T = h.shape[1]
    lpad = K - 1 if causal else (K - 1) // 2
    hp = jnp.pad(h.astype(jnp.float32),
                 ((0, 0), (lpad, K - 1 - lpad), (0, 0)))
    h = p["dw_b"].astype(jnp.float32) + sum(
        hp[:, k:k + T, :] * kern[k][None, None, :] for k in range(K))
    if valid_from:
        h = h[:, valid_from:]
    h = _ln_silu(p["ln"], h)
    return _dense(p["pw2"], h, cd)


def conformer_block(p, x, lens, heads, cd, att_left: int = 0,
                    chunk_att: int = 0):
    """One offline block. att_left > 0 selects the causal/streamable
    form: windowed left-only attention + causal depthwise conv —
    bit-equal to the chunked conformer_block_chunk path. chunk_att > 0
    selects chunked (lookahead) attention instead; the conv module is
    causal in both streaming forms."""
    x = x + 0.5 * _ffn(p["ff1"], _ln(p["ln_ff1"], x), cd)
    x = x + _mhsa(p["att"], _ln(p["ln_att"], x), lens, heads, cd,
                  att_left=att_left, chunk_att=chunk_att)
    x = x + _conv_module(p["conv"], _ln(p["ln_conv"], x), lens, cd,
                         causal=att_left > 0 or chunk_att > 0)
    x = x + 0.5 * _ffn(p["ff2"], _ln(p["ln_ff2"], x), cd)
    return _ln(p["ln_out"], x)


# --------------------------- chunked/streaming ----------------------------

def init_block_cache(batch: int, d: int, att_left: int, conv_kernel: int):
    """Carried per-block state for chunked inference: the last att_left
    post-macaron frames (attention keys/values are functions of these)
    and the last conv_kernel-1 GLU activations (the causal depthwise
    window). Zeros + the n_seen validity mask reproduce the offline
    zero-padding exactly at stream start."""
    return {"attn": jnp.zeros((batch, att_left, d), jnp.float32),
            "conv": jnp.zeros((batch, conv_kernel - 1, d), jnp.float32)}


def conformer_block_chunk(p, x, cache, n_seen, chunk_lens, heads, cd,
                          att_left: int, chunk_att: int = 0):
    """One block over a chunk with carried history; ≡ the causal offline
    block on the concatenated stream (tested bit-for-bit).

    x: (B, C, D) chunk input; cache: init_block_cache pytree;
    n_seen: (B,) frames consumed BEFORE this chunk; chunk_lens: (B,)
    valid frames in this chunk (only the final chunk may be partial).
    Returns (out (B, C, D), new_cache).
    """
    B, C, D = x.shape
    W = att_left
    x1 = x + 0.5 * _ffn(p["ff1"], _ln(p["ln_ff1"], x), cd)
    # ---- attention over [history, chunk] ----
    kv_src = jnp.concatenate([cache["attn"], x1], axis=1)  # (B, W+C, D)
    kv_ln = _ln(p["ln_att"], kv_src)
    q_in = kv_ln[:, W:]
    i_ids = jnp.arange(C, dtype=jnp.int32)
    j_ids = jnp.arange(W + C, dtype=jnp.int32)
    ages = (W + i_ids)[:, None] - j_ids[None, :]  # (C, W+C)
    if chunk_att > 0:
        # chunked attention: query i sees its own S-chunk (in-chunk
        # future included) + W frames left of the chunk start. Requires
        # n_seen % S == 0 (encode_chunk asserts the chunk size), so
        # local chunk starts are the global ones.
        k_l = j_ids[None, :] - W  # key position in chunk coordinates
        cs = (i_ids // chunk_att) * chunk_att
        win_ok = ((k_l >= (cs - W)[:, None])
                  & (k_l < (cs + chunk_att)[:, None]))
    else:
        win_ok = (ages >= 0) & (ages <= W)
    # cache slot j holds global frame n_seen - W + j; chunk key j >= W is
    # valid up to chunk_lens
    exists = jnp.where(
        j_ids[None, :] < W,
        (n_seen.astype(jnp.int32)[:, None] - W + j_ids[None, :]) >= 0,
        (j_ids[None, :] - W) < chunk_lens.astype(jnp.int32)[:, None])
    key_ok = win_ok[None] & exists[:, None, :]  # (B, C, W+C)
    x2 = x1 + _attend(p["att"], q_in, kv_ln, ages, key_ok, heads, cd)
    # ---- conv module over [history GLU, chunk GLU] ----
    h = _dense(p["conv"]["pw1"], _ln(p["ln_conv"], x2), cd, out_dtype=cd)
    h = h[..., :D] * jax.nn.sigmoid(h[..., D:])
    h = mask_padding(h, chunk_lens)
    K = p["conv"]["dw_w"].shape[0]
    # f32 cache ++ cd chunk promotes to f32 == the offline tap sum's
    # h.astype(f32) on the same bf16 values — stream parity is exact
    h_cat = jnp.concatenate([cache["conv"], h.astype(jnp.float32)],
                            axis=1)  # (B, K-1+C, D)
    # VALID conv over the concatenation == causal conv on the stream
    conv_out = _dw_and_out({"dw_w": p["conv"]["dw_w"],
                            "dw_b": p["conv"]["dw_b"],
                            "ln": p["conv"]["ln"],
                            "pw2": p["conv"]["pw2"]},
                           h_cat, cd, causal=True, valid_from=K - 1)
    x3 = x2 + conv_out
    x4 = x3 + 0.5 * _ffn(p["ff2"], _ln(p["ln_ff2"], x3), cd)
    new_cache = {"attn": kv_src[:, -W:] if W else cache["attn"],
                 "conv": h_cat[:, h_cat.shape[1] - (K - 1):]}
    return _ln(p["ln_out"], x4), new_cache
