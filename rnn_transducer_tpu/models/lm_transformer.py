"""Transformer (decoder-only) language model for shallow fusion and
N-best rescoring — the higher-capacity alternative to the LSTM LM
(models/lm.py) with the SAME consumer contract: `models.lm.lm_step` /
`init_lm_state` / `lm_forward` dispatch here when given a
`TransformerLMConfig`, so beam fusion, streaming, serving and rescoring
take a transformer LM with zero changes.

TPU-first decisions:
  * Training/scoring is one full causal-attention pass (big batched
    matmuls on the MXU; no recurrence).
  * The per-step decode state is a fixed-size KV cache per layer
    (B, max_len, H, Dh) plus a per-example position counter — static
    shapes, so the beam-search carry machinery (gather/merge over the
    beam axis) moves it around like any other state leaf. Writes land
    at per-example positions via a one-hot select (no dynamic scatter,
    which would force aliasing through the jit boundary).
  * Pre-LN blocks: x + MHSA(LN(x)), x + FFN(LN(x)), final LN -> logits.
    Learned absolute positions (max_len must cover max_symbols).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 32
    d_model: int = 128
    heads: int = 4
    layers: int = 2
    ff_mult: int = 4
    # KV-cache capacity for step-wise decoding; must be >= the decoder's
    # max_symbols (positions past max_len clamp — never reached when
    # sized correctly).
    max_len: int = 512
    compute_dtype: str = "bfloat16"
    # Storage dtype of the step-decode KV caches. In beam fusion the
    # caches ride the beam carry and are re-gathered by source beam on
    # every expansion round — the dominant HBM cost of transformer-LM
    # fusion (docs/PERFORMANCE.md: ~90x plain beam). "bfloat16" halves
    # that traffic (cache reindex + rewrite + attention reads); scores
    # still accumulate in f32 after the upcast, so only the storage
    # rounding differs. Default stays exact f32.
    cache_dtype: str = "float32"

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def cache_dt(self):
        return jnp.dtype(self.cache_dtype)

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.heads == 0
        return self.d_model // self.heads


def _init_linear(key, n_in, n_out):
    kw, kb = jax.random.split(key)
    s = 1.0 / math.sqrt(n_in)
    return {"w": jax.random.uniform(kw, (n_in, n_out), jnp.float32, -s, s),
            "b": jax.random.uniform(kb, (n_out,), jnp.float32, -s, s)}


def _init_ln(d):
    return {"g": jnp.ones((d,), jnp.float32),
            "b": jnp.zeros((d,), jnp.float32)}


def init_transformer_lm_params(key, cfg: TransformerLMConfig) -> Params:
    ke, kp, kb, ko = jax.random.split(key, 4)
    d, ff = cfg.d_model, cfg.d_model * cfg.ff_mult
    blocks = []
    for kblk in jax.random.split(kb, cfg.layers):
        k1, k2, k3, k4 = jax.random.split(kblk, 4)
        blocks.append({
            "ln1": _init_ln(d), "qkv": _init_linear(k1, d, 3 * d),
            "att_out": _init_linear(k2, d, d),
            "ln2": _init_ln(d), "ff1": _init_linear(k3, d, ff),
            "ff2": _init_linear(k4, ff, d),
        })
    return {
        "embed": jax.random.normal(ke, (cfg.vocab_size, cfg.d_model))
        * (1.0 / math.sqrt(cfg.d_model)),
        "pos": jax.random.normal(kp, (cfg.max_len, cfg.d_model)) * 0.02,
        "blocks": blocks,
        "ln_f": _init_ln(d),
        "out": _init_linear(ko, d, cfg.vocab_size),
    }


def _ln(p, x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]


def _linear(p, x, cd):
    return (jnp.dot(x.astype(cd), p["w"].astype(cd),
                    preferred_element_type=jnp.float32)
            + p["b"].astype(jnp.float32))


def transformer_lm_forward(params: Params, cfg: TransformerLMConfig,
                           tokens_in):
    """tokens_in: (B, U) input ids (already BOS-shifted) -> next-token
    logits (B, U, V) via one full causal-attention pass."""
    B, U = tokens_in.shape
    cd, H, Dh = cfg.cdtype, cfg.heads, cfg.head_dim
    x = params["embed"][tokens_in] + params["pos"][:U]
    causal = jnp.tril(jnp.ones((U, U), jnp.bool_))
    for blk in params["blocks"]:
        h = _ln(blk["ln1"], x)
        qkv = _linear(blk["qkv"], h, cd).reshape(B, U, 3, H, Dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(Dh)
        scores = jnp.where(causal[None, None], scores, -1e30)
        att = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, U, -1)
        x = x + _linear(blk["att_out"], ctx, cd)
        h = _ln(blk["ln2"], x)
        x = x + _linear(blk["ff2"], jax.nn.gelu(_linear(blk["ff1"], h, cd)),
                        cd)
    return _linear(params["out"], _ln(params["ln_f"], x), cd)


def init_transformer_lm_state(cfg: TransformerLMConfig, batch: int):
    """Step-decode carry: per-layer KV caches + per-example position."""
    H, Dh = cfg.heads, cfg.head_dim
    cdt = cfg.cache_dt
    return {
        "pos": jnp.zeros((batch,), jnp.int32),
        "kv": [{"k": jnp.zeros((batch, cfg.max_len, H, Dh), cdt),
                "v": jnp.zeros((batch, cfg.max_len, H, Dh), cdt)}
               for _ in range(cfg.layers)],
    }


def transformer_lm_step(params: Params, cfg: TransformerLMConfig, token,
                        state):
    """One decode step: token (B,) -> (next-token log-probs (B, V),
    state'). Matches transformer_lm_forward position by position (the
    step≡batch test pins it)."""
    B = token.shape[0]
    cd, H, Dh = cfg.cdtype, cfg.heads, cfg.head_dim
    pos = jnp.minimum(state["pos"], cfg.max_len - 1)  # (B,)
    x = params["embed"][token] + params["pos"][pos]  # (B, d)
    write = jax.nn.one_hot(pos, cfg.max_len, dtype=jnp.bool_)  # (B, L)
    # key j is attendable iff j <= pos (self included after the write)
    attend = (jnp.arange(cfg.max_len)[None, :]
              <= pos[:, None])  # (B, L)
    new_kv = []
    for blk, cache in zip(params["blocks"], state["kv"]):
        h = _ln(blk["ln1"], x)
        qkv = _linear(blk["qkv"], h, cd).reshape(B, 3, H, Dh)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        cdt = cache["k"].dtype
        kc = jnp.where(write[:, :, None, None], k[:, None].astype(cdt),
                       cache["k"])
        vc = jnp.where(write[:, :, None, None], v[:, None].astype(cdt),
                       cache["v"])
        new_kv.append({"k": kc, "v": vc})
        scores = jnp.einsum("bhd,bkhd->bhk", q, kc) / math.sqrt(Dh)
        scores = jnp.where(attend[:, None], scores, -1e30)
        att = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhk,bkhd->bhd", att, vc).reshape(B, -1)
        x = x + _linear(blk["att_out"], ctx, cd)
        h = _ln(blk["ln2"], x)
        x = x + _linear(blk["ff2"], jax.nn.gelu(_linear(blk["ff1"], h, cd)),
                        cd)
    logits = _linear(params["out"], _ln(params["ln_f"], x), cd)
    new_state = {"pos": state["pos"] + 1, "kv": new_kv}
    return jax.nn.log_softmax(logits, axis=-1), new_state
