"""LSTM language model over the output token vocabulary, for shallow
fusion with beam-search decoding.

The reference family decodes acoustics-only; external-LM shallow fusion
(score = log P_rnnt + lambda * log P_lm on label emissions) is the standard
accuracy lever on top of transducer beam search (PAPERS.md: "Pushing the
Limits of Beam Search Decoding"). Same pure-pytree style as the transducer:
embedding -> stacked LSTM -> vocab logits. BOS is `BOS_ID` (the blank id,
which never appears inside label sequences); every consumer — lm_forward,
the shallow-fusion init in decode/beam.py, rescoring — must feed the SAME
constant, or training and fusion would condition on different BOS tokens
(ADVICE r2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models.lm_transformer import (
    TransformerLMConfig,
    init_transformer_lm_params,
    init_transformer_lm_state,
    transformer_lm_forward,
    transformer_lm_step,
)
from rnn_transducer_tpu.ops.lstm import init_lstm_params, lstm_cell, lstm_layer

Params = dict[str, Any]

# The LM's beginning-of-sequence token. Kept a module constant so training
# (lm_forward), per-step shallow fusion (decode/beam.py) and rescoring all
# provably condition on the same id.
BOS_ID = 0


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 32
    embed_dim: int = 128
    hidden: int = 256
    layers: int = 1
    compute_dtype: str = "bfloat16"

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def init_lm_params(key, cfg) -> Params:
    if isinstance(cfg, TransformerLMConfig):
        return init_transformer_lm_params(key, cfg)
    ke, kl, kw, kb = jax.random.split(key, 4)
    layers = []
    in_dim = cfg.embed_dim
    for k in jax.random.split(kl, cfg.layers):
        layers.append(init_lstm_params(k, in_dim, cfg.hidden))
        in_dim = cfg.hidden
    s = 1.0 / math.sqrt(cfg.hidden)
    return {
        "embed": jax.random.normal(ke, (cfg.vocab_size, cfg.embed_dim)),
        "lstm": layers,
        "out": {
            "w": jax.random.uniform(kw, (cfg.hidden, cfg.vocab_size),
                                    jnp.float32, -s, s),
            "b": jax.random.uniform(kb, (cfg.vocab_size,),
                                    jnp.float32, -s, s),
        },
    }


def init_lm_state(cfg, batch: int):
    if isinstance(cfg, TransformerLMConfig):
        return init_transformer_lm_state(cfg, batch)
    return [(jnp.zeros((batch, cfg.hidden), jnp.float32),
             jnp.zeros((batch, cfg.hidden), jnp.float32))
            for _ in range(cfg.layers)]


def _out_logits(params: Params, cfg: LMConfig, x):
    return (jnp.dot(x.astype(cfg.cdtype),
                    params["out"]["w"].astype(cfg.cdtype),
                    preferred_element_type=jnp.float32)
            + params["out"]["b"].astype(jnp.float32))


def lm_forward(params: Params, cfg, labels):
    """Next-token logits over blank-prefixed labels.

    labels: (B, U) -> logits (B, U, V): position u predicts labels[:, u]
    from the prefix labels[:, :u] (u=0 conditions on BOS only).
    Dispatches to the transformer LM (models/lm_transformer.py) when cfg
    is a TransformerLMConfig.
    """
    B, U = labels.shape
    bos = jnp.full((B, 1), BOS_ID, labels.dtype)
    tokens_in = jnp.concatenate([bos, labels[:, :-1]], axis=1)
    if isinstance(cfg, TransformerLMConfig):
        return transformer_lm_forward(params, cfg, tokens_in)
    x = params["embed"][tokens_in]
    for layer in params["lstm"]:
        x, _ = lstm_layer(layer, x, compute_dtype=cfg.cdtype)
    return _out_logits(params, cfg, x)


def lm_step(params: Params, cfg, token, states):
    """One decode step: token (B,) int32 -> (next-token log-probs (B, V),
    new states). Feed `BOS_ID` for the first step."""
    if isinstance(cfg, TransformerLMConfig):
        return transformer_lm_step(params, cfg, token, states)
    x = params["embed"][token]
    new_states = []
    for layer, (h, c) in zip(params["lstm"], states):
        x_proj = (jnp.dot(x.astype(cfg.cdtype),
                          layer["w_ih"].astype(cfg.cdtype),
                          preferred_element_type=jnp.float32)
                  + layer["b"].astype(jnp.float32))
        h, c = lstm_cell(layer, x_proj, h, c, cfg.cdtype)
        new_states.append((h, c))
        x = h
    return jax.nn.log_softmax(_out_logits(params, cfg, x), axis=-1), new_states


def lm_sequence_logprob(params: Params, cfg, labels, label_lens):
    """Total log P_lm of each label sequence: (B, U), (B,) -> (B,)."""
    logits = lm_forward(params, cfg, labels)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(lp, labels[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]  # (B, U)
    U = labels.shape[1]
    valid = jnp.arange(U)[None, :] < label_lens[:, None]
    return jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=-1)


def rescore_nbest(lm_params, cfg, tokens, lens, am_scores, *,
                  weight: float, length_bonus: float = 0.0, extras=()):
    """Rerank an N-best list with one batched LM pass.

    The cheap alternative to per-step shallow fusion: tokens (B, K, U),
    lens (B, K), am_scores (B, K) -> (tokens, lens, scores) reordered by
    am + weight * log P_lm + length_bonus * len, best first. `extras` is
    a tuple of additional (B, K, ...) beam-aligned arrays (per-token
    timestamps, confidences, ...) reordered the same way and appended to
    the return tuple.
    """
    B, K, U = tokens.shape
    lm_lp = lm_sequence_logprob(lm_params, cfg, tokens.reshape(B * K, U),
                                lens.reshape(B * K)).reshape(B, K)
    total = am_scores + weight * lm_lp + length_bonus * lens
    order = jnp.argsort(-total, axis=-1)
    gather = lambda a: jnp.take_along_axis(
        a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1)
    return (gather(tokens),
            jnp.take_along_axis(lens, order, axis=1),
            jnp.take_along_axis(total, order, axis=1),
            *(gather(e) for e in extras))


def load_lm(ckpt_dir: str):
    """Restore (lm_params, LMConfig) from a tools/train_lm.py checkpoint."""
    import jax.random as jrandom

    from rnn_transducer_tpu.train import checkpoint as ckpt

    meta = ckpt.load_meta(ckpt_dir) or {}
    if "lm_config" not in meta:
        raise ValueError(f"{ckpt_dir}/meta.json has no lm_config — not an "
                         "LM checkpoint (tools/train_lm.py writes one)")
    lc = meta["lm_config"]
    # transformer checkpoints are recognizable by their config fields
    cfg = (TransformerLMConfig(**lc) if "d_model" in lc else LMConfig(**lc))
    target = {"params": init_lm_params(jrandom.PRNGKey(0), cfg)}
    tree, _ = ckpt.restore_checkpoint(ckpt_dir, target)
    return tree["params"], cfg


def lm_loss(params: Params, cfg, labels, label_lens):
    """Mean next-token NLL over valid positions (the LM training loss)."""
    logits = lm_forward(params, cfg, labels)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(lp, labels[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]  # (B, U)
    U = labels.shape[1]
    valid = (jnp.arange(U)[None, :] < label_lens[:, None])
    return -jnp.sum(jnp.where(valid, tok_lp, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1)
