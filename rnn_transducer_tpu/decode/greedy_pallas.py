"""Fully on-chip greedy RNN-T decoding — alternative latency path.

Runs the ENTIRE decode loop inside one Pallas program: prediction-network
weights, embedding table, joint projections and the encoder-side
activations all sit in VMEM; each loop step is a handful of (1, H)
matmul/VPU ops. One grid step decodes one utterance.

Measured outcome (v5e, T=500, greedy_smoke config): 0.55 ms/utterance vs
0.37 ms for the lock-step `lax.while_loop` decoder (decode/greedy.py) —
XLA already compiles the decode loop into a single on-device loop with no
per-step dispatch, and its elementwise fusion beats this kernel's
hand-rolled step. Kept as a tested alternative and as the template for
future decoder-side fusions (e.g. batched-beam inner products), not wired
as a default. Requires lane-aligned dims (E, H, 4H, J multiples of 128;
vocab padded internally) and a single-layer prediction network
(`supported()`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig

LANE = 128
NEG_INF = -1.0e30


def supported(cfg: TransducerConfig) -> bool:
    return (cfg.pred_layers == 1
            and cfg.embed_dim % LANE == 0
            and cfg.pred_hidden % LANE == 0
            and cfg.joint_dim % LANE == 0)


def _cell(e, h, c, wih_ref, whh_ref, b_ref, cdtype):
    H = h.shape[1]
    gates = (jnp.dot(e.astype(cdtype), wih_ref[:],
                     preferred_element_type=jnp.float32)
             + jnp.dot(h.astype(cdtype), whh_ref[:],
                       preferred_element_type=jnp.float32)
             + b_ref[0][None, :])
    i_ = jax.nn.sigmoid(gates[:, 0:H])
    f_ = jax.nn.sigmoid(gates[:, H:2 * H])
    g_ = jnp.tanh(gates[:, 2 * H:3 * H])
    o_ = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = f_ * c + i_ * g_
    h_new = o_ * jnp.tanh(c_new)
    return h_new, c_new


def _greedy_kernel(T, U_max, blank, cdtype,
                   f_ref, t_len, embed_ref, wih_ref, whh_ref, b_ref,
                   wp_ref, bp_ref, wo_ref, bo_ref, toks_ref):
    H = whh_ref.shape[0]
    Vp = wo_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Vp), 1)

    toks_ref[:] = jnp.full(toks_ref.shape, blank, jnp.int32)

    def pred_step(k, h, c):
        e = embed_ref[pl.ds(k, 1), :]  # (1, E)
        h, c = _cell(e, h, c, wih_ref, whh_ref, b_ref, cdtype)
        g = (jnp.dot(h.astype(cdtype), wp_ref[:],
                     preferred_element_type=jnp.float32)
             + bp_ref[0][None, :])
        return g, h, c

    h0 = jnp.zeros((1, H), jnp.float32)
    g0, h0, c0 = pred_step(blank, h0, jnp.zeros((1, H), jnp.float32))

    def body(i, carry):
        t, u, h, c, g = carry
        done = jnp.logical_or(t >= t_len, u >= U_max)
        t_safe = jnp.minimum(t, jnp.maximum(t_len - 1, 0))
        f_t = f_ref[0, pl.ds(t_safe, 1), :]  # (1, J)
        z = jnp.tanh(f_t + g)
        logits = (jnp.dot(z.astype(cdtype), wo_ref[:],
                          preferred_element_type=jnp.float32)
                  + bo_ref[0][None, :])  # (1, Vp)
        mx = jnp.max(logits)
        k = jnp.min(jnp.where(logits == mx, col, Vp)).astype(jnp.int32)
        emit = jnp.logical_and(k != blank, jnp.logical_not(done))

        @pl.when(emit)
        def _():
            toks_ref[pl.ds(u, 1), :] = jnp.full((1, 1), k, jnp.int32)

        g_new, h_new, c_new = pred_step(k, h, c)
        pick = lambda new, old: jnp.where(emit, new, old)
        h = pick(h_new, h)
        c = pick(c_new, c)
        g = pick(g_new, g)
        u = u + emit.astype(jnp.int32)
        adv = jnp.logical_and(k == blank, jnp.logical_not(done))
        t = t + adv.astype(jnp.int32)
        return (t, u, h, c, g)

    jax.lax.fori_loop(0, T + U_max,  body,
                      (jnp.int32(0), jnp.int32(0), h0, c0, g0))


def greedy_decode_fused(params, cfg: TransducerConfig, enc_out, enc_lens,
                        max_symbols: int = 200):
    """Latency-path greedy decode. Same outputs as greedy.greedy_decode's
    first two results (tokens (B, U_max), lengths (B,))."""
    assert supported(cfg), "use decode.greedy for non-aligned configs"
    from rnn_transducer_tpu.ops.quant import maybe_dequant_tree
    params = maybe_dequant_tree(params)  # int8 serving params
    B, T, De = enc_out.shape
    jp = params["joint"]
    cd = cfg.cdtype
    f = (jnp.dot(enc_out.astype(cd), jp["enc_proj"]["w"].astype(cd),
                 preferred_element_type=jnp.float32)
         + jp["enc_proj"]["b"].astype(jnp.float32))  # (B, T, J)
    layer = params["predictor"][0]
    V = cfg.vocab_size
    Vp = -(-V // LANE) * LANE
    wo = jnp.pad(jp["out"]["w"].astype(jnp.float32),
                 ((0, 0), (0, Vp - V)))
    bo = jnp.pad(jp["out"]["b"].astype(jnp.float32).reshape(1, V),
                 ((0, 0), (0, Vp - V)), constant_values=NEG_INF)
    U_max = max_symbols
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # enc_lens
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, f.shape[-1]), lambda b, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # embed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_ih
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pred_proj w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pred_proj b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # out w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # out b
        ],
        out_specs=pl.BlockSpec((U_max, 1), lambda b, lens: (b, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel(lens_ref, f_ref, embed_ref, wih_ref, whh_ref, b_ref,
               wp_ref, bp_ref, wo_ref, bo_ref, toks_ref):
        b_idx = pl.program_id(0)
        _greedy_kernel(T, U_max, cfg.blank, cd,
                       f_ref, lens_ref[b_idx], embed_ref, wih_ref,
                       whh_ref, b_ref, wp_ref, bp_ref, wo_ref, bo_ref,
                       toks_ref)

    toks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * U_max, 1), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(enc_lens.astype(jnp.int32), f,
      params["embed"].astype(jnp.float32),
      layer["w_ih"].astype(jnp.float32),
      layer["w_hh"].astype(jnp.float32),
      layer["b"].astype(jnp.float32).reshape(1, -1),
      jp["pred_proj"]["w"].astype(jnp.float32),
      jp["pred_proj"]["b"].astype(jnp.float32).reshape(1, -1),
      wo, bo)
    tokens = toks.reshape(B, U_max)
    lengths = jnp.sum((tokens != cfg.blank).astype(jnp.int32), axis=1)
    return tokens, lengths


def recognize_greedy_fused(params, cfg: TransducerConfig, feats, feat_lens,
                           max_symbols: int = 200):
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    return greedy_decode_fused(params, cfg, enc_out, enc_lens, max_symbols)
