"""Mixture-of-Experts FFN over lattice tokens (top-1 / Switch routing).

An optional capacity extension of the joint network (SpeechMoE-style):
every (t, u) lattice cell's joint activation is routed to one of E expert
FFNs, so parameter count scales with E while per-token FLOPs stay constant.
This is also the framework's expert-parallelism axis: experts shard across
the "model" mesh axis and tokens move via `all_to_all` (parallel/tp.py
"ep" mode).

Three implementations, exactness-ordered:
  * `moe_dense`    — every expert on every token, mask-combine. E× FLOPs;
                     the correctness reference.
  * `moe_top1`     — dispatch/combine through a static (E, C, D) capacity
                     buffer; tokens over an expert's capacity are dropped
                     (identity via the residual connection). == moe_dense
                     when C >= N.
  * `moe_top1_ep`  — moe_top1 with experts sharded over a named mesh axis;
                     dispatch buffers exchange via two all_to_alls.

Routing is deterministic top-1 with the Switch-Transformer load-balance
auxiliary loss; the gate probability multiplies the expert output so the
router receives gradient.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_moe_params(key, n_experts: int, d_model: int, d_hidden: int):
    kr, k1, k2 = jax.random.split(key, 3)
    s0 = 1.0 / math.sqrt(d_model)
    s1 = 1.0 / math.sqrt(d_hidden)
    return {
        "router": jax.random.uniform(kr, (d_model, n_experts), jnp.float32,
                                     -s0, s0),
        "w1": jax.random.uniform(k1, (n_experts, d_model, d_hidden),
                                 jnp.float32, -s0, s0),
        "b1": jnp.zeros((n_experts, d_hidden), jnp.float32),
        "w2": jax.random.uniform(k2, (n_experts, d_hidden, d_model),
                                 jnp.float32, -s1, s1),
        "b2": jnp.zeros((n_experts, d_model), jnp.float32),
    }


def _router(params, x):
    """x: (N, D) -> (gate (N,), idx (N,), f (E,), P (E,)).

    f = fraction of tokens routed to each expert, P = mean router prob —
    the Switch load-balance statistics. Router math in fp32.
    """
    logits = jnp.dot(x.astype(jnp.float32), params["router"],
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (N, E)
    idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    gate = jnp.max(probs, axis=-1)
    E = probs.shape[-1]
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)
    return gate, idx, jnp.mean(onehot, axis=0), jnp.mean(probs, axis=0)


def router_top1(params, x):
    """x: (N, D) -> (gate (N,), idx (N,), aux scalar).

    aux is the Switch load-balance loss E * sum_e f_e * P_e; 1.0 at
    perfect balance.
    """
    gate, idx, f, P = _router(params, x)
    return gate, idx, f.shape[0] * jnp.sum(f * P)


def _expert_ffn(params, buf, cd):
    """buf: (E, C, D) -> (E, C, D), each expert's relu FFN on its slots."""
    h = jax.nn.relu(
        jnp.einsum("ecd,edm->ecm", buf.astype(cd), params["w1"].astype(cd),
                   preferred_element_type=jnp.float32)
        + params["b1"][:, None, :])
    return (jnp.einsum("ecm,emd->ecd", h.astype(cd), params["w2"].astype(cd),
                       preferred_element_type=jnp.float32)
            + params["b2"][:, None, :])


def moe_dense(params, x, *, compute_dtype=jnp.bfloat16):
    """Reference: compute every expert on every token, combine by gate mask.

    x: (N, D) -> ((N, D), aux). E× the FLOPs of the routed versions —
    exactness anchor for tests and fine for small E.
    """
    cd = jnp.dtype(compute_dtype)
    gate, idx, aux = router_top1(params, x)
    h = jax.nn.relu(
        jnp.einsum("nd,edm->nem", x.astype(cd), params["w1"].astype(cd),
                   preferred_element_type=jnp.float32)
        + params["b1"][None])
    y = (jnp.einsum("nem,emd->ned", h.astype(cd), params["w2"].astype(cd),
                    preferred_element_type=jnp.float32)
         + params["b2"][None])  # (N, E, D)
    E = params["b1"].shape[0]
    pick = jax.nn.one_hot(idx, E, dtype=jnp.float32) * gate[:, None]
    return jnp.einsum("ned,ne->nd", y, pick), aux


def _dispatch(x, idx, E: int, C: int):
    """Scatter tokens into a (E, C, D) capacity buffer.

    Returns (buf, pos, keep): pos = slot of token n in its expert's queue,
    keep = token made it under the capacity.
    """
    N = x.shape[0]
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.int32)  # (N, E)
    pos = jnp.take_along_axis(jnp.cumsum(onehot, axis=0) - 1,
                              idx[:, None], axis=1)[:, 0]  # (N,)
    keep = pos < C
    slot = jnp.where(keep, pos, 0)
    contrib = jnp.where(keep[:, None], x, 0.0)
    buf = jnp.zeros((E, C, x.shape[1]), x.dtype).at[idx, slot].add(contrib)
    return buf, slot, keep


def moe_top1(params, x, *, capacity_factor: float = 1.25,
             compute_dtype=jnp.bfloat16):
    """Top-1 routed MoE through a static capacity buffer.

    x: (N, D) -> ((N, D), aux). Per-expert capacity
    C = ceil(N * capacity_factor / E); overflow tokens contribute 0 (the
    joint applies MoE residually, so dropped = identity).
    """
    cd = jnp.dtype(compute_dtype)
    N, D = x.shape
    E = params["b1"].shape[0]
    C = max(1, math.ceil(N * capacity_factor / E))
    gate, idx, aux = router_top1(params, x)
    buf, slot, keep = _dispatch(x, idx, E, C)
    yb = _expert_ffn(params, buf, cd)  # (E, C, D)
    y = yb[idx, slot] * (gate * keep)[:, None]
    return y, aux


def moe_top1_ep(params_local, x, *, axis: str, n_shards: int,
                capacity_factor: float = 1.25, compute_dtype=jnp.bfloat16,
                stats_axes=None):
    """Expert-parallel moe_top1 inside shard_map.

    Each shard holds N_loc tokens and E_loc = E / n_shards experts
    (params_local: leading expert axis already sliced to E_loc; the router
    is replicated with all E columns). Dispatch buffers are built for all
    E experts locally, exchanged with `all_to_all` so shard m receives
    every peer's slice for ITS experts, run through the local expert FFNs,
    and sent back. The load-balance stats (f, P) are pmean-ed over
    `stats_axes` (default: the expert axis) BEFORE forming aux, so aux
    equals the single-device value over the union of tokens.
    """
    cd = jnp.dtype(compute_dtype)
    N, D = x.shape
    E_loc = params_local["b1"].shape[0]
    E = E_loc * n_shards
    C = max(1, math.ceil(N * capacity_factor / E))

    router = {"router": params_local["router"]}
    gate, idx, f, P = _router(router, x)
    for ax in (stats_axes or (axis,)):
        f, P = jax.lax.pmean(f, ax), jax.lax.pmean(P, ax)
    aux = E * jnp.sum(f * P)
    buf, slot, keep = _dispatch(x, idx, E, C)  # (E, C, D)

    # (E, C, D) -> (n_shards, E_loc, C, D); all_to_all: dim 0 scattered to
    # peers, received slices stacked on dim 0 (source shard).
    buf = buf.reshape(n_shards, E_loc, C, D)
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                              tiled=False)  # (n_shards, E_loc, C, D)
    flat = recv.transpose(1, 0, 2, 3).reshape(E_loc, n_shards * C, D)
    yb = _expert_ffn(params_local, flat, cd)
    yb = yb.reshape(E_loc, n_shards, C, D).transpose(1, 0, 2, 3)
    back = jax.lax.all_to_all(yb, axis, split_axis=0, concat_axis=0,
                              tiled=False)  # (n_shards, E_loc, C, D)
    yb = back.reshape(E, C, D)
    y = yb[idx, slot] * (gate * keep)[:, None]
    return y, aux
