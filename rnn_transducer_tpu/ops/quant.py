"""Post-training int8 weight quantization for inference/serving.

The decode path is memory-bound: at serving batch sizes the LSTM stacks
stream their weights from HBM (and the fused kernels hold W_hh resident
in VMEM), so weight BYTES — not FLOPs — set the step time. Symmetric
per-channel int8 storage halves the bf16 footprint (quarter of fp32):

    w ≈ q * scale,   q int8,  scale = amax(|w|, channel) / 127

Quantization is a LOAD-TIME transform (recognize.py/serve.py
`--quantize int8`): checkpoints stay fp32, training never sees it.
A quantized tree swaps every 2-D weight leaf for a `QTensor(q, scale)`
pytree node; `models/transducer.py` dequantizes at its public
entrypoints (`maybe_dequant_tree`), so every decode path — greedy,
beam, streaming, CTC, serving engines — works unchanged. Under jit the
dequant multiply is loop-invariant: XLA hoists it out of the decode
while_loops, so per call the weights cross HBM once as int8 plus one
compute-dtype materialization — strictly less traffic than the fp32
load + cast the unquantized path already pays.

Channel axes: matmul weights (in, out) scale per OUTPUT channel
(axis=-1); the embedding table (V, E) per ROW (axis=0) — rows are
gathered independently, so a hot token's outliers can't poison the
whole table. 1-D leaves (biases, LayerNorm) stay fp32 — they are
megabyte-irrelevant and precision-critical.

Error bound: |w - q*scale| <= scale/2 elementwise, i.e. a relative
half-step of 1/254 of each channel's max — measured WER-neutral on the
synthetic corpora (tests/test_quant.py trains to convergence and
asserts identical transcripts).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Symmetric per-channel int8 tensor: ``w ≈ q * scale`` (scale is
    broadcast-shaped, f32). A pytree node — rides through jit as two
    traced arrays."""
    q: jax.Array      # int8, w.shape
    scale: jax.Array  # float32, 1s everywhere except the channel axis


def quantize_tensor(w, channel_axis: int = -1) -> QTensor:
    """Symmetric int8 quantization with a scale per `channel_axis` slice."""
    w = jnp.asarray(w)
    axes = tuple(a for a in range(w.ndim)
                 if a != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QTensor(q=q.astype(jnp.int8), scale=scale)


def dequantize_tensor(qt: QTensor, dtype=jnp.float32):
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


def _is_q(x) -> bool:
    return isinstance(x, QTensor)


def quantize_params(params, *, min_size: int = 0):
    """Quantize every 2-D floating weight leaf of a model params tree.

    min_size: skip leaves with fewer elements (tiny projections gain
    nothing; 0 quantizes everything, which the tests use).
    """
    def walk(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim != 2:
            return leaf
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        if leaf.size < min_size:
            return leaf
        name = jax.tree_util.keystr(path[-1:]) if path else ""
        # embedding tables are row-gathered: scale per vocab row
        axis = 0 if "embed" in name else -1
        return quantize_tensor(leaf, channel_axis=axis)

    return jax.tree_util.tree_map_with_path(walk, params)


def maybe_dequant_tree(params, dtype=jnp.float32, *, keep=()):
    """Dequantize every QTensor leaf; identity for unquantized trees.

    Called at the model's public entrypoints so all decode paths accept
    quantized params. O(1) host check when nothing is quantized.

    keep: leaf names (dict keys) whose QTensors stay QUANTIZED — the
    encoder entrypoints keep "w_hh" so the fused Pallas LSTM can run its
    int8 kernel on the still-int8 recurrent weights (ops/lstm.py
    dequantizes them at use on the scan fallback).
    """
    leaves = jax.tree.leaves(params, is_leaf=_is_q)
    if not any(_is_q(x) for x in leaves):
        return params

    def walk(path, x):
        if not _is_q(x):
            return x
        name = jax.tree_util.keystr(path[-1:]) if path else ""
        if any(k in name for k in keep):
            return x
        return dequantize_tensor(x, dtype)

    return jax.tree_util.tree_map_with_path(walk, params, is_leaf=_is_q)


def quantized_bytes(params) -> tuple[int, int]:
    """(bytes_quantized_tree, bytes_fp32_tree) for reporting."""
    qb = fb = 0
    for leaf in jax.tree.leaves(params, is_leaf=_is_q):
        if _is_q(leaf):
            qb += leaf.q.size + leaf.scale.size * 4
            fb += leaf.q.size * 4
        else:
            qb += leaf.size * leaf.dtype.itemsize
            fb += leaf.size * 4
    return qb, fb
