"""Pallas TPU kernels for the RNN-T loss hot path.

Profiling (see git history / BENCH notes) shows the pure-XLA loss spends
nearly all its time in HBM traffic over the (B, T, U+1, V) logits: the
log-softmax materializes a second lattice-sized array, and the 1-element
blank/label gathers (and the scatter in the backward) are strided 4-byte
accesses. These kernels make exactly two streaming passes over the logits:

  * `extract_lp` (forward): one pass computing the row log-sum-exp and
    emitting ONLY lp_blank and lp_y — (B, T, U+1) each, ~1000x smaller than
    the log-softmax the XLA path materializes. The label gather is a
    one-hot compare + masked row-reduce (VPU-friendly; no strided gathers).
  * `assemble_grad` (backward): one pass recomputing the softmax in VMEM
    and fusing  probs * occ - onehot_blank * g_blank - onehot_label * g_y
    into the single grad write.

The (T+U)-step alpha/beta recursions run on the extracted (B, T, U+1)
arrays (~1 MB), which XLA handles well — the wavefront itself was never
the bottleneck; the lattice-sized memory traffic was.

This is the TPU-native equivalent of the reference's warp-rnnt CUDA
binding (SURVEY.md §2 row 5): the one native-kernel component of the
stack. Falls back to interpreter mode off-TPU so the same code path is
unit-tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnn_transducer_tpu.ops.rnnt_loss import (
    NEG_INF,
    forward_from_lp,
    occupancies_from_lp,
)

ROW_TILE = 256
LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_vocab(x, fill):
    V = x.shape[-1]
    Vp = -(-V // LANE) * LANE
    if Vp == V:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Vp - V)],
                   constant_values=fill)


def _row_labels(labels, B, T, U1, G):
    """Per-lattice-row label id; -1 where u == U (no emit). (G, ROW_TILE)."""
    lab = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.full((B, 1), -1, jnp.int32)], axis=1)  # (B, U1)
    rows = jnp.broadcast_to(lab[:, None, :], (B, T, U1)).reshape(-1)
    pad = G * ROW_TILE - rows.shape[0]
    rows = jnp.pad(rows, (0, pad), constant_values=-1)
    return rows.reshape(G, 1, ROW_TILE)


def _extract_kernel(blank, x_ref, lab_ref, lpb_ref, lpy_ref):
    x = x_ref[:].astype(jnp.float32)  # (ROW_TILE, Vp)
    m = jnp.max(x, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))
    base = (m + lse)[:, 0]  # (ROW_TILE,)
    lab = lab_ref[0, 0, :]  # (ROW_TILE,)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    sel = jnp.sum(jnp.where(col == lab[:, None], x, 0.0), axis=1)
    lpb_ref[0, 0, :] = x[:, blank] - base
    lpy_ref[0, 0, :] = jnp.where(lab >= 0, sel - base, NEG_INF)


def extract_lp(logits, labels, blank: int):
    """(B, T, U1, V) logits -> (lp_blank, lp_y): (B, T, U1) fp32 each."""
    B, T, U1, V = logits.shape
    N = B * T * U1
    G = -(-N // ROW_TILE)
    x = _pad_vocab(logits.reshape(N, V), NEG_INF)
    Vp = x.shape[-1]
    row_lab = _row_labels(labels, B, T, U1, G)
    out_shape = jax.ShapeDtypeStruct((G, 1, ROW_TILE), jnp.float32)
    vec_spec = pl.BlockSpec((1, 1, ROW_TILE), lambda r: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    lpb, lpy = pl.pallas_call(
        functools.partial(_extract_kernel, blank),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, Vp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
        ],
        out_specs=(vec_spec, vec_spec),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(x, row_lab)
    lpb = lpb.reshape(-1)[:N].reshape(B, T, U1)
    lpy = lpy.reshape(-1)[:N].reshape(B, T, U1)
    return lpb, lpy


def _grad_kernel(blank, x_ref, lab_ref, occ_ref, gb_ref, gy_ref, grad_ref):
    x = x_ref[:].astype(jnp.float32)
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    lab = lab_ref[0, 0, :]
    occ = occ_ref[0, 0, :]
    gb = gb_ref[0, 0, :]
    gy = gy_ref[0, 0, :]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    g = probs * occ[:, None]
    g = g - jnp.where(col == blank, gb[:, None], 0.0)
    g = g - jnp.where(col == lab[:, None], gy[:, None], 0.0)
    grad_ref[:] = g.astype(grad_ref.dtype)


def assemble_grad(logits, labels, occ, g_blank, g_y, blank: int):
    """Fused d(loss)/d(logits): one streaming pass over the lattice."""
    B, T, U1, V = logits.shape
    N = B * T * U1
    G = -(-N // ROW_TILE)
    x = _pad_vocab(logits.reshape(N, V), NEG_INF)
    Vp = x.shape[-1]
    row_lab = _row_labels(labels, B, T, U1, G)

    def flatpad(a):  # (B, T, U1) -> (G, 1, ROW_TILE)
        a = a.reshape(-1)
        return jnp.pad(a, (0, G * ROW_TILE - N)).reshape(G, 1, ROW_TILE)

    vec_spec = pl.BlockSpec((1, 1, ROW_TILE), lambda r: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        functools.partial(_grad_kernel, blank),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, Vp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,
        ],
        out_specs=pl.BlockSpec((ROW_TILE, Vp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * ROW_TILE, Vp), logits.dtype),
        interpret=_interpret(),
    )(x, row_lab, flatpad(occ), flatpad(g_blank), flatpad(g_y))
    return grad[:N, :V].reshape(B, T, U1, V)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rnnt_loss_pallas(logits, labels, frame_lens, label_lens, blank=0,
                     fastemit_lambda=0.0):
    """Per-utterance RNN-T loss with the Pallas lattice-extraction kernels.

    Same semantics as `rnnt_loss` (drop-in; tested equal); ~2 streaming
    passes over the logits total for forward+backward. fastemit_lambda
    (static) scales the emit-arc posterior gradient by (1 + lambda)
    (FastEmit; loss value unchanged).
    """
    lpb, lpy = extract_lp(logits, labels, blank)
    return forward_from_lp(lpb, lpy, frame_lens, label_lens)


def _fwd(logits, labels, frame_lens, label_lens, blank, fastemit_lambda):
    lpb, lpy = extract_lp(logits, labels, blank)
    loss = forward_from_lp(lpb, lpy, frame_lens, label_lens)
    # Residuals: the tiny lattice arrays (B,T,U1) + inputs; the logits are
    # re-read (not re-materialized) by the fused grad kernel.
    return loss, (logits, labels, frame_lens, label_lens, lpb, lpy)


def _bwd(blank, fastemit_lambda, res, g):
    logits, labels, frame_lens, label_lens, lpb, lpy = res
    g_blank, g_y = occupancies_from_lp(lpb, lpy, frame_lens, label_lens)
    if fastemit_lambda:
        g_y = g_y * (1.0 + fastemit_lambda)
    scale = g[:, None, None]
    grad = assemble_grad(logits, labels, (g_blank + g_y) * scale,
                         g_blank * scale, g_y * scale, blank)
    return grad, None, None, None


rnnt_loss_pallas.defvjp(_fwd, _bwd)


def rnnt_loss_pallas_mean(logits, labels, frame_lens, label_lens, blank=0,
                          fastemit_lambda=0.0):
    return jnp.mean(rnnt_loss_pallas(logits, labels, frame_lens, label_lens,
                                     blank, fastemit_lambda))
