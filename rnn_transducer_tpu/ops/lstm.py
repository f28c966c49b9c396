"""TPU-native stacked LSTM ops.

The reference encoder/prediction network are torch `nn.LSTM` stacks
(SURVEY.md §B — unverifiable this round; capability set per BASELINE.json:
2x256 … 6x1024 uni- and bidirectional). Here each layer is a pure function
lowered through `jax.lax.scan`:

  * the input projection for ALL timesteps is hoisted out of the scan as one
    large (B*T, I) x (I, 4H) matmul — batched, MXU-shaped work;
  * the scan body is only the (B, H) x (H, 4H) recurrent matmul plus fused
    VPU elementwise gate math (XLA fuses sigmoid/tanh/hadamard into the
    matmul epilogue);
  * matmuls run in a configurable compute dtype (bfloat16 by default on
    TPU) with fp32 accumulation; the cell state is kept fp32 for stability;
  * variable-length sequences are handled with zero-padded inputs plus a
    padded-reverse gather for the backward direction of a BiLSTM, so all
    shapes stay static under jit.

Gate ordering is torch's (i, f, g, o), which lets the test suite check the
layer bit-for-bit (to fp32 tolerance) against `torch.nn.LSTM` on CPU.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.ops.quant import QTensor, dequantize_tensor


def _whh(params, compute_dtype):
    """Recurrent weights in the compute dtype; encode() keeps w_hh as an
    int8 QTensor (ops/quant.py) so the Pallas path can consume it raw —
    the scan/cell paths dequantize here (hoisted out of scans by XLA)."""
    w = params["w_hh"]
    if isinstance(w, QTensor):
        return dequantize_tensor(w, compute_dtype)
    return w.astype(compute_dtype)


def hidden_dim(params) -> int:
    w = params["w_hh"]
    return (w.q if isinstance(w, QTensor) else w).shape[0]


def init_lstm_params(key, input_dim: int, hidden_dim: int,
                     dtype=jnp.float32) -> dict[str, Any]:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch.nn.LSTM defaults."""
    k = 1.0 / math.sqrt(hidden_dim)
    k_wih, k_whh, k_bih, k_bhh = jax.random.split(key, 4)
    u = lambda k_, shape: jax.random.uniform(k_, shape, dtype, -k, k)
    return {
        "w_ih": u(k_wih, (input_dim, 4 * hidden_dim)),
        "w_hh": u(k_whh, (hidden_dim, 4 * hidden_dim)),
        "b": u(k_bih, (4 * hidden_dim,)) + u(k_bhh, (4 * hidden_dim,)),
    }


def lstm_cell(params, x_proj, h, c, compute_dtype=jnp.bfloat16):
    """One LSTM step. x_proj = x @ w_ih + b precomputed. h:(B,H) c:(B,H) fp32."""
    H = h.shape[-1]
    gates = x_proj + jnp.dot(
        h.astype(compute_dtype),
        _whh(params, compute_dtype),
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order: i, f, g, o
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_layer(params, x, h0=None, c0=None, *, compute_dtype=jnp.bfloat16,
               impl: str = "auto"):
    """Run one unidirectional LSTM layer over (B, T, I) -> (B, T, H).

    Returns (outputs, (h_T, c_T)). State is fp32. impl="auto" dispatches to
    the fused Pallas kernel (ops/lstm_pallas.py) on TPU for lane-aligned
    shapes; "scan"/"pallas" force a path.
    """
    B, T, _ = x.shape
    H = hidden_dim(params)
    if impl != "scan":
        from rnn_transducer_tpu.ops import lstm_pallas
        # Auto-dispatch only for long sequences: for short ones (e.g. the
        # prediction network over labels) XLA places the kernel's full
        # dgates output in VMEM, which can exceed the 16 MB budget at
        # large H — and the scan path is already fast there.
        long_enough = B * T * 4 * H * 4 > 24 * 1024 * 1024
        # int8 QTensor w_hh (serving params): inference-only, no dgates
        # output — the long-sequence guard (a backward-path VMEM concern)
        # doesn't apply, so short streaming chunks also take the kernel.
        if isinstance(params["w_hh"], QTensor):
            long_enough = True
        if impl == "pallas" or (
                impl == "auto" and jax.default_backend() == "tpu"
                and lstm_pallas.supported(B, H) and long_enough):
            return lstm_pallas.lstm_layer_pallas(
                params, x, h0, c0, compute_dtype=compute_dtype)
    x_proj = (
        jnp.dot(x.astype(compute_dtype), params["w_ih"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + params["b"].astype(jnp.float32)
    )  # (B, T, 4H) fp32
    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)
    if c0 is None:
        c0 = jnp.zeros((B, H), jnp.float32)

    def step(carry, xp_t):
        h, c = carry
        h, c = lstm_cell(params, xp_t, h, c, compute_dtype)
        return (h, c), h

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), jnp.moveaxis(x_proj, 1, 0))
    return jnp.moveaxis(ys, 0, 1), (h_t, c_t)


def reverse_padded(x, lens):
    """Reverse the valid prefix of each (T, ...) sequence in a padded batch.

    x: (B, T, ...); lens: (B,). Positions >= lens[b] keep reading padding
    (exact content there is irrelevant as long as inputs are zero-padded).
    """
    B, T = x.shape[0], x.shape[1]
    t_ids = jnp.arange(T, dtype=jnp.int32)[None, :]  # (1, T)
    idx = lens.astype(jnp.int32)[:, None] - 1 - t_ids  # (B, T)
    idx = jnp.where(idx >= 0, idx, t_ids)  # padding region maps to itself
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def bilstm_layer(params_fwd, params_bwd, x, lens, *,
                 compute_dtype=jnp.bfloat16):
    """Bidirectional layer: concat of forward and padded-reverse backward runs.

    Pad-region content of x is irrelevant (reverse_padded maps pads to
    themselves, so the reversed pass still starts from the true final
    frame and pad garbage never enters a valid position); pad positions
    of the OUTPUT are garbage. Output: (B, T, 2H).
    """
    y_f, _ = lstm_layer(params_fwd, x, compute_dtype=compute_dtype)
    x_r = reverse_padded(x, lens)
    y_b, _ = lstm_layer(params_bwd, x_r, compute_dtype=compute_dtype)
    y_b = reverse_padded(y_b, lens)
    return jnp.concatenate([y_f, y_b], axis=-1)


def mask_padding(x, lens):
    """Zero features at padded timesteps. x: (B, T, F), lens: (B,)."""
    t_ids = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
    return jnp.where(t_ids < lens.astype(jnp.int32)[:, None, None], x, 0.0)
