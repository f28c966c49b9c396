"""LSTM layer parity vs torch.nn.LSTM (CPU oracle) and padding semantics."""

import jax.numpy as jnp
import numpy as np
import torch

from rnn_transducer_tpu.ops.lstm import (
    bilstm_layer,
    lstm_layer,
    mask_padding,
    reverse_padded,
)


def _torch_lstm_params(t_lstm, suffix=""):
    """Convert torch LSTM weights (4H, I) to our (I, 4H) layout."""
    return {
        "w_ih": jnp.asarray(getattr(t_lstm, f"weight_ih_l0{suffix}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(t_lstm, f"weight_hh_l0{suffix}").detach().numpy().T),
        "b": jnp.asarray(
            (getattr(t_lstm, f"bias_ih_l0{suffix}")
             + getattr(t_lstm, f"bias_hh_l0{suffix}")).detach().numpy()
        ),
    }


def test_lstm_matches_torch():
    torch.manual_seed(0)
    B, T, I, H = 3, 12, 8, 16
    t_lstm = torch.nn.LSTM(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        want, (h_n, c_n) = t_lstm(x)
    params = _torch_lstm_params(t_lstm)
    got, (h_t, c_t) = lstm_layer(params, jnp.asarray(x.numpy()),
                                 compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_t), h_n[0].numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c_t), c_n[0].numpy(), atol=2e-6)


def test_bilstm_matches_torch_packed():
    """Backward direction must see only valid frames (packed-seq semantics)."""
    torch.manual_seed(1)
    B, T, I, H = 3, 10, 6, 8
    lens = np.array([10, 7, 4], np.int32)
    t_lstm = torch.nn.LSTM(I, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, I)
    for b, L in enumerate(lens):
        x[b, L:] = 0.0
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, torch.as_tensor(lens.astype(np.int64)), batch_first=True)
    with torch.no_grad():
        out_packed, _ = t_lstm(packed)
    want, _ = torch.nn.utils.rnn.pad_packed_sequence(out_packed,
                                                     batch_first=True,
                                                     total_length=T)
    pf = _torch_lstm_params(t_lstm)
    pb = _torch_lstm_params(t_lstm, suffix="_reverse")
    got = bilstm_layer(pf, pb, jnp.asarray(x.numpy()), jnp.asarray(lens),
                       compute_dtype=jnp.float32)
    got = np.asarray(mask_padding(got, jnp.asarray(lens)))
    np.testing.assert_allclose(got, want.numpy(), atol=2e-6)


def test_reverse_padded_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    lens = jnp.asarray(np.array([6, 3], np.int32))
    y = reverse_padded(reverse_padded(x, lens), lens)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(y[1, :3]), np.asarray(x[1, :3]))


def test_bf16_compute_close_to_fp32():
    torch.manual_seed(2)
    B, T, I, H = 2, 8, 16, 32
    t_lstm = torch.nn.LSTM(I, H, batch_first=True)
    params = _torch_lstm_params(t_lstm)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, I)),
                    jnp.float32)
    y32, _ = lstm_layer(params, x, compute_dtype=jnp.float32)
    y16, _ = lstm_layer(params, x, compute_dtype=jnp.bfloat16)
    assert np.max(np.abs(np.asarray(y32) - np.asarray(y16))) < 0.05
