"""Pallas RNN-T loss kernels (interpreter mode on CPU) vs XLA path + oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
from rnn_transducer_tpu.ops.rnnt_loss_pallas import (
    extract_lp,
    rnnt_loss_pallas,
    rnnt_loss_pallas_mean,
)
from rnn_transducer_tpu.ops.rnnt_oracle import rnnt_grad_oracle, rnnt_loss_oracle


def _problem(rng, B, T, U, V, vocab_pad_check=False):
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    fl = rng.integers(max(2, T - 4), T + 1, size=(B,)).astype(np.int32)
    ll = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl),
            jnp.asarray(ll))


def test_extract_lp_matches_log_softmax():
    rng = np.random.default_rng(0)
    B, T, U, V = 2, 5, 3, 130  # V not lane-aligned on purpose
    logits, labels, fl, ll = _problem(rng, B, T, U, V)
    lpb, lpy = extract_lp(logits, labels, blank=0)
    lp = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(lp[..., 0]),
                               rtol=1e-5, atol=1e-5)
    want_y = np.take_along_axis(
        np.asarray(lp)[:, :, :U, :],
        np.asarray(labels)[:, None, :, None].repeat(T, 1), axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(lpy)[:, :, :U], want_y,
                               rtol=1e-5, atol=1e-5)


def test_pallas_loss_matches_xla_and_oracle():
    rng = np.random.default_rng(1)
    logits, labels, fl, ll = _problem(rng, 3, 9, 5, 33)
    got = rnnt_loss_pallas(logits, labels, fl, ll)
    ref = rnnt_loss(logits, labels, fl, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    want = rnnt_loss_oracle(np.asarray(logits), np.asarray(labels),
                            np.asarray(fl), np.asarray(ll))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_pallas_grad_matches_oracle():
    rng = np.random.default_rng(2)
    logits, labels, fl, ll = _problem(rng, 2, 6, 4, 17)
    got = jax.grad(
        lambda x: jnp.sum(rnnt_loss_pallas(x, labels, fl, ll)))(logits)
    want = rnnt_grad_oracle(np.asarray(logits), np.asarray(labels),
                            np.asarray(fl), np.asarray(ll))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_pallas_loss_jits_with_bf16():
    rng = np.random.default_rng(3)
    logits, labels, fl, ll = _problem(rng, 2, 5, 3, 40)
    f = jax.jit(jax.value_and_grad(rnnt_loss_pallas_mean))
    v, g = f(logits.astype(jnp.bfloat16), labels, fl, ll)
    assert np.isfinite(float(v))
    assert g.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(g, np.float32)))
