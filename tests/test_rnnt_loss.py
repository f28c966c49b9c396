"""Parity tests: pure-JAX RNN-T loss vs the float64 numpy oracle.

Also validates the oracle itself against exponential brute-force path
enumeration on tiny lattices, and the custom_vjp gradient against both the
analytic oracle gradient and finite differences of the oracle loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_mean
from rnn_transducer_tpu.ops.rnnt_oracle import (
    rnnt_grad_oracle,
    rnnt_loss_bruteforce,
    rnnt_loss_oracle,
)


def _rand_problem(rng, B, T, U, V, scale=1.0):
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32) * scale
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    frame_lens = np.full((B,), T, np.int32)
    label_lens = np.full((B,), U, np.int32)
    return logits, labels, frame_lens, label_lens


def test_oracle_matches_bruteforce():
    rng = np.random.default_rng(0)
    for T, U, V in [(2, 1, 3), (3, 2, 4), (4, 3, 3), (5, 2, 5)]:
        logits, labels, fl, ll = _rand_problem(rng, 1, T, U, V)
        oracle = rnnt_loss_oracle(logits, labels, fl, ll)[0]
        brute = rnnt_loss_bruteforce(logits[0], labels[0], T, U)
        assert np.isfinite(oracle)
        np.testing.assert_allclose(oracle, brute, rtol=1e-10)


def test_loss_matches_oracle_full_lengths():
    rng = np.random.default_rng(1)
    logits, labels, fl, ll = _rand_problem(rng, 4, 11, 6, 17, scale=2.0)
    got = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(fl), jnp.asarray(ll)))
    want = rnnt_loss_oracle(logits, labels, fl, ll)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_loss_matches_oracle_variable_lengths():
    rng = np.random.default_rng(2)
    B, T, U, V = 5, 13, 7, 11
    logits, labels, _, _ = _rand_problem(rng, B, T, U, V)
    fl = rng.integers(4, T + 1, size=(B,)).astype(np.int32)
    ll = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    got = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(fl), jnp.asarray(ll)))
    want = rnnt_loss_oracle(logits, labels, fl, ll)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_loss_nonnegative_and_finite():
    rng = np.random.default_rng(3)
    logits, labels, fl, ll = _rand_problem(rng, 8, 20, 9, 30, scale=3.0)
    got = np.asarray(rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(fl), jnp.asarray(ll)))
    assert np.all(np.isfinite(got))
    assert np.all(got > 0)  # -log P, P < 1 almost surely


def test_grad_matches_oracle_grad():
    rng = np.random.default_rng(4)
    B, T, U, V = 3, 7, 4, 9
    logits, labels, _, _ = _rand_problem(rng, B, T, U, V)
    fl = np.array([7, 5, 6], np.int32)
    ll = np.array([4, 2, 3], np.int32)
    got = np.asarray(
        jax.grad(lambda x: jnp.sum(rnnt_loss(x, jnp.asarray(labels),
                                             jnp.asarray(fl), jnp.asarray(ll))))(
            jnp.asarray(logits)
        )
    )
    want = rnnt_grad_oracle(logits, labels, fl, ll)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
    # Gradient outside the valid lattice must be exactly zero.
    assert np.all(got[1, 5:, :, :] == 0)
    assert np.all(got[1, :, 3:, :] == 0)


def test_oracle_grad_matches_finite_differences():
    rng = np.random.default_rng(5)
    B, T, U, V = 1, 4, 2, 4
    logits, labels, fl, ll = _rand_problem(rng, B, T, U, V)
    analytic = rnnt_grad_oracle(logits, labels, fl, ll)
    eps = 1e-5
    logits64 = logits.astype(np.float64)
    for idx in [(0, 0, 0, 0), (0, 1, 1, 2), (0, 3, 2, 1), (0, 2, 0, 3)]:
        lp, lm = logits64.copy(), logits64.copy()
        lp[idx] += eps
        lm[idx] -= eps
        fd = (rnnt_loss_oracle(lp, labels, fl, ll)[0]
              - rnnt_loss_oracle(lm, labels, fl, ll)[0]) / (2 * eps)
        np.testing.assert_allclose(analytic[idx], fd, rtol=1e-5, atol=1e-8)


def test_loss_jits_and_mean():
    rng = np.random.default_rng(6)
    logits, labels, fl, ll = _rand_problem(rng, 2, 6, 3, 5)
    f = jax.jit(rnnt_loss_mean)
    v = f(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl),
          jnp.asarray(ll))
    want = rnnt_loss_oracle(logits, labels, fl, ll).mean()
    np.testing.assert_allclose(np.asarray(v), want, rtol=1e-4)


def test_grad_under_jit_and_vmap_composition():
    rng = np.random.default_rng(7)
    logits, labels, fl, ll = _rand_problem(rng, 2, 5, 3, 6)
    loss_fn = jax.jit(jax.value_and_grad(rnnt_loss_mean))
    v, g = loss_fn(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(fl),
                   jnp.asarray(ll))
    assert np.isfinite(np.asarray(v))
    assert g.shape == logits.shape
    assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_logits_supported():
    rng = np.random.default_rng(8)
    logits, labels, fl, ll = _rand_problem(rng, 2, 6, 3, 8)
    got = rnnt_loss(jnp.asarray(logits, jnp.bfloat16), jnp.asarray(labels),
                    jnp.asarray(fl), jnp.asarray(ll))
    want = rnnt_loss_oracle(
        np.asarray(jnp.asarray(logits, jnp.bfloat16), np.float32),
        labels, fl, ll)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
