"""Diagonal-wavefront lattice kernel vs the scan implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops import rnnt_loss as R
from rnn_transducer_tpu.ops.rnnt_lattice_pallas import (alpha_wavefront,
                                                        beta_wavefront)


def _problem(seed, B=3, T=9, U=5, V=12):
    rng = np.random.default_rng(seed)
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    fl = jnp.asarray(rng.integers(max(2, T - 3), T + 1, size=(B,)), jnp.int32)
    ll = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    _, lpb, lpy, lpb_m, lpy_m, accept = R._prepare(logits, labels, fl, ll, 0)
    return lpb_m, lpy_m, accept


def _close_where_valid(got, ref, tol=5e-6):
    got, ref = np.asarray(got), np.asarray(ref)
    valid = ref > -1e29
    np.testing.assert_allclose(got[valid], ref[valid], rtol=tol, atol=tol)
    assert np.all(got[~valid] < -1e29)


def test_alpha_wavefront_matches_scan():
    for seed in (0, 1):
        lpb_m, lpy_m, accept = _problem(seed)
        _close_where_valid(alpha_wavefront(lpb_m, lpy_m),
                           R._alpha_scan(lpb_m, lpy_m))


def test_beta_wavefront_matches_scan():
    for seed in (2, 3):
        lpb_m, lpy_m, accept = _problem(seed)
        _close_where_valid(beta_wavefront(lpb_m, lpy_m, accept),
                           R._beta_scan(lpb_m, lpy_m, accept))


def test_wavefront_jits_and_odd_shapes():
    lpb_m, lpy_m, accept = _problem(4, B=2, T=13, U=7, V=9)
    a = jax.jit(alpha_wavefront)(lpb_m, lpy_m)
    b = jax.jit(beta_wavefront)(lpb_m, lpy_m, accept)
    _close_where_valid(a, R._alpha_scan(lpb_m, lpy_m))
    _close_where_valid(b, R._beta_scan(lpb_m, lpy_m, accept))
