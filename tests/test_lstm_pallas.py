"""Fused Pallas LSTM layer vs the scan implementation (and torch, via it)."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.lstm import init_lstm_params, lstm_layer
from rnn_transducer_tpu.ops.lstm_pallas import lstm_layer_pallas, supported


def _params(I, H, seed=0):
    return init_lstm_params(jax.random.PRNGKey(seed), I, H)


def test_supported_predicate():
    assert supported(8, 128)
    assert supported(32, 512)
    assert not supported(8, 320)  # TIMIT hidden size -> scan fallback
    assert not supported(3, 128)
    assert supported(8, 1024)  # time-major (v2) kernels


def test_fwd_matches_scan():
    B, T, I, H = 8, 21, 64, 128  # T deliberately not a tile multiple
    params = _params(I, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    want, (hT_w, cT_w) = lstm_layer(params, x, compute_dtype=jnp.float32)
    got, (hT, cT) = lstm_layer_pallas(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_w), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_w), atol=1e-5)


def test_fwd_with_initial_state():
    B, T, I, H = 8, 9, 32, 128
    params = _params(I, H, seed=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c0 = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    want, _ = lstm_layer(params, x, h0, c0, compute_dtype=jnp.float32)
    got, _ = lstm_layer_pallas(params, x, h0, c0, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_scan():
    B, T, I, H = 8, 11, 32, 128
    params = _params(I, H, seed=2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)

    def loss(fn):
        def run(params, x):
            ys, (hT, cT) = fn(params, x, compute_dtype=jnp.float32)
            return (jnp.sum(ys * tgt) + jnp.sum(hT * hT)
                    + jnp.sum(jnp.tanh(cT)))
        return run

    g_want = jax.grad(loss(lstm_layer), argnums=(0, 1))(params, x)
    g_got = jax.grad(loss(lstm_layer_pallas), argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, e: np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5),
        g_got, g_want)


def test_v2_large_h_matches_scan():
    """H > 512 dispatches to the time-major kernels."""
    B, T, I, H = 8, 11, 16, 1024
    params = _params(I, H, seed=5)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    want, (hT_w, cT_w) = lstm_layer(params, x, compute_dtype=jnp.float32)
    got, (hT, cT) = lstm_layer_pallas(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_w), atol=1e-5)

    def loss(fn):
        return lambda p: jnp.sum(
            fn(p, x, compute_dtype=jnp.float32)[0] * ct)

    g_want = jax.grad(loss(lstm_layer))(params)
    g_got = jax.grad(loss(lstm_layer_pallas))(params)
    jax.tree.map(
        lambda a, e: np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5),
        g_got, g_want)


def test_wide_batch_h512_dispatches_to_v2():
    """H=512 with B%32==0 exceeds the v1 VMEM budget at BT=32, so it
    routes to the time-major kernels; narrow batches keep v1."""
    from rnn_transducer_tpu.ops.lstm_pallas import _use_v2

    assert _use_v2(32, 512) and _use_v2(64, 512)
    assert not _use_v2(16, 512) and not _use_v2(8, 512)
    assert _use_v2(8, 1024)
    B, T, I, H = 32, 5, 16, 512
    params = _params(I, H, seed=9)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    want, _ = lstm_layer(params, x, compute_dtype=jnp.float32, impl="scan")
    got, _ = lstm_layer_pallas(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_v2_bt64_tile_matches_scan():
    """B % 64 == 0 engages the widest (BT=64, TILE_T=1) batch tile."""
    from rnn_transducer_tpu.ops.lstm_pallas import _tile_bt_v2

    assert _tile_bt_v2(64, 1024) == (64, 1)
    assert _tile_bt_v2(32, 1024) == (32, 2)
    B, T, I, H = 64, 3, 8, 640  # H > 512 -> v2 dispatch; small T for speed
    params = _params(I, H, seed=7)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    want, (hT_w, cT_w) = lstm_layer(params, x, compute_dtype=jnp.float32)
    got, (hT, cT) = lstm_layer_pallas(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(cT_w), atol=1e-5)

    def loss(fn):
        return lambda p: jnp.sum(fn(p, x, compute_dtype=jnp.float32)[0] * ct)

    g_want = jax.grad(loss(lstm_layer))(params)
    g_got = jax.grad(loss(lstm_layer_pallas))(params)
    jax.tree.map(
        lambda a, e: np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5),
        g_got, g_want)


def test_jit_composition():
    B, T, I, H = 8, 16, 32, 128
    params = _params(I, H, seed=3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)
    f = jax.jit(lambda p, x: jnp.sum(
        lstm_layer_pallas(p, x, compute_dtype=jnp.float32)[0]))
    v = f(params, x)
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        lstm_layer_pallas(p, x, compute_dtype=jnp.float32)[0])))(params)
    assert np.isfinite(float(v))
    assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree.leaves(g))
