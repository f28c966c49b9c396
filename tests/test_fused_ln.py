"""Fused LayerNorm kernel (ops/fused_ln.py) vs the plain XLA form.

The conformer dispatches to the kernel only on TPU
(`fused_ln_enabled`), so these tests call `fused_layer_norm` directly —
interpret mode exercises the exact kernel the chip runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.ops.fused_ln import ROWS, fused_layer_norm


def _ref(x, g, b, act):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + b
    return jax.nn.silu(y) if act == "silu" else y


@pytest.mark.parametrize("act", ["none", "silu"])
@pytest.mark.parametrize("shape,d", [((2, 7, 256), 256), ((ROWS + 3, 128), 128)])
def test_fused_ln_matches_xla(act, shape, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3.0
    g = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    got = fused_layer_norm(x, g, b, act)
    want = _ref(x, g, b, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # grads: weighted sum so the cotangent is non-uniform
    w = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ga = jax.grad(lambda *a: jnp.sum(fused_layer_norm(*a, act) * w),
                  argnums=(0, 1, 2))(x, g, b)
    ge = jax.grad(lambda *a: jnp.sum(_ref(*a, act) * w),
                  argnums=(0, 1, 2))(x, g, b)
    for name, a, e in zip("xgb", ga, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"d{name} act={act}")


def test_conformer_block_fused_ln_parity():
    """Force-enable the fused LN through the conformer block (interpret
    mode) and pin it against the default XLA-LN block output + grads."""
    import rnn_transducer_tpu.ops.conformer as cf
    from rnn_transducer_tpu.ops import fused_ln

    d, heads = 128, 4
    p = cf.init_conformer_block(jax.random.PRNGKey(0), d, heads, 2, 7)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, d)).astype(np.float32))
    lens = jnp.asarray([12, 9], jnp.int32)

    def run(x, p):
        return cf.conformer_block(p, x, lens, heads, jnp.float32)

    want = run(x, p)
    gw = jax.grad(lambda x, p: jnp.sum(run(x, p) ** 2), argnums=0)(x, p)
    old = fused_ln.fused_ln_enabled
    try:
        fused_ln.fused_ln_enabled = lambda d_: True
        got = jax.clear_caches() or run(x, p)
        gg = jax.grad(lambda x, p: jnp.sum(run(x, p) ** 2),
                      argnums=0)(x, p)
    finally:
        fused_ln.fused_ln_enabled = old
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=2e-4, atol=2e-5)
