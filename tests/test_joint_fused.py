"""Fused joint+loss Pallas op vs the unfused joint + rnnt_loss reference."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.ops.rnnt_joint_fused import rnnt_loss_fused
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss


def _setup(B=3, T=11, U=4, J=32, V=21, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.normal(size=(B, T, J)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U + 1, J)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    fl = jnp.asarray(rng.integers(max(2, T - 3), T + 1, size=(B,)), jnp.int32)
    ll = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    return f, g, w, b, labels, fl, ll


def _reference_loss(f, g, w, b, labels, fl, ll):
    z = jnp.tanh(f[:, :, None, :] + g[:, None, :, :])
    logits = jnp.einsum("btuj,jv->btuv", z, w) + b
    return rnnt_loss(logits, labels, fl, ll)


def test_fused_loss_matches_unfused():
    f, g, w, b, labels, fl, ll = _setup()
    got = rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                          compute_dtype=jnp.float32)
    want = _reference_loss(f, g, w, b, labels, fl, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_unfused():
    f, g, w, b, labels, fl, ll = _setup(seed=1)

    def fused(f, g, w, b):
        return jnp.sum(rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                       compute_dtype=jnp.float32))

    def ref(f, g, w, b):
        return jnp.sum(_reference_loss(f, g, w, b, labels, fl, ll))

    got = jax.grad(fused, argnums=(0, 1, 2, 3))(f, g, w, b)
    want = jax.grad(ref, argnums=(0, 1, 2, 3))(f, g, w, b)
    for name, a, e in zip("fgwb", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad d{name}")


def test_fused_bf16_grad_error_bounded():
    """Production compute dtype: the whole backward epilogue (exp, occupancy
    multiply, blank/label corrections) runs in bf16 (round 3). Bound the
    relative L2 gradient error vs the f32 XLA reference — measured ~0.25%,
    the same order as plain bf16-matmul operand rounding, so the bf16
    epilogue adds no meaningful noise."""
    f, g, w, b, labels, fl, ll = _setup(B=4, T=24, U=6, J=32, V=64, seed=4)

    def fused16(f, g, w, b):
        return jnp.sum(rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                       compute_dtype=jnp.bfloat16))

    def ref(f, g, w, b):
        return jnp.sum(_reference_loss(f, g, w, b, labels, fl, ll))

    got = jax.grad(fused16, argnums=(0, 1, 2, 3))(f, g, w, b)
    want = jax.grad(ref, argnums=(0, 1, 2, 3))(f, g, w, b)
    for name, a, e in zip("fgwb", got, want):
        a = np.asarray(a, np.float64)
        e = np.asarray(e, np.float64)
        rel = np.linalg.norm(a - e) / (np.linalg.norm(e) + 1e-30)
        assert rel < 0.02, f"grad d{name} rel L2 error {rel:.4f}"
    # the loss value itself is f32-accurate (forward reductions stay f32)
    np.testing.assert_allclose(float(fused16(f, g, w, b)),
                               float(ref(f, g, w, b)), rtol=1e-3)


def test_fused_nonuniform_cotangent():
    """The loss cotangent is applied inside the backward kernel (SMEM
    sidecar, round 3): a non-uniform per-utterance weighting must match the
    chain rule exactly, including negative weights."""
    f, g, w, b, labels, fl, ll = _setup(seed=5)
    wts = jnp.asarray([0.5, -1.25, 2.0], jnp.float32)

    def fused(f, g, w, b):
        return jnp.sum(wts * rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                             compute_dtype=jnp.float32))

    def ref(f, g, w, b):
        return jnp.sum(wts * _reference_loss(f, g, w, b, labels, fl, ll))

    got = jax.grad(fused, argnums=(0, 1, 2, 3))(f, g, w, b)
    want = jax.grad(ref, argnums=(0, 1, 2, 3))(f, g, w, b)
    for name, a, e in zip("fgwb", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"grad d{name}")


def test_fused_jit_and_nonaligned_shapes():
    # T not a multiple of TILE_T, U+1 not a multiple of 8, V not of 128
    f, g, w, b, labels, fl, ll = _setup(B=2, T=13, U=6, J=16, V=9, seed=2)
    fn = jax.jit(jax.value_and_grad(
        lambda f, g, w, b: jnp.sum(rnnt_loss_fused(
            f, g, w, b, labels, fl, ll, compute_dtype=jnp.float32)),
        argnums=(0, 1, 2, 3)))
    v, grads = fn(f, g, w, b)
    assert np.isfinite(float(v))
    want = _reference_loss(f, g, w, b, labels, fl, ll)
    np.testing.assert_allclose(float(v), float(jnp.sum(want)), rtol=1e-5)
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))


def test_fused_through_model_loss_fn():
    from rnn_transducer_tpu.train.loop import loss_fn
    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=11, input_dim=4,
                           compute_dtype="float32")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 9, 4)), jnp.float32)
    fl = jnp.asarray([9, 6], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 11, size=(2, 3)), jnp.int32)
    ll = jnp.asarray([3, 2], jnp.int32)
    lf, _ = loss_fn(params, cfg, feats, fl, labels, ll, loss_impl="fused")
    lx, _ = loss_fn(params, cfg, feats, fl, labels, ll, loss_impl="xla")
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    gf = jax.grad(lambda p: loss_fn(p, cfg, feats, fl, labels, ll,
                                    "fused")[0])(params)
    gx = jax.grad(lambda p: loss_fn(p, cfg, feats, fl, labels, ll,
                                    "xla")[0])(params)
    for a, e in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-5)


def test_bwd_variant_grads_match_v1():
    """The env-gated vocab-chunked backward kernels (RNNT_FUSED_BWD=t8v2 /
    t16v2, round 4) compute identical math to the classic v1 tile — same
    grads to fp32 tolerance on a vocab large enough to chunk (Vp/2 must be
    lane-aligned, so V >= 256)."""
    import rnn_transducer_tpu.ops.rnnt_joint_fused as jf

    f, g, w, b, labels, fl, ll = _setup(B=2, T=19, U=4, J=32, V=256, seed=5)

    def fused(f, g, w, b):
        return jnp.sum(rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                       compute_dtype=jnp.float32))

    grad = jax.grad(fused, argnums=(0, 1, 2, 3))
    old = jf._BWD_VARIANT
    try:
        jf._BWD_VARIANT = "v1"
        want = grad(f, g, w, b)
        for variant in ("t8v2", "t16v2", "pipe"):
            jf._BWD_VARIANT = variant
            got = jax.clear_caches() or grad(f, g, w, b)
            for name, a, e in zip("fgwb", got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5,
                    err_msg=f"{variant} grad d{name}")
    finally:
        jf._BWD_VARIANT = old
        jax.clear_caches()


def test_bwd_pipe_variant_small_vocab_and_single_tile():
    """The software-pipelined backward (RNNT_FUSED_BWD=pipe, round 5) has
    no vocab-chunk constraint and must be exact at Vp=128 and at T <=
    TILE_T (nT=1: the pipeline is pure fill-then-drain)."""
    import rnn_transducer_tpu.ops.rnnt_joint_fused as jf

    for T in (5, 11):
        f, g, w, b, labels, fl, ll = _setup(B=2, T=T, U=3, J=32, V=32,
                                            seed=11 + T)

        def fused(f, g, w, b):
            return jnp.sum(rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                           compute_dtype=jnp.float32))

        grad = jax.grad(fused, argnums=(0, 1, 2, 3))
        old = jf._BWD_VARIANT
        try:
            jf._BWD_VARIANT = "v1"
            want = grad(f, g, w, b)
            jf._BWD_VARIANT = "pipe"
            got = jax.clear_caches() or grad(f, g, w, b)
            for name, a, e in zip("fgwb", got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5,
                    err_msg=f"pipe T={T} grad d{name}")
        finally:
            jf._BWD_VARIANT = old
            jax.clear_caches()


def test_bwd_chunked_variant_small_vocab_falls_back_to_v1():
    """With a vocab whose padded width can't be split into lane-aligned
    chunks (Vp=128 -> chunk 64), the chunked variants MUST dispatch the
    monolithic v1 kernel: a 64-wide lane slice of w/b is rejected by
    Mosaic on hardware (interpret mode would mask the bug). Pins the
    round-4 fallback for t8v2 — the default variant — not just t16v2."""
    import rnn_transducer_tpu.ops.rnnt_joint_fused as jf

    f, g, w, b, labels, fl, ll = _setup(B=2, T=11, U=3, J=32, V=32, seed=7)

    def fused(f, g, w, b):
        return jnp.sum(rnnt_loss_fused(f, g, w, b, labels, fl, ll,
                                       compute_dtype=jnp.float32))

    grad = jax.grad(fused, argnums=(0, 1, 2, 3))
    old_variant = jf._BWD_VARIANT
    old_kern = jf._bwd_kernel_vc

    def _boom(*a, **k):
        raise AssertionError(
            "chunked backward kernel dispatched for Vp=128 (must fall "
            "back to v1: 64-wide lane slices don't lower on hardware)")

    try:
        jf._BWD_VARIANT = "v1"
        want = grad(f, g, w, b)
        jf._bwd_kernel_vc = _boom
        for variant in ("t8v2", "t16v2"):
            jf._BWD_VARIANT = variant
            got = jax.clear_caches() or grad(f, g, w, b)
            for name, a, e in zip("fgwb", got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5,
                    err_msg=f"{variant} small-vocab grad d{name}")
    finally:
        jf._BWD_VARIANT = old_variant
        jf._bwd_kernel_vc = old_kern
        jax.clear_caches()
