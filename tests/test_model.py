"""Transducer model: shapes, lattice semantics, and end-to-end loss wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import (
    TransducerConfig,
    config_greedy_smoke,
    config_timit,
)
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss_mean


def _batch(cfg, B=2, T=20, U=5, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, T, cfg.input_dim)).astype(np.float32)
    feat_lens = np.array([T] + [T - 6] * (B - 1), np.int32)
    labels = rng.integers(1, cfg.vocab_size, size=(B, U)).astype(np.int32)
    label_lens = np.array([U] + [U - 2] * (B - 1), np.int32)
    return (jnp.asarray(feats), jnp.asarray(feat_lens), jnp.asarray(labels),
            jnp.asarray(label_lens))


def test_forward_shapes_uni():
    cfg = config_greedy_smoke()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg)
    logits, enc_lens = m.forward(params, cfg, feats, feat_lens, labels)
    assert logits.shape == (2, 20, 6, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(enc_lens), [20, 14])


def test_forward_shapes_bi_time_reduction():
    cfg = TransducerConfig(enc_layers=2, enc_hidden=32, bidirectional=True,
                           pred_hidden=32, embed_dim=16, joint_dim=32,
                           vocab_size=20, input_dim=8, time_reduction=2)
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, T=20, U=4)
    logits, enc_lens = m.forward(params, cfg, feats, feat_lens, labels)
    assert logits.shape == (2, 10, 5, 20)
    np.testing.assert_array_equal(np.asarray(enc_lens), [10, 7])


def test_predictor_causality():
    """Output at position u must not depend on labels[u:]."""
    cfg = config_greedy_smoke()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(1, 6)), jnp.int32)
    out1, _ = m.predict(params, cfg, labels)
    labels2 = labels.at[0, 3].set((labels[0, 3] % (cfg.vocab_size - 1)) + 1)
    out2, _ = m.predict(params, cfg, labels2)
    np.testing.assert_allclose(np.asarray(out1[:, :4]), np.asarray(out2[:, :4]),
                               atol=1e-6)
    assert np.max(np.abs(np.asarray(out1[:, 4:]) - np.asarray(out2[:, 4:]))) > 1e-6


def test_predict_step_matches_batch_predict():
    cfg = config_greedy_smoke()
    params = m.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    B, U = 2, 5
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)), jnp.int32)
    full, _ = m.predict(params, cfg, labels)  # (B, U+1, H)
    state = m.init_pred_state(cfg, B)
    outs = []
    toks = jnp.concatenate(
        [jnp.full((B, 1), cfg.blank, jnp.int32), labels], axis=1)
    for u in range(U + 1):
        o, state = m.predict_step(params, cfg, toks[:, u], state)
        outs.append(o)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), atol=1e-5)


def test_joint_step_matches_full_joint():
    cfg = TransducerConfig(**{**config_greedy_smoke().__dict__,
                              "compute_dtype": "float32"})
    params = m.init_params(jax.random.PRNGKey(6), cfg)
    feats, feat_lens, labels, _ = _batch(cfg, T=8, U=3)
    enc_out, _ = m.encode(params, cfg, feats, feat_lens)
    pred_out, _ = m.predict(params, cfg, labels)
    full = m.joint(params, cfg, enc_out, pred_out)
    one = m.joint_step(params, cfg, enc_out[:, 5], pred_out[:, 2])
    np.testing.assert_allclose(np.asarray(one), np.asarray(full[:, 5, 2]),
                               atol=1e-5)


def test_remat_encoder_same_values_and_grads():
    cfg = TransducerConfig(enc_layers=2, enc_hidden=16, pred_hidden=16,
                           embed_dim=8, joint_dim=16, vocab_size=9,
                           input_dim=4, compute_dtype="float32")
    cfg_r = TransducerConfig(**{**cfg.__dict__, "remat_encoder": True})
    params = m.init_params(jax.random.PRNGKey(8), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, T=10, U=3)

    def loss(c):
        def f(p):
            logits, enc_lens = m.forward(p, c, feats, feat_lens, labels)
            return rnnt_loss_mean(logits, labels, enc_lens, label_lens)
        return f

    v1, g1 = jax.value_and_grad(loss(cfg))(params)
    v2, g2 = jax.value_and_grad(loss(cfg_r))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, e in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-5,
                                   atol=1e-7)


def test_end_to_end_loss_and_grad():
    cfg = config_timit()
    # shrink for test speed, keep bi + time structure
    cfg = TransducerConfig(**{**cfg.__dict__, "enc_hidden": 32,
                              "pred_hidden": 32, "embed_dim": 16,
                              "joint_dim": 32, "vocab_size": 15,
                              "input_dim": 8})
    params = m.init_params(jax.random.PRNGKey(7), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, T=12, U=4)

    def loss_fn(p):
        logits, enc_lens = m.forward(p, cfg, feats, feat_lens, labels)
        return rnnt_loss_mean(logits, labels, enc_lens, label_lens,
                              blank=cfg.blank)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(np.asarray(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.max(np.abs(np.asarray(g))) > 0 for g in flat)
