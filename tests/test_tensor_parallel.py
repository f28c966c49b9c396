"""Tensor- and sequence-parallel execution vs the single-device model.

Validates parallel/tp.py on the virtual 8-device CPU mesh: gate-sharded
LSTM layers, the vocab-parallel joint+loss, the frame-sharded (SP)
joint+loss, and full (data x model) train steps whose post-step parameters
must match the single-device AdamW update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.lstm import init_lstm_params, lstm_layer
from rnn_transducer_tpu.parallel import tp
from rnn_transducer_tpu.train.loop import (
    init_train_state,
    loss_fn,
    make_train_step,
)

MP = 4


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 2 * MP:
        pytest.skip("needs 8 devices")
    return tp.make_mesh_2d(2, MP)


def _batch(cfg, B=8, T=20, U=5, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    labels = jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=(B, U)), jnp.int32)
    label_lens = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    return feats, feat_lens, labels, label_lens


# vocab 21 is deliberately NOT divisible by MP=4: exercises vocab padding.
CFG = TransducerConfig(enc_layers=2, enc_hidden=32, pred_layers=1,
                       pred_hidden=32, embed_dim=16, joint_dim=32,
                       vocab_size=21, input_dim=8, time_reduction=2)
CFG_BI = TransducerConfig(enc_layers=2, enc_hidden=32, bidirectional=True,
                          pred_layers=1, pred_hidden=32, embed_dim=16,
                          joint_dim=32, vocab_size=16, input_dim=8)
TCFG = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10,
                   loss_impl="xla", grad_clip_norm=5.0)


def test_tp_lstm_layer_matches_scan(mesh2):
    key = jax.random.PRNGKey(0)
    B, T, I, H = 4, 12, 16, 32
    p = init_lstm_params(key, I, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, I), jnp.float32)
    y_ref, _ = lstm_layer(p, x, impl="scan")
    p_stack = tp._shard_lstm(p, MP)

    def run(p_loc, x):
        p_loc = jax.tree.map(lambda a: a[0], p_loc)
        return tp.tp_lstm_layer(p_loc, x, axis="model")[0]

    y_tp = jax.jit(jax.shard_map(
        run, mesh=mesh2,
        in_specs=(jax.tree.map(lambda _: P("model"), p_stack), P("data")),
        out_specs=P("data"), check_vma=False))(p_stack, x)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5)


def test_shard_merge_roundtrip():
    for cfg in (CFG, CFG_BI):
        params = m.init_params(jax.random.PRNGKey(3), cfg)
        merged = tp.merge_params_tp(tp.split_params_tp(params, cfg, MP), cfg)
        for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cfg", [CFG, CFG_BI], ids=["uni", "bi"])
def test_tp_loss_matches_single_device(mesh2, cfg):
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    batch = _batch(cfg)
    loss_ref, per_ref = loss_fn(params, cfg, *batch, loss_impl="xla")
    tpp = tp.split_params_tp(params, cfg, MP)

    def fn(tpp_local, feats, feat_lens, labels, label_lens):
        local = tp._tp_squeeze(tpp_local)
        loss, per = tp.tp_loss_fn(tp._local_view(local), cfg, feats,
                                  feat_lens, labels, label_lens)
        return (jax.lax.pmean(loss, "data"),
                jax.lax.all_gather(per, "data", axis=0, tiled=True))

    loss_tp, per_tp = jax.jit(jax.shard_map(
        fn, mesh=mesh2,
        in_specs=(tp.tp_specs(tpp),) + (P("data"),) * 4,
        out_specs=(P(), P()), check_vma=False))(tpp, *batch)
    assert abs(float(loss_tp) - float(loss_ref)) < 1e-4
    np.testing.assert_allclose(np.asarray(per_tp), np.asarray(per_ref),
                               atol=1e-3)


def test_tp_train_step_matches_single_device(mesh2):
    batch = _batch(CFG)
    state1 = init_train_state(jax.random.PRNGKey(7), CFG, TCFG)
    new1, info1 = make_train_step(CFG, TCFG)(state1, *batch)

    tps = tp.shard_tp_state(
        mesh2, tp.init_tp_train_state(jax.random.PRNGKey(7), CFG, TCFG, MP))
    step = tp.make_tp_train_step(CFG, TCFG, mesh2, mode="tp")
    new_tp, info_tp = step(tps, *tp.shard_batch_2d(mesh2, batch))

    assert abs(float(info_tp["loss"]) - float(info1["loss"])) < 1e-4
    g1 = float(info1["grad_norm"])
    assert abs(float(info_tp["grad_norm"]) - g1) < 1e-3 * max(1.0, g1)
    merged = tp.merge_params_tp(jax.device_get(new_tp.params), CFG)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(jax.device_get(new1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_train_step_matches_single_device(mesh2):
    batch = _batch(CFG)
    state1 = init_train_state(jax.random.PRNGKey(7), CFG, TCFG)
    new1, info1 = make_train_step(CFG, TCFG)(state1, *batch)

    sps = tp.replicate_state(
        mesh2, tp.init_sp_train_state(jax.random.PRNGKey(7), CFG, TCFG))
    step = tp.make_tp_train_step(CFG, TCFG, mesh2, mode="sp")
    new_sp, info_sp = step(sps, *tp.shard_batch_2d(mesh2, batch))

    assert abs(float(info_sp["loss"]) - float(info1["loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(jax.device_get(new_sp.params)),
                    jax.tree.leaves(jax.device_get(new1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_multi_step_stays_in_sync(mesh2):
    """Three consecutive TP steps track the single-device trajectory."""
    batch = _batch(CFG)
    state1 = init_train_state(jax.random.PRNGKey(9), CFG, TCFG)
    step1 = make_train_step(CFG, TCFG)
    tps = tp.shard_tp_state(
        mesh2, tp.init_tp_train_state(jax.random.PRNGKey(9), CFG, TCFG, MP))
    step_tp = tp.make_tp_train_step(CFG, TCFG, mesh2, mode="tp")
    batch_tp = tp.shard_batch_2d(mesh2, batch)
    for i in range(3):
        state1, info1 = step1(state1, *batch)
        tps, info_tp = step_tp(tps, *batch_tp)
        assert abs(float(info_tp["loss"]) - float(info1["loss"])) < 2e-4, i
