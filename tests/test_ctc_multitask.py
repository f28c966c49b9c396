"""Joint CTC+RNN-T multitask training (TrainConfig.ctc_weight): the
auxiliary-CTC term added to the transducer objective every step on the
shared encoder pass (train/loop.py loss_fn with_ctc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.loop import (ctc_loss_fn, init_train_state,
                                           loss_fn, make_train_step)


def _cfg(**kw):
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=6, input_dim=4, ctc_head=True,
                            compute_dtype="float32", **kw)


def _batch(cfg, B=2, T=6, U=3, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray([T, T - 2][:B])
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)
    label_lens = jnp.asarray([U, U - 1][:B])
    return feats, feat_lens, labels, label_lens


@pytest.mark.parametrize("family_kw", [
    {}, dict(big_blank_durations=(2,)), dict(tdt_durations=(0, 1, 2))])
def test_combined_equals_sum_of_parts(family_kw):
    """loss_fn(ctc_weight=w) == loss_fn() + w * ctc_loss_fn() exactly
    (the shared-encoder-pass combination changes no math), for the
    standard, multi-blank, and TDT lattices."""
    cfg = _cfg(**family_kw)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg)
    w = 0.3
    comb, comb_pu = loss_fn(params, cfg, feats, feat_lens, labels,
                            label_lens, ctc_weight=w)
    rnnt, rnnt_pu = loss_fn(params, cfg, feats, feat_lens, labels,
                            label_lens)
    ctc, ctc_pu = ctc_loss_fn(params, cfg, feats, feat_lens, labels,
                              label_lens)
    np.testing.assert_allclose(np.asarray(comb), np.asarray(rnnt + w * ctc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(comb_pu),
                               np.asarray(rnnt_pu + w * ctc_pu),
                               rtol=1e-5, atol=1e-6)


def test_zero_weight_is_identity_and_head_untouched():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, seed=1)
    l0, _ = loss_fn(params, cfg, feats, feat_lens, labels, label_lens)
    lw, _ = loss_fn(params, cfg, feats, feat_lens, labels, label_lens,
                    ctc_weight=0.0)
    assert float(l0) == float(lw)
    # ctc_head gradients: zero without the multitask term, nonzero with
    g0 = jax.grad(lambda p: loss_fn(p, cfg, feats, feat_lens, labels,
                                    label_lens)[0])(params)
    gw = jax.grad(lambda p: loss_fn(p, cfg, feats, feat_lens, labels,
                                    label_lens, ctc_weight=0.2)[0])(params)
    assert np.all(np.asarray(g0["ctc_head"]["w"]) == 0.0)
    assert np.any(np.asarray(gw["ctc_head"]["w"]) != 0.0)


def test_train_step_and_dp_parity():
    """A ctc_weight train step runs, and the 8-way DP step reproduces the
    single-device loss (the CTC term shards like any per-utterance
    loss)."""
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=2,
                       total_steps=4, ctc_weight=0.25)
    state = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, B=2, seed=2)
    feats = jnp.tile(feats, (4, 1, 1))
    feat_lens = jnp.tile(feat_lens, (4,))
    labels = jnp.tile(labels, (4, 1))
    label_lens = jnp.tile(label_lens, (4,))

    step1 = make_train_step(cfg, tcfg)
    from rnn_transducer_tpu.parallel.mesh import make_mesh, replicate
    mesh = make_mesh()
    stepN = make_train_step(cfg, tcfg, mesh=mesh)
    s1, i1 = step1(state, feats, feat_lens, labels, label_lens)
    state2 = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    sN, iN = stepN(replicate(mesh, state2), feats, feat_lens, labels,
                   label_lens)
    np.testing.assert_allclose(np.asarray(i1["loss"]),
                               np.asarray(iN["loss"]), rtol=1e-5,
                               atol=1e-6)
    assert np.isfinite(float(i1["loss"]))


def test_moe_joint_rejected():
    cfg = _cfg(joint_experts=2)
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    feats, feat_lens, labels, label_lens = _batch(cfg, seed=3)
    with pytest.raises(ValueError, match="MoE"):
        loss_fn(params, cfg, feats, feat_lens, labels, label_lens,
                ctc_weight=0.1)


def test_train_cli_ctc_weight(capsys):
    import json

    import train
    train.main(["--config", "smoke", "--steps", "3", "--batch-size", "2",
                "--max-frames", "40", "--max-labels", "5",
                "--log-every", "1", "--ctc-weight", "0.3",
                "--data-parallel", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["steps"] == 3
    assert np.isfinite(res["final_loss"])


@pytest.mark.parametrize("mode", ["tp", "sp"])
def test_model_parallel_ctc_weight_lockstep(mode):
    """--ctc-weight under tensor/sequence parallelism follows the
    single-device trajectory (the CTC head is replicated over the model
    axis)."""
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=2,
                       total_steps=6, loss_impl="xla", ctc_weight=0.3)
    feats, feat_lens, labels, label_lens = _batch(cfg, B=2, seed=5)
    batch = (jnp.tile(feats, (4, 1, 1)), jnp.tile(feat_lens, (4,)),
             jnp.tile(labels, (4, 1)), jnp.tile(label_lens, (4,)))

    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg)
    want = []
    for _ in range(2):
        state, info = step1(state, *batch)
        want.append(float(info["loss"]))

    mesh = tp.make_mesh_2d(2, 4)
    key = jax.random.PRNGKey(0)
    if mode == "tp":
        mp_state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
            key, cfg, tcfg, 4))
    else:
        mp_state = tp.replicate_state(mesh, tp.init_sp_train_state(
            key, cfg, tcfg))
    stepN = tp.make_tp_train_step(cfg, tcfg, mesh, mode=mode)
    mp_batch = tp.shard_batch_2d(mesh, batch)
    got = []
    for _ in range(2):
        mp_state, info = stepN(mp_state, *mp_batch)
        got.append(float(info["loss"]))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("mode", ["tp", "sp"])
def test_model_parallel_ctc_pretrain_step_lockstep(mode):
    """The CTC-pretraining phase step under tp/sp matches the
    single-device ctc step loss."""
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=2,
                       total_steps=6, loss_impl="xla")
    feats, feat_lens, labels, label_lens = _batch(cfg, B=2, seed=7)
    batch = (jnp.tile(feats, (4, 1, 1)), jnp.tile(feat_lens, (4,)),
             jnp.tile(labels, (4, 1)), jnp.tile(label_lens, (4,)))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg, loss_kind="ctc")(state, *batch)
    mesh = tp.make_mesh_2d(2, 4)
    key = jax.random.PRNGKey(0)
    if mode == "tp":
        mp_state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
            key, cfg, tcfg, 4))
    else:
        mp_state = tp.replicate_state(mesh, tp.init_sp_train_state(
            key, cfg, tcfg))
    stepN = tp.make_tp_train_step(cfg, tcfg, mesh, mode=mode,
                                  loss_kind="ctc")
    _, infoN = stepN(mp_state, *tp.shard_batch_2d(mesh, batch))
    np.testing.assert_allclose(float(infoN["loss"]), float(info1["loss"]),
                               rtol=2e-5)
