"""Pipeline-parallel (GPipe) encoder vs the single-device model.

Validates parallel/pipeline.py on the virtual 8-device CPU mesh
(data=2 x model=4): stage split/merge roundtrips and full train steps
whose post-step parameters must match the single-device AdamW update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.parallel import pipeline as pl, tp
from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

PP = 4

CFG = TransducerConfig(enc_layers=4, enc_hidden=24, pred_layers=1,
                       pred_hidden=24, embed_dim=16, joint_dim=24,
                       vocab_size=16, input_dim=8, time_reduction=1)
CFG_BI = TransducerConfig(enc_layers=4, enc_hidden=16, bidirectional=True,
                          pred_layers=1, pred_hidden=16, embed_dim=8,
                          joint_dim=16, vocab_size=12, input_dim=8,
                          time_reduction=1)
TCFG = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10,
                   loss_impl="xla", grad_clip_norm=5.0)


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 2 * PP:
        pytest.skip("needs 8 devices")
    return tp.make_mesh_2d(2, PP)


def _batch(cfg, B=8, T=16, U=4, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32),
        jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32),
        jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)), jnp.int32),
        jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32),
    )


@pytest.mark.parametrize("cfg", [CFG, CFG_BI], ids=["uni", "bi"])
def test_pp_split_merge_roundtrip(cfg):
    params = m.init_params(jax.random.PRNGKey(5), cfg)
    merged = pl.merge_params_pp(pl.split_params_pp(params, cfg, PP), cfg)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cfg", [CFG, CFG_BI], ids=["uni", "bi"])
def test_pp_train_step_matches_single_device(mesh2, cfg):
    batch = _batch(cfg)
    state1 = init_train_state(jax.random.PRNGKey(5), cfg, TCFG)
    new1, info1 = make_train_step(cfg, TCFG)(state1, *batch)

    pps = tp.shard_tp_state(mesh2, pl.init_pp_train_state(
        jax.random.PRNGKey(5), cfg, TCFG, PP))
    step = pl.make_pp_train_step(cfg, TCFG, mesh2, microbatches=2)
    new_pp, info_pp = step(pps, *tp.shard_batch_2d(mesh2, batch))

    assert abs(float(info_pp["loss"]) - float(info1["loss"])) < 1e-4
    merged = pl.merge_params_pp(jax.device_get(new_pp.params), cfg)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(jax.device_get(new1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pp_rejects_time_reduction():
    cfg = TransducerConfig(enc_layers=4, time_reduction=2)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        pl.split_params_pp(params, cfg, PP)
