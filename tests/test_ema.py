"""Polyak (EMA) weight averaging: off-by-default structure, exact
recursion, DP lockstep, checkpoint roundtrip + --use-ema decode."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.loop import (TrainState, init_train_state,
                                           make_train_step)


def _cfg():
    return TransducerConfig(input_dim=8, enc_layers=1, enc_hidden=32,
                            pred_layers=1, pred_hidden=32, embed_dim=16,
                            joint_dim=32, vocab_size=16,
                            compute_dtype="float32")


def _batch(rng, B=4, T=10, U=4):
    return (jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
            jnp.full((B,), T, jnp.int32),
            jnp.asarray(rng.integers(1, 16, size=(B, U)), jnp.int32),
            jnp.full((B,), U, jnp.int32))


def test_ema_off_keeps_state_structure():
    state = init_train_state(jax.random.PRNGKey(0), _cfg(),
                             TrainConfig(batch_size=4))
    assert state.ema is None
    step = make_train_step(_cfg(), TrainConfig(batch_size=4, warmup_steps=2,
                                               total_steps=10))
    state, _ = step(state, *_batch(np.random.default_rng(0)))
    assert state.ema is None


def test_ema_matches_hand_recursion():
    cfg, d = _cfg(), 0.9
    tcfg = TrainConfig(batch_size=4, warmup_steps=2, total_steps=20,
                       ema_decay=d)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    # EMA starts at the initial params
    jax.tree.map(lambda e, p: np.testing.assert_array_equal(
        np.asarray(e), np.asarray(p)), state.ema, state.params)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(1)
    expect = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, _ = step(state, *_batch(rng))
        expect = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expect, state.params)
    jax.tree.map(lambda e, x: np.testing.assert_allclose(
        np.asarray(e), x, rtol=1e-6, atol=1e-7), state.ema, expect)
    # the average lags the live params (they moved)
    moved = jax.tree.map(lambda e, p: float(np.max(np.abs(
        np.asarray(e) - np.asarray(p)))), state.ema, state.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_ema_dp_matches_single_device():
    from rnn_transducer_tpu.parallel.mesh import make_mesh, replicate

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=20,
                       ema_decay=0.95)
    rng = np.random.default_rng(2)
    batch = _batch(rng, B=8)

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        b = batch
        if mesh is not None:
            from rnn_transducer_tpu.parallel.mesh import shard_batch
            state = TrainState(params=replicate(mesh, state.params),
                               opt_state=replicate(mesh, state.opt_state),
                               step=replicate(mesh, state.step),
                               ema=replicate(mesh, state.ema))
            b = shard_batch(mesh, b)
        step = make_train_step(cfg, tcfg, mesh=mesh)
        for _ in range(2):
            state, _ = step(state, *b)
        return jax.device_get(state.ema)

    e1 = run(None)
    e2 = run(make_mesh(4))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), e1, e2)


def test_ema_checkpoint_roundtrip_and_prefer_ema(tmp_path):
    from rnn_transducer_tpu.train import checkpoint as ckpt

    cfg = _cfg()
    tcfg = TrainConfig(batch_size=4, warmup_steps=2, total_steps=20,
                       ema_decay=0.9)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    state, _ = step(state, *_batch(np.random.default_rng(3)))
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(d, 1, dataclasses.asdict(state), model_cfg=cfg,
                         train_config=dataclasses.asdict(tcfg))
    live, _, _, _ = ckpt.load_plain_params(d)
    ema, _, _, _ = ckpt.load_plain_params(d, prefer_ema=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), live, jax.device_get(state.params))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), ema, jax.device_get(state.ema))

    # checkpoints without EMA reject prefer_ema with a clear error
    tcfg0 = TrainConfig(batch_size=4)
    s0 = init_train_state(jax.random.PRNGKey(0), cfg, tcfg0)
    d0 = str(tmp_path / "ck0")
    ckpt.save_checkpoint(d0, 1, dataclasses.asdict(s0), model_cfg=cfg,
                         train_config=dataclasses.asdict(tcfg0))
    with pytest.raises(ValueError):
        ckpt.load_plain_params(d0, prefer_ema=True)


def test_train_cli_ema_then_recognize_use_ema(tmp_path, capsys):
    import recognize
    import train

    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--data", "synthetic", "--steps", "4",
                "--batch-size", "4", "--ema-decay", "0.9",
                "--data-parallel", "1", "--ckpt-dir", ck])
    capsys.readouterr()
    recognize.main(["--ckpt-dir", ck, "--data", "synthetic",
                    "--batches", "1", "--batch-size", "2", "--use-ema",
                    "--max-symbols", "8"])
    cap = capsys.readouterr()
    assert "EMA params" in cap.err
    assert json.loads(cap.out.strip().splitlines()[-1])["mode"] == "greedy"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_ema_matches_hand_recursion():
    """EMA under tensor parallelism: the sharded EMA tree, merged back to
    plain params, equals the hand recursion over the merged live-param
    trajectory."""
    from rnn_transducer_tpu.parallel import tp

    cfg, d = _cfg(), 0.9
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=20,
                       ema_decay=d)
    mesh = tp.make_mesh_2d(2, 4)
    state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    step = tp.make_tp_train_step(cfg, tcfg, mesh, mode="tp")
    rng = np.random.default_rng(1)
    expect = jax.tree.map(
        np.asarray, tp.merge_params_tp(jax.device_get(state.params), cfg))
    for _ in range(2):
        batch = tp.shard_batch_2d(mesh, _batch(rng, B=8))
        state, _ = step(state, *batch)
        merged = tp.merge_params_tp(jax.device_get(state.params), cfg)
        expect = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p), expect, merged)
    got = tp.merge_params_tp(jax.device_get(state.ema), cfg)
    jax.tree.map(lambda e, x: np.testing.assert_allclose(
        np.asarray(e), x, rtol=1e-5, atol=1e-6), got, expect)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_cli_model_parallel_ema_roundtrip(tmp_path, capsys):
    """tp training with --ema-decay checkpoints the sharded EMA;
    recognize --use-ema merges and decodes from it."""
    import recognize
    import train

    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--data", "synthetic",
                "--steps", "2", "--batch-size", "4", "--max-frames", "40",
                "--max-labels", "5", "--log-every", "1",
                "--ema-decay", "0.9", "--data-parallel", "2",
                "--model-parallel", "4", "--parallel-mode", "tp",
                "--ckpt-dir", ck])
    capsys.readouterr()
    recognize.main(["--ckpt-dir", ck, "--data", "synthetic",
                    "--batches", "1", "--batch-size", "2", "--use-ema",
                    "--max-symbols", "8"])
    cap = capsys.readouterr()
    assert "EMA params" in cap.err
    assert json.loads(cap.out.strip().splitlines()[-1])["mode"] == "greedy"
