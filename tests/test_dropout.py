"""Inter-layer LSTM dropout + embedding dropout (TrainConfig.dropout /
embed_dropout, VERDICT r2 item 4): p=0 identity, determinism, DP lockstep,
training, and the train.py CLI flag / model-parallel guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.loop import init_train_state, make_train_step

CFG = TransducerConfig(enc_layers=2, enc_hidden=32, pred_layers=2,
                       pred_hidden=32, embed_dim=16, joint_dim=32,
                       vocab_size=16, input_dim=8, compute_dtype="float32")
PARAMS = m.init_params(jax.random.PRNGKey(0), CFG)


def _batch(B=4, T=10, U=3, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
            jnp.full((B,), T, jnp.int32),
            jnp.asarray(rng.integers(1, 16, size=(B, U)), jnp.int32),
            jnp.full((B,), U, jnp.int32))


def _tcfg(dropout=0.0, embed_dropout=0.0, B=4):
    return TrainConfig(batch_size=B, warmup_steps=2, total_steps=50,
                       loss_impl="xla", dropout=dropout,
                       embed_dropout=embed_dropout)


def _run(steps=1, B=4, mesh=None, **kw):
    from rnn_transducer_tpu.parallel.mesh import replicate, shard_batch
    from rnn_transducer_tpu.train.loop import TrainState

    tcfg = _tcfg(B=B, **kw)
    state = init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    if mesh is not None:
        state = TrainState(params=replicate(mesh, state.params),
                           opt_state=replicate(mesh, state.opt_state),
                           step=replicate(mesh, state.step))
    step = make_train_step(CFG, tcfg, mesh=mesh)
    batch = _batch(B=B)
    if mesh is not None:
        batch = shard_batch(mesh, batch)
    for _ in range(steps):
        state, info = step(state, *batch)
    return jax.device_get(state.params), float(info["loss"])


def test_no_rng_is_noop():
    """Without an rng the model functions ignore the rates entirely —
    decode/eval paths can never be perturbed by a train-time setting."""
    feats, feat_lens, labels, _ = _batch()
    a, la = m.encode(PARAMS, CFG, feats, feat_lens)
    b, lb = m.encode(PARAMS, CFG, feats, feat_lens, dropout=0.9, rng=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    pa, _ = m.predict(PARAMS, CFG, labels)
    pb, _ = m.predict(PARAMS, CFG, labels, dropout=0.9, embed_dropout=0.9,
                      rng=None)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_zero_rate_is_identity():
    p0, l0 = _run(dropout=0.0)
    p1, l1 = _run(dropout=0.0)
    assert l0 == l1
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_dropout_changes_and_is_deterministic():
    p0, l0 = _run(steps=3)
    pa, la = _run(steps=3, dropout=0.3, embed_dropout=0.2)
    pb, lb = _run(steps=3, dropout=0.3, embed_dropout=0.2)
    assert la != l0  # loss evaluated through dropped activations
    assert la == lb  # same seed/step -> same masks
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), pa, pb)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), p0, pa))
    assert max(diffs) > 0


def test_mask_rng_controls_loss():
    """loss_fn with two different dropout keys gives different losses (the
    masks really change with the key — i.e. across steps, since the train
    step folds the step counter into the key); the same key reproduces."""
    from rnn_transducer_tpu.train.loop import loss_fn

    feats, feat_lens, labels, label_lens = _batch()
    f = lambda key: float(loss_fn(
        PARAMS, CFG, feats, feat_lens, labels, label_lens, loss_impl="xla",
        dropout=0.4, embed_dropout=0.2, dropout_rng=key)[0])
    l1 = f(jax.random.PRNGKey(1))
    l1b = f(jax.random.PRNGKey(1))
    l2 = f(jax.random.PRNGKey(2))
    clean = float(loss_fn(PARAMS, CFG, feats, feat_lens, labels,
                          label_lens, loss_impl="xla")[0])
    assert l1 == l1b
    assert l1 != l2
    assert l1 != clean


def test_trains_with_dropout():
    tcfg = _tcfg(dropout=0.1, embed_dropout=0.1)
    state = init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = make_train_step(CFG, tcfg)
    batch = _batch()
    first = None
    for _ in range(40):
        state, info = step(state, *batch)
        first = float(info["loss"]) if first is None else first
    assert float(info["loss"]) < first


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dp_dropout_matches_single_device():
    from rnn_transducer_tpu.parallel.mesh import make_mesh

    p1, l1 = _run(B=8, dropout=0.25, embed_dropout=0.1)
    p2, l2 = _run(B=8, dropout=0.25, embed_dropout=0.1, mesh=make_mesh(4))
    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), p1, p2)


def test_cli_flag(tmp_path):
    import train as train_cli

    train_cli.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                    "--data", "synthetic", "--dropout", "0.2",
                    "--embed-dropout", "0.1", "--log-every", "1",
                    "--data-parallel", "1"])
    # (--dropout with --model-parallel is exercised by
    # tests/test_cli_parallel.py; the lockstep parity tests are below)


def _run_mp(mode, steps=2, **kw):
    """2-step loss trajectory under a dp2 x model4 (pp: dp4 x pp2) mesh
    with dropout, for lockstep comparison against the single-device
    make_train_step trajectory."""
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    tcfg = _tcfg(B=8, **kw)
    key = jax.random.PRNGKey(0)
    if mode == "pp":
        from rnn_transducer_tpu.parallel import pipeline as pl
        mesh = tp.make_mesh_2d(4, 2)
        state = tp.shard_tp_state(mesh, pl.init_pp_train_state(
            key, CFG, tcfg, 2))
        step = pl.make_pp_train_step(CFG, tcfg, mesh, microbatches=2)
    elif mode == "tp":
        mesh = tp.make_mesh_2d(2, 4)
        state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
            key, CFG, tcfg, 4))
        step = tp.make_tp_train_step(CFG, tcfg, mesh, mode=mode)
    else:
        mesh = tp.make_mesh_2d(2, 4)
        state = tp.replicate_state(mesh, tp.init_sp_train_state(key, CFG,
                                                                tcfg))
        step = tp.make_tp_train_step(CFG, tcfg, mesh, mode=mode)
    batch = tp.shard_batch_2d(mesh, _batch(B=8))
    losses = []
    for _ in range(steps):
        state, info = step(state, *batch)
        losses.append(float(info["loss"]))
    return losses


@pytest.mark.parametrize("mode", ["tp", "sp", "pp"])
def test_model_parallel_dropout_lockstep(mode):
    """Model-parallel training with dropout follows the single-device
    trajectory: the per-example mask keys are derived from the global
    batch position + step on every shard, so the 2-step loss sequence
    matches (step 2 also checks the dropout GRADIENTS agreed at step 1)
    — and differs from the no-dropout trajectory."""
    want = []
    from rnn_transducer_tpu.train.loop import TrainState  # noqa: F401
    tcfg = _tcfg(B=8, dropout=0.25, embed_dropout=0.1)
    state = init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = make_train_step(CFG, tcfg)
    batch = _batch(B=8)
    for _ in range(2):
        state, info = step(state, *batch)
        want.append(float(info["loss"]))
    got = _run_mp(mode, dropout=0.25, embed_dropout=0.1)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    clean = _run_mp(mode)
    assert abs(clean[0] - got[0]) > 1e-6
