"""Training loop: convergence on a learnable task, DP-sharding equivalence,
bucketing, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnn_transducer_tpu.data.bucketing import bucket_stream
from rnn_transducer_tpu.data.synthetic import learnable_batch, random_batch
from rnn_transducer_tpu.decode.greedy import recognize_greedy
from rnn_transducer_tpu.decode.metrics import error_rate, tokens_to_lists
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rnn_transducer_tpu.train.loop import (
    init_train_state,
    make_eval_step,
    make_train_step,
)


def _tiny_cfg(vocab=8):
    return TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                            pred_hidden=32, embed_dim=16, joint_dim=32,
                            vocab_size=vocab, input_dim=8,
                            compute_dtype="float32")


def test_loss_decreases_and_decodes_labels():
    cfg = _tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=3e-3, warmup_steps=10,
                       total_steps=300, grad_clip_norm=5.0)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(0)
    first_loss = None
    for i in range(220):
        feats, fl, labels, ll = learnable_batch(rng, tcfg.batch_size,
                                                n_labels=3, input_dim=8,
                                                vocab=cfg.vocab_size,
                                                frames_per_label=2)
        state, info = step(state, jnp.asarray(feats), jnp.asarray(fl),
                           jnp.asarray(labels), jnp.asarray(ll))
        if first_loss is None:
            first_loss = float(info["loss"])
    last_loss = float(info["loss"])
    assert last_loss < first_loss * 0.35, (first_loss, last_loss)

    # Greedy decode must mostly recover the labels now.
    feats, fl, labels, ll = learnable_batch(rng, 8, n_labels=3, input_dim=8,
                                            vocab=cfg.vocab_size,
                                            frames_per_label=2)
    toks, lens = recognize_greedy(state.params, cfg, jnp.asarray(feats),
                                  jnp.asarray(fl), max_symbols=6)
    hyps = tokens_to_lists(toks, lens)
    refs = tokens_to_lists(labels, ll)
    assert error_rate(refs, hyps) < 0.5


def test_data_parallel_matches_single_device():
    cfg = _tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=5,
                       total_steps=100)
    rng = np.random.default_rng(1)
    feats, fl, labels, ll = random_batch(rng, 8, 12, 4, cfg.input_dim,
                                         cfg.vocab_size)
    batch = tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))

    state1 = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg)
    state1, info1 = step1(state1, *batch)

    mesh = make_mesh(8)
    state8 = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    state8 = jax.tree.map(lambda x: x, state8)  # fresh copy
    from rnn_transducer_tpu.train.loop import TrainState
    state8 = TrainState(params=replicate(mesh, state8.params),
                        opt_state=replicate(mesh, state8.opt_state),
                        step=replicate(mesh, state8.step))
    step8 = make_train_step(cfg, tcfg, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    state8, info8 = step8(state8, *sharded)

    np.testing.assert_allclose(float(info8["loss"]), float(info1["loss"]),
                               rtol=1e-5)
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("impl", ["fused", "pallas"])
def test_data_parallel_with_pallas_kernels(impl):
    """Pallas kernels have no SPMD rule; shard_map must make DP exact."""
    cfg = _tiny_cfg()
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=5,
                       total_steps=100, loss_impl=impl)
    rng = np.random.default_rng(7)
    feats, fl, labels, ll = random_batch(rng, 8, 12, 4, cfg.input_dim,
                                         cfg.vocab_size)
    batch = tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))
    state1 = init_train_state(jax.random.PRNGKey(9), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg)(state1, *batch)

    from rnn_transducer_tpu.train.loop import TrainState
    mesh = make_mesh(8)
    state8 = init_train_state(jax.random.PRNGKey(9), cfg, tcfg)
    state8 = TrainState(params=replicate(mesh, state8.params),
                        opt_state=replicate(mesh, state8.opt_state),
                        step=replicate(mesh, state8.step))
    _, info8 = make_train_step(cfg, tcfg, mesh=mesh)(
        state8, *shard_batch(mesh, batch))
    np.testing.assert_allclose(float(info8["loss"]), float(info1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(info8["grad_norm"]),
                               float(info1["grad_norm"]), rtol=1e-4)


def test_bucket_stream_shapes_and_drop_accounting():
    rng = np.random.default_rng(2)
    def gen():
        for _ in range(40):
            T = int(rng.integers(5, 30))
            U = int(rng.integers(1, 8))
            yield (rng.normal(size=(T, 4)).astype(np.float32),
                   rng.integers(1, 9, size=U).astype(np.int32))
    buckets = ((10, 4), (20, 8))
    seen = set()
    for feats, fl, labels, ll in bucket_stream(gen(), buckets, batch_size=4):
        assert (feats.shape[1], labels.shape[1]) in buckets
        assert feats.shape[0] == 4
        assert np.all(fl <= feats.shape[1]) and np.all(ll <= labels.shape[1])
        seen.add((feats.shape[1], labels.shape[1]))
    assert seen  # at least one bucket produced batches


def test_nonfinite_batch_skips_update():
    cfg = _tiny_cfg()
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-2, warmup_steps=1,
                       total_steps=100)
    state = init_train_state(jax.random.PRNGKey(5), cfg, tcfg)
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(5)
    feats, fl, labels, ll = random_batch(rng, 4, 8, 3, cfg.input_dim,
                                         cfg.vocab_size)
    feats[0, 0, 0] = np.nan
    params_before = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    state, info = step(state, jnp.asarray(feats), jnp.asarray(fl),
                       jnp.asarray(labels), jnp.asarray(ll))
    assert int(info["skipped_nonfinite"]) == 1
    for a, b in zip(params_before, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert int(state.step) == 1  # step counter still advances


def test_grad_accumulation_matches_big_batch():
    """k microbatches with grad_accum=k == one optimizer update on their
    average gradient (equal microbatch sizes)."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(11)
    feats, fl, labels, ll = random_batch(rng, 8, 10, 3, cfg.input_dim,
                                         cfg.vocab_size)
    halves = [tuple(jnp.asarray(x[i * 4:(i + 1) * 4]) for x in
                    (feats, fl, labels, ll)) for i in range(2)]
    full = tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))

    tcfg_acc = TrainConfig(batch_size=4, learning_rate=1e-3, warmup_steps=5,
                           total_steps=100, grad_accum=2)
    s_acc = init_train_state(jax.random.PRNGKey(3), cfg, tcfg_acc)
    step_acc = make_train_step(cfg, tcfg_acc)
    for h in halves:
        s_acc, _ = step_acc(s_acc, *h)

    tcfg_big = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=5,
                           total_steps=100)
    s_big = init_train_state(jax.random.PRNGKey(3), cfg, tcfg_big)
    s_big, _ = make_train_step(cfg, tcfg_big)(s_big, *full)

    for a, e in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(s_big.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-5, atol=1e-7)


def test_checkpoint_roundtrip(tmp_path):
    import dataclasses
    from rnn_transducer_tpu.train.checkpoint import (restore_checkpoint,
                                                     save_checkpoint)
    cfg = _tiny_cfg()
    tcfg = TrainConfig(batch_size=4)
    state = init_train_state(jax.random.PRNGKey(3), cfg, tcfg)
    tree = dataclasses.asdict(state)
    save_checkpoint(str(tmp_path / "ck"), 7, tree)
    target = dataclasses.asdict(init_train_state(jax.random.PRNGKey(4), cfg, tcfg))
    restored, step = restore_checkpoint(str(tmp_path / "ck"), target)
    assert step == 7
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
