"""Conformer encoder family: exact pad-length invariance, batch
independence, pad-gradient isolation, toy-task training through the
standard loss/decode stack, streaming guard, CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig


def _cfg(**kw):
    base = dict(enc_type="conformer", input_dim=8, enc_layers=2,
                enc_hidden=32, enc_heads=4, enc_ff_mult=2,
                enc_conv_kernel=5, pred_layers=1, pred_hidden=32,
                embed_dim=16, joint_dim=32, vocab_size=12,
                compute_dtype="float32")
    base.update(kw)
    return TransducerConfig(**base)


def test_pad_length_invariance():
    """Valid frames' encoder output must be bit-for-bit independent of
    how much padding follows them (attention key mask + conv-module
    masking are exactly right)."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 12
    feats = rng.normal(size=(B, T, 8)).astype(np.float32)
    lens = np.array([12, 9, 5], np.int32)
    out1, l1 = m.encode(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    # same utterances with 8 extra pad frames of GARBAGE
    pad = rng.normal(size=(B, 8, 8)).astype(np.float32) * 100.0
    feats2 = np.concatenate([feats, pad], axis=1)
    out2, l2 = m.encode(params, cfg, jnp.asarray(feats2), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    o1, o2 = np.asarray(out1), np.asarray(out2)
    for b in range(B):
        np.testing.assert_allclose(o2[b, : int(l1[b])], o1[b, : int(l1[b])],
                                   atol=1e-5)
    # pad region is zeroed by contract
    for b in range(B):
        assert np.all(o2[b, int(l1[b]):] == 0.0)


def test_pad_invariance_with_time_reduction():
    cfg = _cfg(time_reduction=2)
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(2, 10, 8)).astype(np.float32)
    lens = np.array([10, 6], np.int32)
    out1, l1 = m.encode(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    feats2 = np.concatenate(
        [feats, 50.0 * rng.normal(size=(2, 6, 8)).astype(np.float32)], 1)
    out2, l2 = m.encode(params, cfg, jnp.asarray(feats2), jnp.asarray(lens))
    assert list(np.asarray(l1)) == [5, 3]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for b in range(2):
        np.testing.assert_allclose(np.asarray(out2)[b, : int(l1[b])],
                                   np.asarray(out1)[b, : int(l1[b])],
                                   atol=1e-5)


def test_batch_independence():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(4, 9, 8)).astype(np.float32)
    lens = np.array([9, 7, 9, 4], np.int32)
    full, _ = m.encode(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    for b in (0, 1, 3):
        solo, _ = m.encode(params, cfg, jnp.asarray(feats[b:b + 1]),
                           jnp.asarray(lens[b:b + 1]))
        np.testing.assert_allclose(np.asarray(solo)[0, : int(lens[b])],
                                   np.asarray(full)[b, : int(lens[b])],
                                   atol=1e-5)


def test_pad_frames_get_zero_gradient():
    """d loss / d feats at padded frames is exactly zero — padding can
    never train the model."""
    from rnn_transducer_tpu.train.loop import loss_fn

    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 10, 8)), jnp.float32)
    fl = jnp.asarray([10, 6], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 12, size=(2, 3)), jnp.int32)
    ll = jnp.asarray([3, 2], jnp.int32)
    g = jax.grad(lambda f: loss_fn(params, cfg, f, fl, labels, ll,
                                   loss_impl="xla")[0])(feats)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.all(g[1, 6:] == 0.0)
    assert np.any(g[1, :6] != 0.0)


def test_conformer_trains_toy_task():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    T_, U_, V_ = 20, 4, 6
    cfg = _cfg(input_dim=V_, enc_layers=2, enc_hidden=32, enc_heads=4,
               enc_ff_mult=2, enc_conv_kernel=5, vocab_size=V_)
    tcfg = TrainConfig(batch_size=8, learning_rate=2e-3, warmup_steps=30,
                       total_steps=500, loss_impl="xla")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))

    def toy(rng, n):
        feats = np.zeros((n, T_, V_), np.float32)
        labels = rng.integers(1, V_, size=(n, U_)).astype(np.int32)
        for i in range(n):
            for u in range(U_):
                feats[i, 4 * u: 4 * u + 4, labels[i, u]] = 1.0
        feats += rng.normal(scale=0.05, size=feats.shape).astype(np.float32)
        return jnp.asarray(feats), jnp.asarray(labels)

    rng = np.random.default_rng(7)
    fl = jnp.full((8,), T_, jnp.int32)
    ll = jnp.full((8,), U_, jnp.int32)
    for _ in range(500):
        feats, labels = toy(rng, 8)
        state, info = step(state, feats, fl, labels, ll)
    assert np.isfinite(float(info["loss"]))

    rng = np.random.default_rng(99)
    feats, labels = toy(rng, 16)
    toks, lens = recognize_greedy(state.params, cfg, feats,
                                  jnp.full((16,), T_, jnp.int32),
                                  max_symbols=8)
    toks, lens = np.asarray(toks), np.asarray(lens)
    exact = sum(list(toks[i, : int(lens[i])]) == list(np.asarray(labels)[i])
                for i in range(16))
    assert exact >= 14, exact


def test_beam_decode_and_streaming_guard():
    from rnn_transducer_tpu.decode.beam import recognize_beam

    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    fl = jnp.asarray([8, 6], jnp.int32)
    toks, lens, scores = recognize_beam(params, cfg, feats, fl, beam=3,
                                        max_symbols=6, expansions=2)
    assert toks.shape == (2, 3, 6)
    with pytest.raises(AssertionError, match="requires enc_att_left"):
        m.init_enc_state(cfg, 2)


def test_train_cli_conformer(tmp_path, capsys):
    import json

    import train

    # conformer_smoke exercises the same CLI path (enc_type routing, frame
    # stacking, conformer train step) as libri100_conformer at ~1/100 the
    # FLOPs — the full 8x512 config took 422 s of the suite on one core.
    train.main(["--config", "conformer_smoke", "--data", "synthetic",
                "--steps", "2", "--batch-size", "8", "--loss-impl", "xla"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert np.isfinite(json.loads(out)["final_loss"])


def test_conformer_sequence_parallel_train():
    """Conformer training under --parallel-mode sp: the encoder runs
    replicated, the joint+loss frames shard — the 2-step loss
    trajectory matches the single-device run."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg()
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 3)),
                         jnp.int32),
             jnp.full((8,), 3, jnp.int32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg)
    want = []
    for _ in range(2):
        state, info = step1(state, *batch)
        want.append(float(info["loss"]))
    mesh = tp.make_mesh_2d(2, 4)
    mp_state = tp.replicate_state(mesh, tp.init_sp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg))
    stepN = tp.make_tp_train_step(cfg, tcfg, mesh, mode="sp")
    mp_batch = tp.shard_batch_2d(mesh, batch)
    got = []
    for _ in range(2):
        mp_state, info = stepN(mp_state, *mp_batch)
        got.append(float(info["loss"]))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_conformer_tensor_parallel_train():
    """Conformer under tp: Megatron-style block sharding (heads / FFN
    channels / conv channels) — 2-step loss trajectory matches the
    single-device run, and the split→merge roundtrip is exact."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg()  # d_model 32, heads 4 — divisible by mp=4
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rt = tp.merge_params_tp(tp.split_params_tp(params, cfg, 4), cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, rt)

    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 3)),
                         jnp.int32),
             jnp.full((8,), 3, jnp.int32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg)
    want = []
    for _ in range(2):
        state, info = step1(state, *batch)
        want.append(float(info["loss"]))
    mesh = tp.make_mesh_2d(2, 4)
    mp_state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    stepN = tp.make_tp_train_step(cfg, tcfg, mesh, mode="tp")
    mp_batch = tp.shard_batch_2d(mesh, batch)
    got = []
    for _ in range(2):
        mp_state, info = stepN(mp_state, *mp_batch)
        got.append(float(info["loss"]))
    np.testing.assert_allclose(got, want, rtol=3e-5)


def test_conformer_tp_streamable_config():
    """The causal/streamable conformer (enc_att_left > 0) trains under tp
    too (windowed attention + causal depthwise conv in the sharded
    block)."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(enc_att_left=3)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(1)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 3)),
                         jnp.int32),
             jnp.full((8,), 3, jnp.int32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg)(state, *batch)
    mesh = tp.make_mesh_2d(2, 4)
    mp_state = tp.shard_tp_state(mesh, tp.init_tp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    _, infoN = tp.make_tp_train_step(cfg, tcfg, mesh, mode="tp")(
        mp_state, *tp.shard_batch_2d(mesh, batch))
    np.testing.assert_allclose(float(infoN["loss"]), float(info1["loss"]),
                               rtol=3e-5)


def test_conformer_pipeline_parallel_train():
    """Conformer training under --parallel-mode pp: the d_model-uniform
    blocks GPipe-stage with no Dmax padding, frame stacking + in_proj
    run replicated before the pipeline (so time_reduction > 1 works) —
    2-step loss trajectory and merged post-step params == single
    device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import pipeline as pl, tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(enc_layers=4, time_reduction=2)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(7)
    batch = (jnp.asarray(rng.normal(size=(8, 12, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 12, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 3)),
                         jnp.int32),
             jnp.full((8,), 3, jnp.int32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg)
    want = []
    for _ in range(2):
        state, info = step1(state, *batch)
        want.append(float(info["loss"]))
    mesh = tp.make_mesh_2d(2, 4)
    mp_state = tp.shard_tp_state(mesh, pl.init_pp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    stepN = pl.make_pp_train_step(cfg, tcfg, mesh, microbatches=2)
    mp_batch = tp.shard_batch_2d(mesh, batch)
    got = []
    for _ in range(2):
        mp_state, info = stepN(mp_state, *mp_batch)
        got.append(float(info["loss"]))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    merged = pl.merge_params_pp(jax.device_get(mp_state.params), cfg)
    ref = jax.device_get(state.params)
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    for k, a in jax.tree_util.tree_flatten_with_path(merged)[0]:
        # atol 1e-4, not 1e-5: the attention key bias has an analytically
        # ZERO gradient (softmax shift invariance), so Adam normalizes
        # pure fp reduction-order noise to an O(lr) update that differs
        # between the microbatched and full-batch grad reductions.
        # Everything else matches to ~1e-6 (measured 2.2e-5 worst on k.b).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_r[jax.tree_util.keystr(k)]),
            atol=1e-4, err_msg=jax.tree_util.keystr(k))
