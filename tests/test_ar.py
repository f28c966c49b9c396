"""Alignment-restricted RNN-T training (loss_impl="ar").

The band comes from a Viterbi alignment (ops/rnnt_align) instead of the
simple joiner's posteriors: emit_frames_device (the jittable backtrace),
alignment_bounds (band construction), the loss_fn branch, guards, DP
lockstep, and the CLI path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.rnnt_align import (backtrace_emit_frames,
                                               emit_frames_device,
                                               rnnt_viterbi)
from rnn_transducer_tpu.ops.rnnt_pruned import alignment_bounds
from rnn_transducer_tpu.train.loop import (init_train_state, loss_fn,
                                           make_train_step)

CFG = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                       pred_hidden=32, embed_dim=16, joint_dim=32,
                       vocab_size=12, input_dim=8, compute_dtype="float32")


def _batch(B=4, T=12, U=6, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(B, T, CFG.input_dim)), jnp.float32)
    fl = jnp.asarray(rng.integers(T // 2, T + 1, size=(B,)), jnp.int32)
    labels = jnp.asarray(rng.integers(1, CFG.vocab_size, size=(B, U)),
                         jnp.int32)
    ll = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    return feats, fl, labels, ll


def test_emit_frames_device_matches_host():
    rng = np.random.default_rng(3)
    for trial in range(4):
        B, T, U1 = 5, 9, 7
        lpb = jnp.asarray(rng.normal(size=(B, T, U1)), jnp.float32)
        lpy = jnp.asarray(rng.normal(size=(B, T, U1)), jnp.float32)
        fl = jnp.asarray(rng.integers(1, T + 1, size=(B,)), jnp.int32)
        ll = jnp.asarray(rng.integers(0, U1, size=(B,)), jnp.int32)
        _, K = rnnt_viterbi(lpb, lpy, fl, ll)
        host = backtrace_emit_frames(K, fl, ll)
        dev = np.asarray(jax.jit(emit_frames_device)(K, fl, ll))
        np.testing.assert_array_equal(dev, host)


def test_alignment_bounds_validity_and_coverage():
    rng = np.random.default_rng(5)
    B, T, U, S = 6, 14, 9, 4
    U1 = U + 1
    fl = jnp.asarray(rng.integers(2, T + 1, size=(B,)), jnp.int32)
    ll = jnp.asarray(rng.integers(1, U + 1, size=(B,)), jnp.int32)
    # a random monotone alignment: emit frames sorted within [0, fl)
    emit = np.full((B, U), -1, np.int32)
    for b in range(B):
        emit[b, : int(ll[b])] = np.sort(
            rng.integers(0, int(fl[b]), size=int(ll[b])))
    sb = np.asarray(alignment_bounds(jnp.asarray(emit), T, S, fl, ll, U1))
    for b in range(B):
        t_len, u_len = int(fl[b]), int(ll[b])
        row = sb[b, :t_len]
        # the band starts at the lattice origin unless the terminal
        # raise must override it (more labels than the jump cap can
        # reach from u=0 — the exact path fits no (S, jump-capped) band)
        if u_len - (S - 1) <= (t_len - 1) * (S - 1):
            assert row[0] == 0
        assert (np.diff(row) >= 0).all()
        assert (np.diff(row) <= S - 1).all()
        assert (row >= 0).all() and (row <= U1 - S).all()
        # terminal cell inside the band at the last frame
        assert row[-1] <= u_len <= row[-1] + S - 1


def test_ar_loss_equals_full_when_band_covers():
    feats, fl, labels, ll = _batch()
    params = m.init_params(jax.random.PRNGKey(0), CFG)
    U1 = labels.shape[1] + 1
    full, _ = loss_fn(params, CFG, feats, fl, labels, ll, loss_impl="xla")
    ar, _ = loss_fn(params, CFG, feats, fl, labels, ll, loss_impl="ar",
                    ar_range=U1)
    np.testing.assert_allclose(float(ar), float(full), rtol=2e-5)


def test_ar_loss_upper_bounds_full_and_has_grads():
    feats, fl, labels, ll = _batch(seed=2)
    params = m.init_params(jax.random.PRNGKey(1), CFG)
    full, full_pu = loss_fn(params, CFG, feats, fl, labels, ll,
                            loss_impl="xla")
    (ar, ar_pu), grads = jax.value_and_grad(
        lambda p: loss_fn(p, CFG, feats, fl, labels, ll, loss_impl="ar",
                          ar_range=3, ar_left=1), has_aux=True)(params)
    # restricting paths can only remove probability mass
    assert np.all(np.asarray(ar_pu) >= np.asarray(full_pu) - 1e-4)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_ar_teacher_alignment_runs_and_compat_guard():
    from rnn_transducer_tpu.train.loop import check_ar_compat
    feats, fl, labels, ll = _batch(seed=4)
    params = m.init_params(jax.random.PRNGKey(2), CFG)
    t_params = m.init_params(jax.random.PRNGKey(3), CFG)
    ar, _ = loss_fn(params, CFG, feats, fl, labels, ll, loss_impl="ar",
                    ar_range=4, align_cfg=CFG, teacher_params=t_params)
    assert np.isfinite(float(ar))
    bad = TransducerConfig(**{**CFG.__dict__, "time_reduction": 2})
    with pytest.raises(ValueError, match="time_reduction"):
        check_ar_compat(CFG, bad)


def test_ar_train_step_dp_matches_single_device():
    from rnn_transducer_tpu.parallel.mesh import make_mesh, shard_batch

    feats, fl, labels, ll = _batch(B=8, seed=6)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10,
                       ar_range=3, seed=0)
    key = jax.random.PRNGKey(7)
    s1 = init_train_state(key, CFG, tcfg)
    step1 = make_train_step(CFG, tcfg)
    s1, info1 = step1(s1, feats, fl, labels, ll)

    mesh = make_mesh(2)
    s2 = init_train_state(key, CFG, tcfg)
    step2 = make_train_step(CFG, tcfg, mesh=mesh)
    b = shard_batch(mesh, (feats, fl, labels, ll))
    s2, info2 = step2(s2, *b)
    np.testing.assert_allclose(float(info1["loss"]), float(info2["loss"]),
                               rtol=1e-6)
    for a, c in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_ar_guards():
    tcfg = TrainConfig(ar_range=3, distill_weight=0.5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(CFG, tcfg, teacher_cfg=CFG)
    tcfg2 = TrainConfig(ar_range=3, loss_impl="pruned")
    with pytest.raises(ValueError, match="loss_impl"):
        make_train_step(CFG, tcfg2)
    moe_cfg = TransducerConfig(**{**CFG.__dict__, "joint_experts": 2})
    feats, fl, labels, ll = _batch()
    params = m.init_params(jax.random.PRNGKey(0), moe_cfg)
    with pytest.raises(ValueError, match="MoE"):
        loss_fn(params, moe_cfg, feats, fl, labels, ll, loss_impl="ar",
                ar_range=3)


def test_ar_cli_self_align(tmp_path):
    from train import main as train_main
    out = train_main(["--config", "smoke", "--steps", "4",
                      "--batch-size", "4", "--max-frames", "20",
                      "--max-labels", "6", "--ar-range", "3",
                      "--eval-every", "1000", "--data-parallel", "1"])
    assert out is not None and int(out.step) == 4


def test_ar_cli_teacher_align(tmp_path):
    """--ar-align-from: a bootstrap checkpoint provides the band."""
    from train import main as train_main
    ck = tmp_path / "aligner"
    train_main(["--config", "smoke", "--steps", "2", "--batch-size", "4",
                "--max-frames", "20", "--max-labels", "6",
                "--ckpt-dir", str(ck), "--ckpt-every", "2",
                "--eval-every", "1000", "--data-parallel", "1"])
    out = train_main(["--config", "smoke", "--steps", "3",
                      "--batch-size", "4", "--max-frames", "20",
                      "--max-labels", "6", "--ar-range", "3",
                      "--ar-align-from", str(ck),
                      "--eval-every", "1000", "--data-parallel", "1"])
    assert out is not None and int(out.step) == 3


def test_ar_model_parallel_lockstep():
    """AR training under --parallel-mode sp AND tp, self-aligned and
    teacher-aligned: 2-step loss trajectory == the single-device AR step
    (parallel/tp.py sp_ar_loss_fn / tp_ar_loss_fn; the aligner checkpoint
    rides as the replicated traced argument)."""
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    feats, fl, labels, ll = _batch(B=8, seed=6)
    batch = (feats, fl, labels, ll)
    teacher = m.init_params(jax.random.PRNGKey(3), CFG)

    for teach in (False, True):
        tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                           ar_range=3, ar_left=1, seed=0)
        kw = dict(teacher_cfg=CFG) if teach else {}
        extra = (teacher,) if teach else ()
        state = init_train_state(jax.random.PRNGKey(7), CFG, tcfg)
        step1 = make_train_step(CFG, tcfg, **kw)
        want = []
        for _ in range(2):
            state, info = step1(state, *batch, *extra)
            want.append(float(info["loss"]))

        mesh = tp.make_mesh_2d(2, 4)
        batch2 = tp.shard_batch_2d(mesh, batch)
        sps = tp.replicate_state(mesh, tp.init_sp_train_state(
            jax.random.PRNGKey(7), CFG, tcfg))
        step_sp = tp.make_tp_train_step(CFG, tcfg, mesh, "sp", **kw)
        got_sp = []
        for _ in range(2):
            sps, info = step_sp(sps, *batch2, *extra)
            got_sp.append(float(info["loss"]))
        np.testing.assert_allclose(got_sp, want, rtol=2e-5,
                                   err_msg=f"sp teach={teach}")

        tps = tp.shard_tp_state(mesh, tp.init_tp_train_state(
            jax.random.PRNGKey(7), CFG, tcfg, 4))
        step_tp = tp.make_tp_train_step(CFG, tcfg, mesh, "tp", **kw)
        got_tp = []
        for _ in range(2):
            tps, info = step_tp(tps, *batch2, *extra)
            got_tp.append(float(info["loss"]))
        np.testing.assert_allclose(got_tp, want, rtol=2e-5,
                                   err_msg=f"tp teach={teach}")
