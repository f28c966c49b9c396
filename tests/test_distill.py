"""Knowledge distillation (train/loop.py distill_loss_fn): lattice KD term
math, identity-teacher zero, convergence toward the teacher, DP lockstep,
compat guards, CLI."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.loop import (distill_loss_fn, init_train_state,
                                           loss_fn, make_train_step)

CFG = TransducerConfig(input_dim=8, enc_layers=1, enc_hidden=16,
                       pred_layers=1, pred_hidden=12, embed_dim=10,
                       joint_dim=14, vocab_size=11, compute_dtype="float32")
BIG = dataclasses.replace(CFG, enc_layers=2, enc_hidden=24,
                          bidirectional=True)


def _batch(seed=0, B=3, T=12, U=4):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, T, CFG.input_dim)).astype(np.float32)
    fl = (T - rng.integers(0, T // 2, size=B)).astype(np.int32)
    labels = rng.integers(1, CFG.vocab_size, size=(B, U)).astype(np.int32)
    ll = np.maximum(U - rng.integers(0, U, size=B), 1).astype(np.int32)
    return tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))


def _params(cfg, seed):
    return init_train_state(jax.random.PRNGKey(seed), cfg,
                            TrainConfig()).params


def test_identity_teacher_adds_nothing():
    """teacher == student: KL(p || p) = 0, so the loss equals plain NLL."""
    p = _params(CFG, 0)
    batch = _batch()
    want, want_pu = loss_fn(p, CFG, *batch, loss_impl="xla")
    got, got_pu = distill_loss_fn(p, p, CFG, CFG, *batch,
                                  distill_weight=0.7, distill_temp=1.0)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_pu), np.asarray(want_pu),
                               rtol=1e-6)


def test_kd_term_matches_numpy_oracle():
    """KD contribution == hand-computed masked tau^2-scaled KL between the
    two models' softened joint posteriors (teacher may be a DIFFERENT
    architecture — bidirectional, wider)."""
    sp, tp_ = _params(CFG, 1), _params(BIG, 2)
    feats, fl, labels, ll = _batch(1)
    tau, w = 2.0, 0.45
    _, plain_pu = loss_fn(sp, CFG, feats, fl, labels, ll, loss_impl="xla")
    _, dist_pu = distill_loss_fn(sp, tp_, CFG, BIG, feats, fl, labels, ll,
                                 distill_weight=w, distill_temp=tau)
    s_logits, enc_lens = m.forward(sp, CFG, feats, fl, labels)
    t_logits, _ = m.forward(tp_, BIG, feats, fl, labels)
    s, t = (np.asarray(s_logits, np.float64) / tau,
            np.asarray(t_logits, np.float64) / tau)
    lp_s = s - np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1,
                      keepdims=True)) - s.max(-1, keepdims=True)
    lp_t = t - np.log(np.exp(t - t.max(-1, keepdims=True)).sum(-1,
                      keepdims=True)) - t.max(-1, keepdims=True)
    kl = (np.exp(lp_t) * (lp_t - lp_s)).sum(-1)
    B, T, U1 = kl.shape
    mask = ((np.arange(T)[None, :, None] < np.asarray(enc_lens)[:, None,
             None]) & (np.arange(U1)[None, None, :]
                       <= np.asarray(ll)[:, None, None]))
    want_kd = (kl * mask).sum((1, 2)) / mask.sum((1, 2)) * tau * tau
    got_kd = (np.asarray(dist_pu) - np.asarray(plain_pu)) / w
    np.testing.assert_allclose(got_kd, want_kd, rtol=1e-4, atol=1e-6)
    assert (want_kd > 0).all()  # different models: strictly positive KL


def test_distill_step_moves_student_toward_teacher():
    """Pure-KD-dominated training on a fixed batch shrinks the
    student-teacher lattice KL."""
    tcfg = TrainConfig(batch_size=3, learning_rate=5e-3, warmup_steps=1,
                       total_steps=40, lr_schedule="constant",
                       distill_weight=200.0, distill_temp=1.0,
                       loss_impl="xla")
    teacher = _params(CFG, 3)
    state = init_train_state(jax.random.PRNGKey(4), CFG, tcfg)
    batch = _batch(2)
    step = make_train_step(CFG, tcfg, teacher_cfg=CFG)

    def kd_now(params):
        _, plain = loss_fn(params, CFG, *batch, loss_impl="xla")
        _, dist = distill_loss_fn(params, teacher, CFG, CFG, *batch,
                                  distill_weight=1.0)
        return float(jnp.mean(dist - plain))

    kd0 = kd_now(state.params)
    for _ in range(25):
        state, info = step(state, *batch, teacher)
    assert np.isfinite(float(info["loss"]))
    kd1 = kd_now(state.params)
    assert kd1 < 0.5 * kd0, (kd0, kd1)


def test_distill_dp_matches_single_device():
    from rnn_transducer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_batch)
    from rnn_transducer_tpu.train.loop import TrainState

    tcfg = TrainConfig(batch_size=4, warmup_steps=2, total_steps=10,
                       distill_weight=0.5, distill_temp=2.0,
                       loss_impl="xla")
    teacher = _params(BIG, 5)
    batch = _batch(3, B=4, T=12, U=4)
    s0 = init_train_state(jax.random.PRNGKey(6), CFG, tcfg)
    _, info1 = make_train_step(CFG, tcfg, teacher_cfg=BIG)(
        s0, *batch, teacher)
    mesh = make_mesh(2)
    s0 = init_train_state(jax.random.PRNGKey(6), CFG, tcfg)
    state = TrainState(params=replicate(mesh, s0.params),
                       opt_state=replicate(mesh, s0.opt_state),
                       step=replicate(mesh, s0.step))
    _, info = make_train_step(CFG, tcfg, mesh=mesh, teacher_cfg=BIG)(
        state, *shard_batch(mesh, batch), replicate(mesh, teacher))
    np.testing.assert_allclose(float(info["loss"]), float(info1["loss"]),
                               rtol=1e-5)


def test_distill_guards():
    tcfg = TrainConfig(distill_weight=0.3, loss_impl="fused")
    with pytest.raises(ValueError, match="xla loss tier"):
        make_train_step(CFG, tcfg, teacher_cfg=CFG)
    tcfg = TrainConfig(distill_weight=0.3)
    with pytest.raises(ValueError, match="vocab_size"):
        make_train_step(CFG, tcfg, teacher_cfg=dataclasses.replace(
            CFG, vocab_size=12))
    with pytest.raises(ValueError, match="teacher_cfg"):
        make_train_step(CFG, tcfg)
    with pytest.raises(ValueError, match="ctc_weight"):
        make_train_step(dataclasses.replace(CFG, ctc_head=True),
                        dataclasses.replace(tcfg, ctc_weight=0.2),
                        teacher_cfg=CFG)


@pytest.mark.slow
def test_distill_cli(tmp_path, capsys):
    import train

    common = ["--config", "smoke", "--batch-size", "2", "--max-frames",
              "40", "--max-labels", "5", "--log-every", "1",
              "--data-parallel", "1"]
    train.main(common + ["--steps", "1", "--ckpt-dir",
                         str(tmp_path / "teacher")])
    capsys.readouterr()
    train.main(common + ["--steps", "2", "--distill-from",
                         str(tmp_path / "teacher"), "--distill-weight",
                         "0.5", "--distill-temp", "2.0"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])
    # tp carries the teacher as a replicated traced argument (round 4);
    # pp/ep stay guarded.
    train.main(common + ["--steps", "1", "--distill-from",
                         str(tmp_path / "teacher"), "--distill-weight",
                         "0.5", "--model-parallel", "2",
                         "--parallel-mode", "tp"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 1 and np.isfinite(res["final_loss"])
    with pytest.raises(SystemExit, match="sp|tp"):
        train.main(common + ["--steps", "1", "--distill-from",
                             str(tmp_path / "teacher"),
                             "--model-parallel", "2",
                             "--parallel-mode", "pp"])


def test_distill_model_parallel_lockstep():
    """KD training under --parallel-mode sp AND tp: 2-step loss trajectory
    == the single-device distill step; the (different-architecture)
    teacher rides both sharded steps as the replicated traced argument
    (parallel/tp.py sp_distill_loss_fn / tp_distill_loss_fn)."""
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    # dims divisible by mp=4 for the gate-sharded tp encoder/predictor
    cfg = dataclasses.replace(CFG, enc_hidden=16, pred_hidden=12)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       distill_weight=0.5, distill_temp=2.0,
                       loss_impl="xla")
    teacher = _params(BIG, 5)
    batch = _batch(3, B=8, T=12, U=4)

    state = init_train_state(jax.random.PRNGKey(6), cfg, tcfg)
    step1 = make_train_step(cfg, tcfg, teacher_cfg=BIG)
    want = []
    for _ in range(2):
        state, info = step1(state, *batch, teacher)
        want.append(float(info["loss"]))

    mesh = tp.make_mesh_2d(2, 4)
    batch2 = tp.shard_batch_2d(mesh, batch)
    sps = tp.replicate_state(mesh, tp.init_sp_train_state(
        jax.random.PRNGKey(6), cfg, tcfg))
    step_sp = tp.make_tp_train_step(cfg, tcfg, mesh, "sp", teacher_cfg=BIG)
    got_sp = []
    for _ in range(2):
        sps, info = step_sp(sps, *batch2, teacher)
        got_sp.append(float(info["loss"]))
    np.testing.assert_allclose(got_sp, want, rtol=2e-5)

    tps = tp.shard_tp_state(mesh, tp.init_tp_train_state(
        jax.random.PRNGKey(6), cfg, tcfg, 4))
    step_tp = tp.make_tp_train_step(cfg, tcfg, mesh, "tp", teacher_cfg=BIG)
    got_tp = []
    for _ in range(2):
        tps, info = step_tp(tps, *batch2, teacher)
        got_tp.append(float(info["loss"]))
    np.testing.assert_allclose(got_tp, want, rtol=2e-5)


def test_distill_model_parallel_guards():
    from rnn_transducer_tpu.parallel import tp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = tp.make_mesh_2d(2, 4)
    tcfg = TrainConfig(distill_weight=0.3, loss_impl="xla")
    with pytest.raises(ValueError, match="teacher_cfg"):
        tp.make_tp_train_step(CFG, tcfg, mesh, "sp")
    with pytest.raises(ValueError, match="sp"):
        tp.make_tp_train_step(CFG, tcfg, mesh, "ep", teacher_cfg=CFG)
    with pytest.raises(ValueError, match="mutually exclusive"):
        tp.make_tp_train_step(
            CFG, dataclasses.replace(tcfg, ar_range=3), mesh, "sp",
            teacher_cfg=CFG)
