"""MWER sequence training (train/mwer.py): on-device edit distance vs
the host implementation, risk value vs a hand computation over fixed
hypotheses, risk reduction + no WER regression when fine-tuning the toy
task, guards, and the train.py --mwer-steps phase."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.mwer import (edit_distance_device,
                                           mwer_loss_from_hyps,
                                           mwer_loss_fn)

NEG_INF = -1.0e30


def test_device_edit_distance_matches_host():
    from rnn_transducer_tpu.decode.metrics import edit_distance
    rng = np.random.default_rng(0)
    dev = jax.jit(edit_distance_device)
    for _ in range(30):
        Ur, Uh = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        ref = rng.integers(0, 4, size=Ur).astype(np.int32)
        hyp = rng.integers(0, 4, size=Uh).astype(np.int32)
        rl = int(rng.integers(0, Ur + 1))
        hl = int(rng.integers(0, Uh + 1))
        got = int(dev(jnp.asarray(ref), jnp.asarray(rl),
                      jnp.asarray(hyp), jnp.asarray(hl)))
        want = edit_distance(ref[:rl].tolist(), hyp[:hl].tolist())
        assert got == want, (ref[:rl], hyp[:hl], got, want)


def _cfg():
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=6, input_dim=4,
                            compute_dtype="float32")


def test_risk_value_matches_hand_computation():
    from rnn_transducer_tpu.decode.metrics import edit_distance
    from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, K, U = 1, 5, 3, 4
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray([T], jnp.int32)
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    labels = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    label_lens = jnp.asarray([3], jnp.int32)
    hyps = jnp.asarray([[[1, 2, 3, 0], [1, 2, 0, 0], [2, 2, 3, 1]]],
                       jnp.int32)
    hyp_lens = jnp.asarray([[3, 2, 4]], jnp.int32)
    valid = jnp.asarray([[True, True, False]])  # dead beam excluded

    loss, per_utt = mwer_loss_from_hyps(params, cfg, enc_out, enc_lens,
                                        hyps, hyp_lens, valid, labels,
                                        label_lens)
    # hand computation over the two valid hypotheses
    logp = []
    for k in range(2):
        hy = hyps[0, k][None]
        pred_out, _ = m.predict(params, cfg, hy)
        lg = m.joint(params, cfg, enc_out, pred_out)
        logp.append(-float(rnnt_loss(lg, hy, enc_lens,
                                     hyp_lens[0, k][None])[0]))
    p = np.exp(logp - np.logaddexp(*logp))
    w = [edit_distance([1, 2, 3], list(np.asarray(hyps)[0, k,
                                                        : int(hyp_lens[0, k])]))
         for k in range(2)]
    want = float(np.sum(p * np.asarray(w, np.float64)))
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose(float(per_utt[0]), want, rtol=1e-4)
    # gradient exists and is finite
    g = jax.grad(lambda p_: mwer_loss_from_hyps(
        p_, cfg, m.encode(p_, cfg, feats, feat_lens)[0], enc_lens, hyps,
        hyp_lens, valid, labels, label_lens)[0])(params)
    gn = float(jnp.sqrt(sum(jnp.sum(x * x)
                            for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_mwer_finetune_reduces_risk_on_toy_task():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)
    T_, U_, V_ = 16, 4, 6
    cfg = TransducerConfig(input_dim=V_, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=V_,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, learning_rate=5e-3, warmup_steps=30,
                       total_steps=700, loss_impl="xla", mwer_beam=3,
                       mwer_expansions=2, mwer_max_symbols=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))
    mwer_step = jax.jit(make_train_step(cfg, tcfg, loss_kind="mwer"))

    def toy(rng, n, noise=0.35):
        feats = np.zeros((n, T_, V_), np.float32)
        labels = rng.integers(1, V_, size=(n, U_)).astype(np.int32)
        for i in range(n):
            for u in range(U_):
                feats[i, 4 * u: 4 * u + 4, labels[i, u]] = 1.0
        feats += rng.normal(scale=noise, size=feats.shape).astype(np.float32)
        return jnp.asarray(feats), jnp.asarray(labels)

    rng = np.random.default_rng(7)
    fl = jnp.full((8,), T_, jnp.int32)
    ll = jnp.full((8,), U_, jnp.int32)
    # short NLL phase on a noisy task, so real errors remain for MWER
    for _ in range(220):
        feats, labels = toy(rng, 8, noise=0.5)
        state, info = step(state, feats, fl, labels, ll)
    assert np.isfinite(float(info["loss"]))

    # MWER on a FIXED batch: the expected edit count of that batch must
    # collapse (deterministic check of the risk gradient's direction;
    # measured 0.39 -> 0.02 over 80 steps)
    feats, labels = toy(rng, 8, noise=0.5)
    risks = []
    for _ in range(80):
        state, info = mwer_step(state, feats, fl, labels, ll)
        risks.append(float(info["loss"]))
    assert np.isfinite(risks).all()
    assert risks[0] > 0.05, f"toy task too easy for MWER ({risks[0]})"
    assert np.mean(risks[-5:]) < 0.3 * risks[0], (risks[0], risks[-5:])
    # and the decoder still solves the (clean-ish) task
    rng_eval = np.random.default_rng(99)
    feats, labels = toy(rng_eval, 16, noise=0.05)
    toks, lens = recognize_greedy(state.params, cfg, feats,
                                  jnp.full((16,), T_, jnp.int32),
                                  max_symbols=8)
    toks, lens = np.asarray(toks), np.asarray(lens)
    exact = sum(list(toks[i, : int(lens[i])]) == list(np.asarray(labels)[i])
                for i in range(16))
    assert exact >= 13, exact


@pytest.mark.parametrize("family_kw", [
    dict(big_blank_durations=(2,)), dict(tdt_durations=(0, 1, 2))])
def test_mwer_duration_families(family_kw):
    """MWER runs end-to-end on multi-blank / TDT models: the wake-time
    beam search supplies the N-best and the consumed-frames-grid losses
    score it (finite risk, finite grads)."""
    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=6, input_dim=4,
                           compute_dtype="float32", **family_kw)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
    feat_lens = jnp.asarray([6, 4])
    labels = jnp.asarray([[1, 2], [3, 0]], jnp.int32)
    label_lens = jnp.asarray([2, 1])

    def risk(p):
        return mwer_loss_fn(p, cfg, feats, feat_lens, labels, label_lens,
                            beam=3, expansions=2, max_symbols=6)[0]

    loss, grads = jax.value_and_grad(risk)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_train_cli_mwer_phase(capsys):
    import train
    train.main(["--config", "smoke", "--steps", "4", "--batch-size", "2",
                "--data", "synthetic", "--mwer-steps", "2",
                "--mwer-beam", "2", "--log-every", "1",
                "--data-parallel", "1",
                "--max-frames", "24", "--max-labels", "4"])
    err = capsys.readouterr()
    assert "mwer" in err.out + err.err


def test_mwer_sequence_parallel_step():
    """The MWER phase under --parallel-mode sp (replicated params)
    reproduces the single-device MWER step loss."""
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=6, input_dim=4,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla", mwer_beam=2, mwer_max_symbols=6)
    rng = np.random.default_rng(30)
    batch = (jnp.asarray(rng.normal(size=(8, 6, 4)), jnp.float32),
             jnp.full((8,), 6, jnp.int32),
             jnp.asarray(rng.integers(1, 6, (8, 2)), jnp.int32),
             jnp.full((8,), 2, jnp.int32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg, loss_kind="mwer")(state, *batch)
    mesh = tp.make_mesh_2d(2, 4)
    mp_state = tp.replicate_state(mesh, tp.init_sp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg))
    _, infoN = tp.make_tp_train_step(cfg, tcfg, mesh, "sp",
                                     loss_kind="mwer")(
        mp_state, *tp.shard_batch_2d(mesh, batch))
    np.testing.assert_allclose(float(infoN["loss"]), float(info1["loss"]),
                               rtol=2e-5)
