"""Token-and-duration transducer (ops/rnnt_tdt.py): loss vs a float64
brute-force grid oracle, finite-difference gradients, duration-set
edge cases, greedy duration-advance vs a host replay, streaming jumps
across chunk boundaries, toy-task training with a learned duration
head, and the guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.rnnt_tdt import rnnt_loss_tdt

NEG_INF = -1.0e30


def _cfg(durs=(0, 1, 2), vocab=6, **kw):
    base = dict(enc_layers=1, enc_hidden=16, pred_layers=1, pred_hidden=16,
                embed_dim=8, joint_dim=16, vocab_size=vocab, input_dim=4,
                compute_dtype="float32", tdt_durations=durs)
    base.update(kw)
    return TransducerConfig(**base)


def _oracle(logits, durl, labels, t_len, u_len, durations, blank=0):
    """Direct float64 nested-loop DP on the consumed-frames grid."""
    T, U1, V = logits.shape

    def lsm(x):
        x = np.asarray(x, np.float64)
        mx = x.max(-1, keepdims=True)
        return x - mx - np.log(np.sum(np.exp(x - mx), -1, keepdims=True))

    lp = lsm(logits)
    ld = lsm(durl)
    a = np.full((T + 1, U1), -np.inf)
    a[0, 0] = 0.0
    for tau in range(T + 1):
        for u in range(u_len + 1):
            acc = a[tau, u] if (tau == 0 and u == 0) else -np.inf
            for j, d in enumerate(durations):
                tp = tau - d
                if not (tp >= 0 and tp < t_len and tp + d <= t_len
                        and tp < T):
                    continue
                if d >= 1:  # blank arc (stays at u)
                    acc = np.logaddexp(
                        acc, a[tp, u] + lp[tp, u, blank] + ld[tp, u, j])
                if u > 0:  # token arc from (tp, u-1)
                    if d == 0 and tp != tau:
                        continue
                    acc = np.logaddexp(
                        acc, a[tp, u - 1] + lp[tp, u - 1, labels[u - 1]]
                        + ld[tp, u - 1, j])
            if not (tau == 0 and u == 0):
                a[tau, u] = acc
    return -a[t_len, u_len]


def test_loss_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    durations = (0, 1, 2, 3)
    B, T, U, V = 3, 6, 3, 5
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    durl = jnp.asarray(rng.normal(size=(B, T, U + 1, len(durations))),
                       jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([6, 4, 5], np.int32))
    u_lens = jnp.asarray(np.array([3, 2, 0], np.int32))
    got = np.asarray(jax.jit(lambda lg, dl: rnnt_loss_tdt(
        lg, dl, labels, t_lens, u_lens, durations))(logits, durl))
    for b in range(B):
        want = _oracle(np.asarray(logits)[b], np.asarray(durl)[b],
                       np.asarray(labels)[b], int(t_lens[b]),
                       int(u_lens[b]), durations)
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_loss_without_zero_duration():
    rng = np.random.default_rng(1)
    durations = (1, 2)
    B, T, U, V = 2, 5, 2, 4
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    durl = jnp.asarray(rng.normal(size=(B, T, U + 1, 2)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([5, 4], np.int32))
    u_lens = jnp.asarray(np.array([2, 1], np.int32))
    got = np.asarray(rnnt_loss_tdt(logits, durl, labels, t_lens, u_lens,
                                   durations))
    for b in range(B):
        want = _oracle(np.asarray(logits)[b], np.asarray(durl)[b],
                       np.asarray(labels)[b], int(t_lens[b]),
                       int(u_lens[b]), durations)
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)
    assert np.all(np.isfinite(got))


def test_finite_difference_gradients():
    rng = np.random.default_rng(2)
    durations = (0, 1, 2)
    B, T, U, V = 1, 4, 2, 4
    logits = rng.normal(size=(B, T, U + 1, V)).astype(np.float32)
    durl = rng.normal(size=(B, T, U + 1, 3)).astype(np.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([4], np.int32))
    u_lens = jnp.asarray(np.array([2], np.int32))

    def f(lg, dl):
        return jnp.sum(rnnt_loss_tdt(jnp.asarray(lg), jnp.asarray(dl),
                                     labels, t_lens, u_lens, durations))

    g_lg, g_dl = jax.grad(f, argnums=(0, 1))(jnp.asarray(logits),
                                             jnp.asarray(durl))
    eps = 1e-3
    rs = np.random.default_rng(3)
    for arr, grad, other_first in ((logits, np.asarray(g_lg), True),
                                   (durl, np.asarray(g_dl), False)):
        for _ in range(5):
            i = tuple(rs.integers(0, s) for s in arr.shape)
            ap, am = arr.copy(), arr.copy()
            ap[i] += eps
            am[i] -= eps
            if other_first:
                want = (float(f(ap, durl)) - float(f(am, durl))) / (2 * eps)
            else:
                want = (float(f(logits, ap))
                        - float(f(logits, am))) / (2 * eps)
            np.testing.assert_allclose(grad[i], want, rtol=2e-2, atol=2e-3)


def test_validation():
    z = jnp.zeros((1, 3, 2, 5))
    lbl = jnp.zeros((1, 1), jnp.int32)
    fl, ll = jnp.asarray([3]), jnp.asarray([1])
    with pytest.raises(ValueError):
        rnnt_loss_tdt(z, jnp.zeros((1, 3, 2, 2)), lbl, fl, ll, (0,))
    with pytest.raises(ValueError):
        rnnt_loss_tdt(z, jnp.zeros((1, 3, 2, 2)), lbl, fl, ll, (1, 1))
    with pytest.raises(ValueError):
        rnnt_loss_tdt(z, jnp.zeros((1, 3, 2, 3)), lbl, fl, ll, (1, 2))


def _host_greedy_tdt(params, cfg, enc_out, enc_len, max_symbols):
    """Literal host replay of TDT greedy decoding."""
    dvals = list(cfg.tdt_durations)
    pred, state = m.predict_step(params, cfg,
                                 jnp.asarray([cfg.blank], jnp.int32),
                                 m.init_pred_state(cfg, 1))
    t, toks = 0, []
    while t < enc_len and len(toks) < max_symbols:
        logits, durl = m.joint_step_tdt(params, cfg, enc_out[None, t], pred)
        k = int(jnp.argmax(logits[0]))
        d = dvals[int(jnp.argmax(durl[0]))]
        if k == cfg.blank:
            d = max(d, 1)
        else:
            toks.append(k)
            pred, state = m.predict_step(params, cfg,
                                         jnp.asarray([k], jnp.int32), state)
        t += d
    return toks


def test_greedy_matches_host_replay():
    cfg = _cfg(durs=(0, 1, 2, 4))
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    from rnn_transducer_tpu.decode.greedy import greedy_decode
    B, T = 4, 12
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 9, 7, 12], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, _ = jax.jit(lambda e, el: greedy_decode(
        params, cfg, e, el, max_symbols=8))(enc_out, enc_lens)
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    for b in range(B):
        want = _host_greedy_tdt(params, cfg, enc_out[b],
                                int(enc_lens[b]), 8)
        assert tokens[b, : lens[b]].tolist() == want, b


def test_streaming_matches_offline():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.streaming import stream_transcribe
    cfg = _cfg(durs=(0, 1, 4))
    rng = np.random.default_rng(5)
    for seed in range(3):
        params = m.init_params(jax.random.PRNGKey(seed), cfg)
        feats = jnp.asarray(rng.normal(size=(2, 12, cfg.input_dim)),
                            jnp.float32)
        feat_lens = jnp.asarray(np.array([12, 10], np.int32))
        t_off, l_off = recognize_greedy(params, cfg, feats, feat_lens,
                                        max_symbols=8)
        t_st, l_st = stream_transcribe(params, cfg, feats, feat_lens,
                                       chunk_frames=2, max_symbols=8)
        np.testing.assert_array_equal(np.asarray(t_off), np.asarray(t_st))
        np.testing.assert_array_equal(np.asarray(l_off), np.asarray(l_st))


def test_trains_toy_task():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)
    T_, U_, V_ = 16, 4, 6
    cfg = TransducerConfig(input_dim=V_, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=V_,
                           compute_dtype="float32",
                           tdt_durations=(0, 1, 2, 4))
    tcfg = TrainConfig(batch_size=8, learning_rate=5e-3, warmup_steps=30,
                       total_steps=700, loss_impl="auto")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    assert state.params["joint"]["dur"]["w"].shape == (32, 4)
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
    for _ in range(700):
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
    assert exact >= 13, exact


def test_guards():
    cfg = _cfg(durs=(0, 1, 2))
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.normal(size=(1, 6, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6], np.int32))
    # (beam search supports TDT since the wake-time search —
    # tests/test_beam_duration.py)
    from rnn_transducer_tpu.train.loop import loss_fn
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 3)), jnp.int32)
    with pytest.raises(ValueError, match="TDT"):
        loss_fn(params, cfg, feats, feat_lens, labels, jnp.asarray([3]),
                loss_impl="fused")
    with pytest.raises(ValueError, match="mutually exclusive"):
        m.init_params(jax.random.PRNGKey(0),
                      _cfg(durs=(0, 1), big_blank_durations=(2,)))

def test_data_parallel_matches_single_device():
    """TDT loss under the shard_map DP train step == single device."""
    from rnn_transducer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_batch)
    from rnn_transducer_tpu.train.loop import (TrainState, init_train_state,
                                               make_train_step)
    cfg = _cfg(durs=(0, 1, 2))
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-3, warmup_steps=5,
                       total_steps=100, loss_impl="xla")
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(8, 10, cfg.input_dim)).astype(np.float32)
    fl = np.full((8,), 10, np.int32)
    labels = rng.integers(1, cfg.vocab_size, (8, 3)).astype(np.int32)
    ll = np.full((8,), 3, np.int32)
    batch = tuple(jnp.asarray(x) for x in (feats, fl, labels, ll))

    state1 = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    state1, info1 = make_train_step(cfg, tcfg)(state1, *batch)

    mesh = make_mesh(8)
    state8 = init_train_state(jax.random.PRNGKey(2), cfg, tcfg)
    state8 = TrainState(params=replicate(mesh, state8.params),
                        opt_state=replicate(mesh, state8.opt_state),
                        step=replicate(mesh, state8.step))
    state8, info8 = make_train_step(cfg, tcfg, mesh=mesh)(
        state8, *shard_batch(mesh, batch))
    np.testing.assert_allclose(float(info8["loss"]), float(info1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_train_recognize_cli_roundtrip(tmp_path, capsys):
    """--tdt-durations through train -> checkpoint (tuple restored from
    meta.json) -> recognize greedy/streaming."""
    import json
    import recognize
    import train
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--max-frames", "24", "--max-labels", "4",
                "--tdt-durations", "0,1,2", "--data-parallel", "1",
                "--ckpt-dir", ck])
    capsys.readouterr()
    from rnn_transducer_tpu.train import checkpoint as ckpt
    cfg2 = ckpt.load_model_config(ck)
    assert cfg2.tdt_durations == (0, 1, 2)  # tuple, not list
    recognize.main(["--ckpt-dir", ck, "--mode", "greedy",
                    "--data", "synthetic", "--batches", "1",
                    "--batch-size", "2", "--max-symbols", "6"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "greedy" and "wer" in out
    recognize.main(["--ckpt-dir", ck, "--mode", "streaming",
                    "--data", "synthetic", "--batches", "1",
                    "--batch-size", "2", "--max-symbols", "6",
                    "--chunk-frames", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "streaming"


def test_tdt_sequence_parallel_lockstep():
    """TDT training under --parallel-mode sp: token + duration streams
    extracted shard-locally, from_lp loss — 2-step trajectory == single
    device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(0, 1, 2))
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(12)
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


def test_tdt_tensor_parallel_lockstep():
    """TDT training under --parallel-mode tp: token scores through the
    vocab-parallel pick/psum, duration head replicated off the shared
    joint activation — 2-step loss trajectory and merged post-step
    params == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(0, 1, 2))
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(14)
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
    np.testing.assert_allclose(got, want, rtol=2e-5)
    merged = tp.merge_params_tp(jax.device_get(mp_state.params), cfg)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tdt_pipeline_parallel_lockstep():
    """TDT training under --parallel-mode pp: the staged encoder
    assembles the replicated enc_out; token + duration heads and the
    consumed-frames-grid loss run unchanged — 2-step loss trajectory
    == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import pipeline as pl, tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(0, 1, 2), enc_layers=4)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(16)
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
    mp_state = tp.shard_tp_state(mesh, pl.init_pp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    stepN = pl.make_pp_train_step(cfg, tcfg, mesh, microbatches=2)
    mp_batch = tp.shard_batch_2d(mesh, batch)
    got = []
    for _ in range(2):
        mp_state, info = stepN(mp_state, *mp_batch)
        got.append(float(info["loss"]))
    np.testing.assert_allclose(got, want, rtol=2e-5)
