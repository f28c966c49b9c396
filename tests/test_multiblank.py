"""Multi-blank transducer (ops/rnnt_multiblank.py): loss vs a float64
brute-force lattice oracle, exact degeneration to the standard loss,
finite-difference gradients, greedy duration-skipping vs a host replay,
streaming jumps across chunk boundaries, training the toy task, and the
guards (beam / incompatible loss impls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.rnnt_multiblank import (duration_table,
                                                    rnnt_loss_multiblank)

NEG_INF = -1.0e30


def _cfg(durs=(2,), vocab=6, **kw):
    base = dict(enc_layers=1, enc_hidden=16, pred_layers=1, pred_hidden=16,
                embed_dim=8, joint_dim=16, vocab_size=vocab, input_dim=4,
                compute_dtype="float32", big_blank_durations=durs)
    base.update(kw)
    return TransducerConfig(**base)


def _oracle(logits, labels, t_len, u_len, durations, blank=0):
    """Direct float64 nested-loop DP over the consumed-frames grid."""
    T, U1, C = logits.shape
    K = len(durations)
    V = C - K
    x = np.asarray(logits, np.float64)
    lp = x - np.log(np.sum(np.exp(x - x.max(-1, keepdims=True)),
                           axis=-1, keepdims=True)) - x.max(-1, keepdims=True)
    ds = [1] + list(durations)
    cols = [blank] + [V + k for k in range(K)]
    a = np.full((T + 1, U1), -np.inf)
    a[0, 0] = 0.0
    for tau in range(T + 1):
        for u in range(u_len + 1):
            acc = a[tau, u] if (tau == 0 and u == 0) else -np.inf
            for d, col in zip(ds, cols):
                tp = tau - d
                if tp >= 0 and tp + d <= t_len and tp < T:
                    acc = np.logaddexp(acc, a[tp, u] + lp[tp, u, col])
            if u > 0 and tau < t_len:
                acc = np.logaddexp(acc, a[tau, u - 1]
                                   + lp[tau, u - 1, labels[u - 1]])
            if not (tau == 0 and u == 0):
                a[tau, u] = acc
    return -a[t_len, u_len]


def test_loss_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    durations = (2, 3)
    B, T, U, V = 3, 7, 3, 5
    C = V + len(durations)
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([7, 5, 6], np.int32))
    u_lens = jnp.asarray(np.array([3, 2, 0], np.int32))
    got = np.asarray(jax.jit(lambda lg: rnnt_loss_multiblank(
        lg, labels, t_lens, u_lens, durations))(logits))
    for b in range(B):
        want = _oracle(np.asarray(logits)[b], np.asarray(labels)[b],
                       int(t_lens[b]), int(u_lens[b]), durations)
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_degenerates_to_standard_loss():
    from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
    rng = np.random.default_rng(1)
    B, T, U, V = 2, 6, 3, 5
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([6, 4], np.int32))
    u_lens = jnp.asarray(np.array([3, 2], np.int32))
    want = np.asarray(rnnt_loss(logits, labels, t_lens, u_lens))
    got = np.asarray(rnnt_loss_multiblank(logits, labels, t_lens, u_lens,
                                          ()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_finite_difference_gradients():
    rng = np.random.default_rng(2)
    durations = (2,)
    B, T, U, V = 1, 4, 2, 4
    C = V + 1
    logits = rng.normal(size=(B, T, U + 1, C)).astype(np.float32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    t_lens = jnp.asarray(np.array([4], np.int32))
    u_lens = jnp.asarray(np.array([2], np.int32))

    f = lambda lg: jnp.sum(rnnt_loss_multiblank(
        jnp.asarray(lg), labels, t_lens, u_lens, durations))
    grad = np.asarray(jax.grad(lambda lg: f(lg))(jnp.asarray(logits)))
    eps = 1e-3
    rs = np.random.default_rng(3)
    for _ in range(8):
        i = tuple(rs.integers(0, s) for s in logits.shape)
        lp, lm_ = logits.copy(), logits.copy()
        lp[i] += eps
        lm_[i] -= eps
        want = (float(f(lp)) - float(f(lm_))) / (2 * eps)
        np.testing.assert_allclose(grad[i], want, rtol=2e-2, atol=2e-3)


def test_zero_frames_zero_loss_and_grad():
    durations = (2,)
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(1, 4, 3, 5)), jnp.float32)
    labels = jnp.asarray(np.zeros((1, 2), np.int32))
    loss, grad = jax.value_and_grad(lambda lg: jnp.sum(
        rnnt_loss_multiblank(lg, labels, jnp.asarray([0]), jnp.asarray([0]),
                             durations)))(logits)
    assert float(loss) == 0.0
    assert np.all(np.asarray(grad) == 0.0)


def _host_greedy_multiblank(params, cfg, enc_out, enc_len, max_symbols):
    """Literal host replay of the duration-skipping greedy decode."""
    durs = np.asarray(duration_table(cfg.vocab_size,
                                     cfg.big_blank_durations,
                                     cfg.n_classes))
    pred, state = m.predict_step(params, cfg,
                                 jnp.asarray([cfg.blank], jnp.int32),
                                 m.init_pred_state(cfg, 1))
    t, toks = 0, []
    while t < enc_len and len(toks) < max_symbols:
        logits = m.joint_step(params, cfg, enc_out[None, t], pred)
        k = int(jnp.argmax(logits[0]))
        if k == cfg.blank or k >= cfg.vocab_size:
            t += int(durs[k])
        else:
            toks.append(k)
            pred, state = m.predict_step(params, cfg,
                                         jnp.asarray([k], jnp.int32), state)
    return toks


def test_greedy_skips_match_host_replay():
    cfg = _cfg(durs=(2, 4))
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    from rnn_transducer_tpu.decode.greedy import greedy_decode
    B, T = 4, 12
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 9, 7, 12], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, _ = jax.jit(lambda e, el: greedy_decode(
        params, cfg, e, el, max_symbols=8))(enc_out, enc_lens)
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    for b in range(B):
        want = _host_greedy_multiblank(params, cfg, enc_out[b],
                                       int(enc_lens[b]), 8)
        assert tokens[b, : lens[b]].tolist() == want, b


def test_streaming_jumps_across_chunk_boundaries():
    """Chunked greedy == offline greedy even when a big-blank jump
    crosses a chunk boundary (the overshoot rides in decode_state)."""
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.streaming import stream_transcribe
    cfg = _cfg(durs=(4,))
    rng = np.random.default_rng(6)
    # several seeds so big blanks actually win at assorted positions
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


def test_trains_toy_task_and_uses_big_blanks():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)
    T_, U_, V_ = 16, 4, 6
    cfg = TransducerConfig(input_dim=V_, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=V_,
                           compute_dtype="float32",
                           big_blank_durations=(2,))
    tcfg = TrainConfig(batch_size=8, learning_rate=5e-3, warmup_steps=30,
                       total_steps=700, loss_impl="auto")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    assert state.params["joint"]["out"]["w"].shape[-1] == V_ + 1
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
    cfg = _cfg(durs=(2,))
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(8)
    feats = jnp.asarray(rng.normal(size=(1, 6, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6], np.int32))
    # (beam search supports multi-blank since the wake-time search —
    # tests/test_beam_duration.py)
    from rnn_transducer_tpu.train.loop import loss_fn
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 3)), jnp.int32)
    with pytest.raises(ValueError, match="multi-blank"):
        loss_fn(params, cfg, feats, feat_lens, labels,
                jnp.asarray([3]), loss_impl="pallas")
    with pytest.raises(ValueError, match="fastemit"):
        loss_fn(params, cfg, feats, feat_lens, labels,
                jnp.asarray([3]), fastemit=0.1)
    with pytest.raises(ValueError, match="durations"):
        rnnt_loss_multiblank(jnp.zeros((1, 2, 2, 6)), labels[:, :1],
                             jnp.asarray([2]), jnp.asarray([1]), (1,))


def test_data_parallel_matches_single_device():
    """Multi-blank loss under the shard_map DP train step == single dev."""
    from rnn_transducer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_batch)
    from rnn_transducer_tpu.train.loop import (TrainState, init_train_state,
                                               make_train_step)
    cfg = _cfg(durs=(2, 4), vocab=6, enc_hidden=16, pred_hidden=16)
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


def test_multiblank_sequence_parallel_lockstep():
    """Multi-blank training under --parallel-mode sp: the per-cell blank
    streams are extracted shard-locally and all-gathered into the
    from_lp loss — 2-step loss trajectory == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(2, 3))
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(11)
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


def test_multiblank_tensor_parallel_lockstep():
    """Multi-blank training under --parallel-mode tp: the big-blank
    columns live on exactly one vocab shard each and are extracted by
    the masked pick/psum inside tp_joint_loss — 2-step loss trajectory
    and merged post-step params == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(2, 3))
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(13)
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


def test_multiblank_pipeline_parallel_lockstep():
    """Multi-blank training under --parallel-mode pp: the staged encoder
    assembles the replicated enc_out and the consumed-frames-grid loss
    runs unchanged — 2-step loss trajectory == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.parallel import pipeline as pl, tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = _cfg(durs=(2, 3), enc_layers=4)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="xla")
    rng = np.random.default_rng(15)
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
