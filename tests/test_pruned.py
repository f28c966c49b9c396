"""Pruned RNN-T training (ops/rnnt_pruned.py): simple first pass, bound
selection, banded lattice, and the two-pass objective.

Correctness anchors:
  * the simple (trivial-joiner) loss equals the full rnnt_loss on
    explicitly materialized additive logits — exactly;
  * the banded loss with a full-width band (S = U1, s_begin = 0) equals
    the unbanded loss — values and gradients;
  * any band prunes paths, so banded NLL >= full NLL (log-semiring
    monotonicity), with equality when the band covers the posterior mass;
  * banded custom-VJP gradients match finite differences;
  * prune_bounds invariants: start at 0, monotone, jump <= S-1, terminal
    cell covered, quantization respected;
  * the two-pass objective trains a toy task to exact-match accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.rnnt_loss import (
    occupancies_from_lp,
    rnnt_loss,
    rnnt_loss_from_lp,
)
from rnn_transducer_tpu.ops.rnnt_pruned import (
    prune_bounds,
    rnnt_loss_banded,
    rnnt_loss_pruned,
    simple_lp,
)

B, T, U, V = 3, 8, 5, 7
U1 = U + 1
BLANK = 0


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    fl = jnp.asarray([T, T - 2, T - 3], jnp.int32)
    ll = jnp.asarray([U, U - 1, U - 2], jnp.int32)
    return rng, labels, fl, ll


def _lp_pair(rng):
    lpb = jnp.asarray(rng.normal(size=(B, T, U1)) - 1.0, jnp.float32)
    lpy = jnp.asarray(rng.normal(size=(B, T, U1)) - 1.0, jnp.float32)
    return lpb, lpy


def test_simple_lp_matches_materialized():
    rng, labels, fl, ll = _inputs()
    am = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    lm = jnp.asarray(rng.normal(size=(B, U1, V)), jnp.float32)
    lpb, lpy = simple_lp(am, lm, labels, BLANK)
    loss_simple = rnnt_loss_from_lp(lpb, lpy, fl, ll)

    logits = am[:, :, None, :] + lm[:, None, :, :]
    loss_full = rnnt_loss(logits, labels, fl, ll, BLANK)
    np.testing.assert_allclose(np.asarray(loss_simple),
                               np.asarray(loss_full), rtol=1e-6, atol=1e-5)


def test_full_width_band_equals_unbanded():
    rng, labels, fl, ll = _inputs(1)
    lpb, lpy = _lp_pair(rng)
    sb = jnp.zeros((B, T), jnp.int32)

    full = rnnt_loss_from_lp(lpb, lpy, fl, ll)
    band = rnnt_loss_banded(lpb, lpy, sb, fl, ll, U1)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full),
                               rtol=1e-6, atol=1e-5)

    g_full = jax.grad(lambda a, b_: jnp.sum(
        rnnt_loss_from_lp(a, b_, fl, ll)), argnums=(0, 1))(lpb, lpy)
    g_band = jax.grad(lambda a, b_: jnp.sum(
        rnnt_loss_banded(a, b_, sb, fl, ll, U1)), argnums=(0, 1))(lpb, lpy)
    for gf, gb in zip(g_full, g_band):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gf),
                                   rtol=1e-5, atol=1e-6)


def _window(lp, sb, S):
    """(B, T, U1) -> (B, T, S) gathered at u = sb[t] + s."""
    u = sb[:, :, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]
    return jnp.take_along_axis(lp, jnp.clip(u, 0, U1 - 1), axis=2), u


def test_band_is_upper_bound_and_tight_when_covering():
    rng, labels, fl, ll = _inputs(2)
    lpb, lpy = _lp_pair(rng)
    full = np.asarray(rnnt_loss_from_lp(lpb, lpy, fl, ll))

    S = 4
    gb, gy = occupancies_from_lp(lpb, lpy, fl, ll)
    sb = prune_bounds(gb + gy, S, fl, ll)
    lpb_w, u = _window(lpb, sb, S)
    lpy_w, _ = _window(lpy, sb, S)
    lpy_w = jnp.where(u < U1, lpy_w, jnp.float32(-1e30))
    band = np.asarray(rnnt_loss_banded(lpb_w, lpy_w, sb, fl, ll, U1))
    assert np.all(band >= full - 1e-4), (band, full)
    assert np.all(np.isfinite(band))

    # a band that covers every occupied cell is exact: random lp arrays
    # spread mass everywhere, so shrink the problem until S covers it
    sb0 = jnp.zeros((B, T), jnp.int32)
    lpb_w0, u0 = _window(lpb, sb0, U1)
    lpy_w0, _ = _window(lpy, sb0, U1)
    band0 = np.asarray(rnnt_loss_banded(lpb_w0, lpy_w0, sb0, fl, ll, U1))
    np.testing.assert_allclose(band0, full, rtol=1e-6, atol=1e-5)


def test_banded_grad_finite_diff():
    rng, labels, fl, ll = _inputs(3)
    lpb, lpy = _lp_pair(rng)
    S = 4
    gb, gy = occupancies_from_lp(lpb, lpy, fl, ll)
    sb = prune_bounds(gb + gy, S, fl, ll)
    lpb_w, u = _window(lpb, sb, S)
    lpy_w, _ = _window(lpy, sb, S)
    lpy_w = jnp.where(u < U1, lpy_w, jnp.float32(-1e30))

    def f(a, b_):
        return jnp.sum(rnnt_loss_banded(a, b_, sb, fl, ll, U1))

    ga, gb_ = jax.grad(f, argnums=(0, 1))(lpb_w, lpy_w)
    rng2 = np.random.default_rng(7)
    eps = 1e-3
    for g_analytic, x, which in ((ga, lpb_w, 0), (gb_, lpy_w, 1)):
        for _ in range(6):
            i = tuple(rng2.integers(0, d) for d in x.shape)
            d = jnp.zeros_like(x).at[i].set(eps)
            if which == 0:
                num = (f(x + d, lpy_w) - f(x - d, lpy_w)) / (2 * eps)
            else:
                num = (f(lpb_w, x + d) - f(lpb_w, x - d)) / (2 * eps)
            np.testing.assert_allclose(float(g_analytic[i]), float(num),
                                       rtol=2e-2, atol=2e-3)


def test_prune_bounds_invariants():
    rng, labels, fl, ll = _inputs(4)
    lpb, lpy = _lp_pair(rng)
    gb, gy = occupancies_from_lp(lpb, lpy, fl, ll)
    for S in (2, 3, 4):
        for q in (1, 2):
            sb = np.asarray(prune_bounds(gb + gy, S, fl, ll, quantize=q))
            assert sb.shape == (B, T)
            assert np.all(sb[:, 0] == 0)
            d = np.diff(sb, axis=1)
            assert np.all(d >= 0), (S, q, sb)
            step = S - 1 if q == 1 else max(1, ((S - 1) // q)) * q
            assert np.all(d <= step), (S, q, sb)
            hi = U1 - S if q == 1 else -(-(U1 - S) // q) * q
            assert np.all(sb >= 0) and np.all(sb <= hi)
            if q > 1:
                assert np.all(sb % q == 0)
            for bi in range(B):
                t_last = int(fl[bi]) - 1
                u_len = int(ll[bi])
                assert sb[bi, t_last] <= u_len <= sb[bi, t_last] + S - 1, \
                    (S, q, bi, sb[bi], u_len)


def test_pruned_joint_matches_full_when_covering():
    """rnnt_loss_pruned with S = U1 == full-lattice loss from the same
    joint factorization (fp32): values and input grads."""
    rng, labels, fl, ll = _inputs(5)
    J = 8
    f = jnp.asarray(rng.normal(size=(B, T, J)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U1, J)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.4, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    sb = jnp.zeros((B, T), jnp.int32)

    def full(f_, g_, w_, b_):
        z = jnp.tanh(f_[:, :, None, :] + g_[:, None, :, :])
        logits = jnp.einsum("btuj,jv->btuv", z, w_) + b_
        return jnp.sum(rnnt_loss(logits, labels, fl, ll, BLANK))

    def pruned(f_, g_, w_, b_):
        return jnp.sum(rnnt_loss_pruned(
            f_, g_, w_, b_, labels, fl, ll, sb, U1, BLANK, jnp.float32))

    np.testing.assert_allclose(float(pruned(f, g, w, bias)),
                               float(full(f, g, w, bias)),
                               rtol=1e-6, atol=1e-4)
    gr_f = jax.grad(full, argnums=(0, 1, 2, 3))(f, g, w, bias)
    gr_p = jax.grad(pruned, argnums=(0, 1, 2, 3))(f, g, w, bias)
    for a, b_ in zip(gr_f, gr_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_chunked_band_joint_matches_unchunked(monkeypatch):
    """The rematerialized T-chunked band joint (the large-vocab memory
    path) produces identical lp arrays and grads to one-shot evaluation."""
    import rnn_transducer_tpu.ops.rnnt_pruned as rp

    rng, labels, fl, ll = _inputs(6)
    J, S = 8, 3
    f = jnp.asarray(rng.normal(size=(B, T, J)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U1, J)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.4, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    gb, gy = occupancies_from_lp(*_lp_pair(rng), fl, ll)
    sb = prune_bounds(gb + gy, S, fl, ll)

    def loss(f_, g_, w_, b_):
        return jnp.sum(rnnt_loss_pruned(
            f_, g_, w_, b_, labels, fl, ll, sb, S, BLANK, jnp.float32))

    v_big = loss(f, g, w, bias)
    g_big = jax.grad(loss, argnums=(0, 1, 2, 3))(f, g, w, bias)
    monkeypatch.setattr(rp, "_CHUNK_BYTES", 1)  # force Tc = 1
    v_small = loss(f, g, w, bias)
    g_small = jax.grad(loss, argnums=(0, 1, 2, 3))(f, g, w, bias)
    np.testing.assert_allclose(float(v_small), float(v_big),
                               rtol=1e-6, atol=1e-6)
    for a, b_ in zip(g_big, g_small):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_band_kernel_matches_xla_path(monkeypatch):
    """The fused Pallas band kernels (interpret mode on CPU) produce the
    same pruned loss and input grads as the chunked XLA path — including
    an S not divisible by 8 (kernel pads the band with masked overhang
    rows)."""
    monkeypatch.setenv("RNNT_TPU_BAND_KERNEL", "0")
    rng, labels, fl, ll = _inputs(8)
    J = 8
    f = jnp.asarray(rng.normal(size=(B, T, J)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U1, J)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.4, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    gb, gy = occupancies_from_lp(*_lp_pair(rng), fl, ll)
    for S in (3, 4):
        sb = prune_bounds(gb + gy, S, fl, ll)

        def loss(f_, g_, w_, b_):
            return jnp.sum(rnnt_loss_pruned(
                f_, g_, w_, b_, labels, fl, ll, sb, S, BLANK, jnp.float32))

        monkeypatch.setenv("RNNT_TPU_BAND_KERNEL", "0")
        v_xla = float(loss(f, g, w, bias))
        g_xla = jax.grad(loss, argnums=(0, 1, 2, 3))(f, g, w, bias)
        monkeypatch.setenv("RNNT_TPU_BAND_KERNEL", "1")
        v_k = float(loss(f, g, w, bias))
        g_k = jax.grad(loss, argnums=(0, 1, 2, 3))(f, g, w, bias)
        np.testing.assert_allclose(v_k, v_xla, rtol=1e-6, atol=1e-5)
        for a, b_ in zip(g_xla, g_k):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       rtol=1e-5, atol=2e-5)


def test_two_pass_trains_toy_task():
    """loss_impl='pruned' reaches exact-match greedy accuracy on the
    sustained-cue toy corpus (same task as the FastEmit suite)."""
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                  TransducerConfig)
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    T_, U_, V_ = 20, 4, 6
    cfg = TransducerConfig(input_dim=V_, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=V_,
                           compute_dtype="float32", pruned_range=3)
    tcfg = TrainConfig(batch_size=8, learning_rate=5e-3, warmup_steps=30,
                       total_steps=600, loss_impl="pruned")
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
    for _ in range(600):
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


def test_pruned_dp_matches_single_device():
    """loss_impl='pruned' under shard_map data parallelism: loss and
    post-step params identical to the single-device step (prune_bounds
    and the band gather are per-utterance, so sharding B is exact)."""
    import pytest

    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                  TransducerConfig)
    from rnn_transducer_tpu.parallel.mesh import (make_mesh, replicate,
                                                  shard_batch)
    from rnn_transducer_tpu.train.loop import (TrainState, init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = TransducerConfig(input_dim=8, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=16,
                           compute_dtype="float32", pruned_range=3)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=50,
                       loss_impl="pruned")
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.normal(size=(8, 10, 8)), jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, 16, size=(8, 4)), jnp.int32),
             jnp.full((8,), 4, jnp.int32))

    def run(mesh):
        state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
        b = batch
        if mesh is not None:
            state = TrainState(params=replicate(mesh, state.params),
                               opt_state=replicate(mesh, state.opt_state),
                               step=replicate(mesh, state.step))
            b = shard_batch(mesh, b)
        step = make_train_step(cfg, tcfg, mesh=mesh)
        state, info = step(state, *b)
        return jax.device_get(state.params), float(info["loss"])

    p1, l1 = run(None)
    p2, l2 = run(make_mesh(4))
    np.testing.assert_allclose(l2, l1, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), p1, p2)


def test_pruned_sequence_parallel_lockstep():
    """Pruned two-pass training under --parallel-mode sp: the band joint
    runs frame-sharded, the banded recursion replicated — 2-step loss
    trajectory == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                   TransducerConfig)
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=10, input_dim=4, pruned_range=3,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="pruned")
    rng = np.random.default_rng(50)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 4)),
                         jnp.int32),
             jnp.full((8,), 4, jnp.int32))
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
    np.testing.assert_allclose(got, want, rtol=3e-5)


def test_pruned_tensor_parallel_lockstep():
    """Pruned two-pass training under --parallel-mode tp: gate-sharded
    encoder/predictor, replicated first pass, vocab-sharded band joint
    (_tp_band_lp_chunk pmax/psum + masked picks) — 2-step loss
    trajectory and merged post-step params == single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                   TransducerConfig)
    from rnn_transducer_tpu.parallel import tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=10, input_dim=4, pruned_range=3,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="pruned")
    rng = np.random.default_rng(51)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 4)),
                         jnp.int32),
             jnp.full((8,), 4, jnp.int32))
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
    merged = tp.merge_params_tp(jax.device_get(mp_state.params), cfg)
    ref = jax.device_get(state.params)
    flat_m, _ = jax.tree_util.tree_flatten_with_path(merged)
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    for k, a in flat_m:
        b = flat_r[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=jax.tree_util.keystr(k))


def test_pruned_pipeline_parallel_lockstep():
    """Pruned two-pass training under --parallel-mode pp: the GPipe
    encoder assembles the replicated enc_out and the single-device
    two-pass objective runs unchanged — 2-step loss trajectory ==
    single device."""
    import pytest as _pytest

    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                   TransducerConfig)
    from rnn_transducer_tpu.parallel import pipeline as pl, tp
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        _pytest.skip("needs 8 devices")
    cfg = TransducerConfig(enc_layers=4, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=10, input_dim=4, pruned_range=3,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=6,
                       loss_impl="pruned")
    rng = np.random.default_rng(52)
    batch = (jnp.asarray(rng.normal(size=(8, 10, cfg.input_dim)),
                         jnp.float32),
             jnp.full((8,), 10, jnp.int32),
             jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 4)),
                         jnp.int32),
             jnp.full((8,), 4, jnp.int32))
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
    np.testing.assert_allclose(got, want, rtol=3e-5)
