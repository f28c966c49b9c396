"""MoE joint (ops/moe.py): routed == dense == numpy oracle, capacity
dropping, model/train integration, and expert parallelism under shard_map
on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.moe import (
    init_moe_params,
    moe_dense,
    moe_top1,
    moe_top1_ep,
    router_top1,
)

E, D, M = 4, 16, 32


def _params(seed=0):
    return init_moe_params(jax.random.PRNGKey(seed), E, D, M)


def _tokens(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, D)), jnp.float32)


def _moe_oracle(params, x):
    """Per-token numpy loop: softmax router, top-1 expert FFN * gate."""
    p = jax.tree.map(np.asarray, params)
    x = np.asarray(x, np.float64)
    out = np.zeros_like(x)
    for n in range(x.shape[0]):
        logits = x[n] @ p["router"]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        e = int(np.argmax(probs))
        h = np.maximum(x[n] @ p["w1"][e] + p["b1"][e], 0.0)
        out[n] = (h @ p["w2"][e] + p["b2"][e]) * probs[e]
    return out


def test_dense_matches_numpy_oracle():
    params, x = _params(), _tokens(24)
    y, aux = moe_dense(params, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), _moe_oracle(params, x),
                               atol=1e-4)
    assert float(aux) >= 1.0 - 1e-6  # Switch aux lower bound at balance


def test_top1_ample_capacity_matches_dense():
    params, x = _params(1), _tokens(32, 1)
    yd, auxd = moe_dense(params, x, compute_dtype=jnp.float32)
    yr, auxr = moe_top1(params, x, capacity_factor=float(E),
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(float(auxr), float(auxd), atol=1e-6)

    # gradients agree too (routing is locally constant)
    f = lambda fn: lambda p: jnp.sum(fn(p, x, compute_dtype=jnp.float32)[0]
                                     ** 2)
    gd = jax.grad(f(moe_dense))(params)
    gr = jax.grad(f(lambda p, x, compute_dtype: moe_top1(
        p, x, capacity_factor=float(E), compute_dtype=compute_dtype)))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4), gd, gr)


def test_capacity_drops_overflow_tokens():
    params, x = _params(2), _tokens(64, 2)
    _, idx, _ = router_top1(params, x)
    idx = np.asarray(idx)
    C = 2  # ceil(64 * cf / 4) == 2 -> cf = 0.125
    y, _ = moe_top1(params, x, capacity_factor=0.125,
                    compute_dtype=jnp.float32)
    yd, _ = moe_dense(params, x, compute_dtype=jnp.float32)
    seen = {e: 0 for e in range(E)}
    for n in range(x.shape[0]):
        e = int(idx[n])
        if seen[e] < C:  # under capacity: routed output
            np.testing.assert_allclose(np.asarray(y[n]), np.asarray(yd[n]),
                                       atol=1e-5)
        else:  # dropped: zero contribution
            np.testing.assert_allclose(np.asarray(y[n]), 0.0, atol=1e-6)
        seen[e] += 1


def _moe_cfg(**kw):
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=D,
                            vocab_size=16, input_dim=4,
                            compute_dtype="float32", joint_experts=E,
                            joint_expert_hidden=M, **kw)


def test_moe_model_trains_and_decodes():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    cfg = _moe_cfg()
    tcfg = TrainConfig(batch_size=4, warmup_steps=2, total_steps=50,
                       loss_impl="xla")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    assert "moe" in state.params
    step = make_train_step(cfg, tcfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(4, 12, 4)), jnp.float32)
    fl = jnp.full((4,), 12, jnp.int32)
    labels = jnp.asarray(rng.integers(1, 16, size=(4, 3)), jnp.int32)
    ll = jnp.full((4,), 3, jnp.int32)
    first = None
    for _ in range(30):
        state, info = step(state, feats, fl, labels, ll)
        first = float(info["loss"]) if first is None else first
    assert float(info["loss"]) < first
    toks, lens = recognize_greedy(state.params, cfg, feats, fl,
                                  max_symbols=6)
    assert toks.shape[0] == 4


def test_moe_beam_decode_runs_and_matches_host_joint():
    """Beam search drives joint_step; with MoE it must still agree with
    the (ample-capacity) batch joint — covered via the step≡batch test —
    and produce a valid N-best."""
    from rnn_transducer_tpu.decode.beam import recognize_beam

    cfg = _moe_cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    fl = jnp.asarray([8, 6], jnp.int32)
    toks, lens, scores = recognize_beam(params, cfg, feats, fl, beam=3,
                                        max_symbols=5, expansions=2)
    assert toks.shape == (2, 3, 5)
    s = np.asarray(scores)
    assert np.isfinite(s[:, 0]).all()
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted best-first


def test_moe_joint_step_matches_batch_joint():
    """Decode step (dense routing) == lattice joint (ample capacity)."""
    cfg = _moe_cfg(moe_capacity_factor=float(E))
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.normal(size=(3, 2, cfg.enc_out_dim)), jnp.float32)
    pred = jnp.asarray(rng.normal(size=(3, 2, cfg.pred_hidden)), jnp.float32)
    full = m.joint(params, cfg, enc, pred)  # (3, 2, 2, V)
    for t in range(2):
        for u in range(2):
            one = m.joint_step(params, cfg, enc[:, t], pred[:, u])
            np.testing.assert_allclose(np.asarray(one),
                                       np.asarray(full[:, t, u]), atol=1e-5)


needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
def test_moe_ep_matches_single_device():
    """moe_top1_ep over the model axis == moe_top1 (ample capacity)."""
    from jax.sharding import PartitionSpec as P

    from rnn_transducer_tpu.parallel.tp import make_mesh_2d

    params, x = _params(3), _tokens(64, 3)
    mesh = make_mesh_2d(2, 4)
    y1, aux1 = moe_top1(params, x, capacity_factor=float(E),
                        compute_dtype=jnp.float32)

    local = {k: params[k].reshape((4, 1) + params[k].shape[1:])
             for k in ("w1", "b1", "w2", "b2")}
    local["router"] = params["router"]

    def fn(loc, xs):
        loc = {k: (v[0] if k != "router" else v) for k, v in loc.items()}
        y, aux = moe_top1_ep(loc, xs, axis="model", n_shards=4,
                             capacity_factor=float(E),
                             compute_dtype=jnp.float32)
        return y, aux

    shard = jax.shard_map(
        fn, mesh=mesh,
        in_specs=({"router": P(), "w1": P("model"), "b1": P("model"),
                   "w2": P("model"), "b2": P("model")}, P(None)),
        out_specs=(P(None), P()), check_vma=False)
    # tokens replicated over both axes; every shard routes all 64 tokens
    y2, aux2 = shard(local, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(float(aux2), float(aux1), atol=1e-6)


@needs8
def test_ep_train_step_matches_single_device():
    """One dp2 x ep4 optimizer step == the single-device step (same MoE
    config, ample capacity so no tokens drop)."""
    from rnn_transducer_tpu.parallel import tp as tpx
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    cfg = _moe_cfg(moe_capacity_factor=float(E))
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10,
                       loss_impl="xla", grad_clip_norm=1e9)
    rng = np.random.default_rng(4)
    B, T, U = 8, 8, 3  # T divisible by mp=4 after encoding
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)),
                         jnp.int32)
    ll = jnp.full((B,), U, jnp.int32)

    s0 = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg)(s0, feats, fl, labels, ll)

    mesh = tpx.make_mesh_2d(2, 4)
    eps = tpx.shard_tp_state(mesh, tpx.init_ep_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    batch = tpx.shard_batch_2d(mesh, (feats, fl, labels, ll))
    eps2, info2 = tpx.make_tp_train_step(cfg, tcfg, mesh, "ep")(eps, *batch)
    np.testing.assert_allclose(float(info2["loss"]), float(info1["loss"]),
                               rtol=2e-5)

    merged = tpx.merge_params_ep(jax.device_get(eps2.params), cfg)
    # the jitted step donates its input state: re-init for the re-run
    s0 = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    s1 = make_train_step(cfg, tcfg)(s0, feats, fl, labels, ll)[0]
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), merged,
        jax.device_get(s1.params))


def test_ep_conformer_train_step_matches_single_device():
    """Conformer encoder + MoE joint under ep: the encoder (like all
    non-expert weights) replicates over the model axis and runs
    unchanged; only the expert FFNs shard — dp2 x ep4 step == the
    single-device step."""
    from rnn_transducer_tpu.parallel import tp as tpx
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _moe_cfg(moe_capacity_factor=float(E), enc_type="conformer",
                   enc_heads=2, enc_ff_mult=2, enc_conv_kernel=3)
    tcfg = TrainConfig(batch_size=8, warmup_steps=2, total_steps=10,
                       loss_impl="xla", grad_clip_norm=1e9)
    rng = np.random.default_rng(5)
    B, T, U = 8, 8, 3
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, U)),
                         jnp.int32)
    ll = jnp.full((B,), U, jnp.int32)

    s0 = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    _, info1 = make_train_step(cfg, tcfg)(s0, feats, fl, labels, ll)

    mesh = tpx.make_mesh_2d(2, 4)
    eps = tpx.shard_tp_state(mesh, tpx.init_ep_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, 4))
    batch = tpx.shard_batch_2d(mesh, (feats, fl, labels, ll))
    _, info2 = tpx.make_tp_train_step(cfg, tcfg, mesh, "ep")(eps, *batch)
    np.testing.assert_allclose(float(info2["loss"]), float(info1["loss"]),
                               rtol=2e-5)
