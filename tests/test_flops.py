"""Validate the analytic MFU FLOP counter against XLA's cost analysis.

utils/flops.py counts matmul FLOPs only (the standard model-FLOPs MFU
convention). XLA's compiled cost analysis counts every HLO op, so at
matmul-dominated shapes the two must agree closely — except inside
`lax.scan`, whose body XLA counts once instead of T times; the LSTM
formula is therefore checked against a Python-unrolled loop where XLA
sees every step. This keeps the benchmark-reported MFU honest.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.ops.lstm import init_lstm_params, lstm_cell
from rnn_transducer_tpu.utils.flops import (_lstm_layer_flops, joint_flops,
                                            train_step_flops, forward_flops)


def _xla_flops(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    return float(comp.cost_analysis()["flops"])


def test_joint_flops_matches_xla_cost_analysis():
    cfg = TransducerConfig(enc_layers=2, enc_hidden=256, pred_layers=1,
                           pred_hidden=256, embed_dim=256, joint_dim=256,
                           vocab_size=256, input_dim=64, time_reduction=1)
    B, T, U = 8, 32, 8
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    eo = jnp.zeros((B, T, cfg.enc_out_dim))
    po = jnp.zeros((B, U + 1, cfg.pred_hidden))
    got = _xla_flops(lambda p, a, b: m.joint(p, cfg, a, b), params, eo, po)
    want = joint_flops(cfg, B, T, U)
    # want counts matmuls only -> lower bound; elementwise slack is small
    assert want <= got * 1.01, (want, got)
    assert got <= want * 1.10, (want, got)


def test_lstm_layer_flops_matches_unrolled_xla():
    """XLA counts a lax.scan body once; unroll the loop so it sees all T
    steps, then compare against the per-layer analytic formula."""
    B, T, I, H = 8, 4, 64, 256
    params = init_lstm_params(jax.random.PRNGKey(0), I, H)
    x = jnp.zeros((B, T, I))

    def unrolled(p, x):
        xp = (jnp.dot(x, p["w_ih"], preferred_element_type=jnp.float32)
              + p["b"])
        h = jnp.zeros((B, H), jnp.float32)
        c = jnp.zeros((B, H), jnp.float32)
        ys = []
        for t in range(T):
            h, c = lstm_cell(p, xp[:, t], h, c, jnp.float32)
            ys.append(h)
        return jnp.stack(ys, axis=1)

    got = _xla_flops(unrolled, params, x)
    want = _lstm_layer_flops(B, T, I, H)
    assert want <= got * 1.01, (want, got)
    assert got <= want * 1.15, (want, got)


def test_train_step_flops_composition():
    """train_step = 3x forward; forward = encoder + predictor + joint,
    with bidirectional doubling and time reduction applied."""
    cfg = TransducerConfig(enc_layers=2, enc_hidden=128, bidirectional=True,
                           pred_layers=1, pred_hidden=128, embed_dim=128,
                           joint_dim=128, vocab_size=128, input_dim=64,
                           time_reduction=2)
    B, T, U = 8, 32, 8
    fwd = forward_flops(cfg, B, T, U)
    assert train_step_flops(cfg, B, T, U) == 3.0 * fwd
    # bidirectional encoder = 2x the unidirectional layer matmuls
    uni = TransducerConfig(**{**cfg.__dict__, "bidirectional": False})
    from rnn_transducer_tpu.utils.flops import encoder_flops
    # layer 0 input dims differ (enc_out_dim halves), so just sanity-bound
    assert encoder_flops(cfg, B, T) > encoder_flops(uni, B, T)
