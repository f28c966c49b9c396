"""On-chip greedy decoder kernel vs the lock-step while_loop decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.greedy import greedy_decode
from rnn_transducer_tpu.decode.greedy_pallas import (greedy_decode_fused,
                                                     supported)
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


def _cfg():
    return TransducerConfig(enc_layers=1, enc_hidden=128, pred_layers=1,
                            pred_hidden=128, embed_dim=128, joint_dim=128,
                            vocab_size=11, input_dim=8,
                            compute_dtype="float32")


def test_supported_predicate():
    assert supported(_cfg())
    assert not supported(TransducerConfig(pred_hidden=100))
    assert not supported(TransducerConfig(pred_layers=2))


def test_fused_greedy_matches_lockstep():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 14
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([14, 9, 12], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    want_t, want_l, _ = greedy_decode(params, cfg, enc_out, enc_lens,
                                      max_symbols=16)
    got_t, got_l = jax.jit(
        lambda e, el: greedy_decode_fused(params, cfg, e, el,
                                          max_symbols=16))(enc_out, enc_lens)
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))
    for b in range(B):
        L = int(want_l[b])
        np.testing.assert_array_equal(np.asarray(got_t[b, :L]),
                                      np.asarray(want_t[b, :L]))


def test_fused_greedy_max_symbols_cap():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    params["joint"]["out"]["b"] = (
        params["joint"]["out"]["b"].at[cfg.blank].add(-50.0))
    rng = np.random.default_rng(1)
    enc_out = jnp.asarray(rng.normal(size=(1, 10, cfg.enc_out_dim)),
                          jnp.float32)
    toks, lens = greedy_decode_fused(params, cfg, enc_out,
                                     jnp.asarray([10], jnp.int32),
                                     max_symbols=8)
    assert int(lens[0]) == 8
