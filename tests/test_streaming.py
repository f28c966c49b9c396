"""Streaming chunked inference: parity with offline greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.greedy import recognize_greedy
from rnn_transducer_tpu.decode.streaming import (
    init_stream,
    stream_chunk,
    stream_transcribe,
)
from rnn_transducer_tpu.models.config import TransducerConfig


def _cfg(time_reduction=2):
    return TransducerConfig(enc_layers=2, enc_hidden=24, pred_layers=1,
                            pred_hidden=24, embed_dim=12, joint_dim=24,
                            vocab_size=10, input_dim=6,
                            time_reduction=time_reduction,
                            compute_dtype="float32")


def test_streaming_matches_offline_greedy():
    from rnn_transducer_tpu.models import transducer as m
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 24
    feats = np.zeros((B, T, cfg.input_dim), np.float32)
    feat_lens = np.array([24, 17, 9], np.int32)
    for b in range(B):
        feats[b, : feat_lens[b]] = rng.normal(
            size=(feat_lens[b], cfg.input_dim))
    feats, feat_lens = jnp.asarray(feats), jnp.asarray(feat_lens)

    off_tok, off_len = recognize_greedy(params, cfg, feats, feat_lens,
                                        max_symbols=16)
    st_tok, st_len = stream_transcribe(params, cfg, feats, feat_lens,
                                       chunk_frames=8, max_symbols=16)
    np.testing.assert_array_equal(np.asarray(off_len), np.asarray(st_len))
    for b in range(B):
        L = int(off_len[b])
        np.testing.assert_array_equal(np.asarray(off_tok[b, :L]),
                                      np.asarray(st_tok[b, :L]))


def test_streaming_transcript_grows_monotonically():
    from rnn_transducer_tpu.models import transducer as m
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, C = 2, 8
    state = init_stream(params, cfg, B, max_symbols=16)
    prev_tokens = None
    prev_lens = np.zeros((B,), np.int32)
    for i in range(3):
        chunk = jnp.asarray(rng.normal(size=(B, C, cfg.input_dim)),
                            jnp.float32)
        cl = jnp.full((B,), C, jnp.int32)
        state, tokens, lens = stream_chunk(params, cfg, state, chunk, cl,
                                           max_symbols=16)
        lens_np = np.asarray(lens)
        assert np.all(lens_np >= prev_lens)
        if prev_tokens is not None:
            for b in range(B):
                np.testing.assert_array_equal(
                    np.asarray(tokens)[b, : prev_lens[b]],
                    prev_tokens[b, : prev_lens[b]])
        prev_tokens, prev_lens = np.asarray(tokens), lens_np


def test_streaming_beam_matches_offline_beam():
    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam
    from rnn_transducer_tpu.models import transducer as m
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, T = 2, 16
    feats = np.zeros((B, T, cfg.input_dim), np.float32)
    feat_lens = np.array([16, 11], np.int32)
    for b in range(B):
        feats[b, : feat_lens[b]] = rng.normal(
            size=(feat_lens[b], cfg.input_dim))
    feats, feat_lens = jnp.asarray(feats), jnp.asarray(feat_lens)
    off_tok, off_len, off_sc = recognize_beam(
        params, cfg, feats, feat_lens, beam=4, max_symbols=10, expansions=2)
    st_tok, st_len, st_sc = stream_transcribe_beam(
        params, cfg, feats, feat_lens, chunk_frames=8, beam=4,
        max_symbols=10, expansions=2)
    np.testing.assert_allclose(np.asarray(st_sc), np.asarray(off_sc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(st_len), np.asarray(off_len))
    for b in range(B):
        L = int(off_len[b, 0])
        np.testing.assert_array_equal(np.asarray(st_tok[b, 0, :L]),
                                      np.asarray(off_tok[b, 0, :L]))


def test_streaming_rejects_bidirectional():
    from rnn_transducer_tpu.models import transducer as m
    cfg = TransducerConfig(enc_layers=1, enc_hidden=8, bidirectional=True,
                           pred_hidden=8, embed_dim=8, joint_dim=8,
                           vocab_size=6, input_dim=4)
    try:
        m.init_enc_state(cfg, 2)
        assert False, "expected AssertionError"
    except AssertionError:
        pass
