"""Causal (streamable) conformer: chunked encode with carried caches is
exactly the offline causal encode; streaming greedy equals offline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


def _cfg(**kw):
    base = dict(enc_type="conformer", input_dim=8, enc_layers=2,
                enc_hidden=32, enc_heads=4, enc_ff_mult=2,
                enc_conv_kernel=5, enc_att_left=6, pred_layers=1,
                pred_hidden=32, embed_dim=16, joint_dim=32, vocab_size=12,
                compute_dtype="float32")
    base.update(kw)
    return TransducerConfig(**base)


def test_chunked_encode_matches_offline_causal():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, C = 3, 16, 4
    feats = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    lens = jnp.asarray([16, 16, 16], jnp.int32)
    off, off_lens = m.encode(params, cfg, feats, lens)
    state = m.init_enc_state(cfg, B)
    outs = []
    for i in range(T // C):
        chunk = feats[:, i * C: (i + 1) * C]
        out, cl, state = m.encode_chunk(
            params, cfg, chunk, jnp.full((B,), C, jnp.int32), state)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(off), atol=1e-5)


def test_chunked_encode_with_time_reduction_and_partial_tail():
    cfg = _cfg(time_reduction=2, enc_att_left=4)
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, T, C = 2, 12, 4
    feats = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    fl = np.array([12, 10], np.int32)  # utt 1 ends inside the last chunk
    off, off_lens = m.encode(params, cfg, feats, jnp.asarray(fl))
    state = m.init_enc_state(cfg, B)
    outs = []
    for i in range(T // C):
        chunk = feats[:, i * C: (i + 1) * C]
        cl = np.clip(fl - i * C, 0, C).astype(np.int32)
        out, _, state = m.encode_chunk(params, cfg, chunk,
                                       jnp.asarray(cl), state)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)
    for b in range(B):
        nv = int(off_lens[b])
        np.testing.assert_allclose(got[b, :nv], np.asarray(off)[b, :nv],
                                   atol=1e-5)


def test_streaming_greedy_matches_offline():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.streaming import stream_transcribe

    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, T = 2, 16
    feats = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
    fl = jnp.asarray([16, 12], jnp.int32)
    off_t, off_l = recognize_greedy(params, cfg, feats, fl, max_symbols=8)
    st_t, st_l = stream_transcribe(params, cfg, feats, fl,
                                   chunk_frames=4, max_symbols=8)[:2]
    assert np.array_equal(np.asarray(off_t), np.asarray(st_t))
    assert np.array_equal(np.asarray(off_l), np.asarray(st_l))


def test_att_left_actually_restricts():
    """The windowed encoder must differ from full attention (the mask is
    real), while window >= T reproduces the causal-unbounded encoding."""
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    lens = jnp.asarray([12], jnp.int32)
    p_key = jax.random.PRNGKey(4)
    full = m.encode(m.init_params(p_key, _cfg(enc_att_left=0)),
                    _cfg(enc_att_left=0), feats, lens)[0]
    win = m.encode(m.init_params(p_key, _cfg(enc_att_left=3)),
                   _cfg(enc_att_left=3), feats, lens)[0]
    assert not np.allclose(np.asarray(full), np.asarray(win), atol=1e-4)
    # causal conv also differs from SAME-padded conv, so compare two
    # causal configs: window 64 covers T=12 fully -> equal to window 32
    a = m.encode(m.init_params(p_key, _cfg(enc_att_left=32)),
                 _cfg(enc_att_left=32), feats, lens)[0]
    b = m.encode(m.init_params(p_key, _cfg(enc_att_left=64)),
                 _cfg(enc_att_left=64), feats, lens)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_full_attention_conformer_rejects_streaming():
    cfg = _cfg(enc_att_left=0)
    with pytest.raises(AssertionError, match="enc_att_left"):
        m.init_enc_state(cfg, 2)


def test_causal_pad_invariance():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(2, 10, 8)).astype(np.float32)
    lens = np.array([10, 7], np.int32)
    out1, _ = m.encode(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    feats2 = np.concatenate(
        [feats, 30.0 * rng.normal(size=(2, 5, 8)).astype(np.float32)], 1)
    out2, _ = m.encode(params, cfg, jnp.asarray(feats2), jnp.asarray(lens))
    for b in range(2):
        np.testing.assert_allclose(np.asarray(out2)[b, : int(lens[b])],
                                   np.asarray(out1)[b, : int(lens[b])],
                                   atol=1e-5)


def test_chunked_attention_streaming_equals_offline():
    """Chunked (lookahead) attention: encode_chunk over S-aligned chunks
    equals the offline chunked-mask encode (to float reduction-order
    tolerance: the masked-softmax key buffers differ in size) — for
    streaming chunk == S and == 2S, including a partial final chunk."""
    cfg = _cfg(enc_att_left=3, enc_chunk_att=2)
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(40)
    B, T = 2, 8
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray([8, 5], jnp.int32)
    off, off_lens = m.encode(params, cfg, feats, feat_lens)
    for chunk in (2, 4):
        st = m.init_enc_state(cfg, B)
        outs = []
        for c0 in range(0, T, chunk):
            cl = jnp.clip(feat_lens - c0, 0, chunk)
            out, _, st = m.encode_chunk(params, cfg,
                                        feats[:, c0: c0 + chunk], cl, st)
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        want = np.asarray(off)
        for b in range(B):
            n = int(off_lens[b])
            np.testing.assert_allclose(got[b, :n], want[b, :n],
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"chunk={chunk} b={b}")


def test_chunked_attention_sees_in_chunk_future_only():
    """A frame's encoding depends on later frames of its OWN attention
    chunk (the lookahead) but not on the next chunk."""
    cfg = _cfg(enc_att_left=3, enc_chunk_att=4)
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(41)
    T = 8
    feats = np.asarray(rng.normal(size=(1, T, cfg.input_dim)), np.float32)
    lens = jnp.asarray([T], jnp.int32)
    base = np.asarray(m.encode(params, cfg, jnp.asarray(feats), lens)[0])
    # frame 1 is in chunk [0,4): perturbing frame 3 (same chunk, future)
    # must change frame 1's encoding
    f2 = feats.copy()
    f2[0, 3] += 1.0
    out2 = np.asarray(m.encode(params, cfg, jnp.asarray(f2), lens)[0])
    assert np.max(np.abs(out2[0, 1] - base[0, 1])) > 0
    # perturbing frame 5 (NEXT chunk) must not change frame 1
    f3 = feats.copy()
    f3[0, 5] += 1.0
    out3 = np.asarray(m.encode(params, cfg, jnp.asarray(f3), lens)[0])
    np.testing.assert_array_equal(out3[0, :4], base[0, :4])


def test_chunked_attention_streaming_greedy_equals_offline():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.streaming import stream_transcribe
    cfg = _cfg(enc_att_left=2, enc_chunk_att=2)
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(42)
    feats = jnp.asarray(rng.normal(size=(2, 8, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray([8, 6], jnp.int32)
    t_off, l_off = recognize_greedy(params, cfg, feats, feat_lens,
                                    max_symbols=8)
    t_st, l_st = stream_transcribe(params, cfg, feats, feat_lens,
                                   chunk_frames=2, max_symbols=8)
    # argmax decisions are robust to the ~1e-7 encode differences
    np.testing.assert_array_equal(np.asarray(l_st), np.asarray(l_off))
    np.testing.assert_array_equal(np.asarray(t_st), np.asarray(t_off))
