"""Per-token emission timestamps (frame indices) through greedy, beam,
and streaming decode — the companion of the per-token confidence stream.

The reference family has no timestamp surface; capability target is
production alignment output (cf. forced alignment, ops/rnnt_align.py):
each emitted token is stamped with the GLOBAL encoder frame it was
emitted at, carried on-device through the decode loops and across
streaming chunks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.beam import recognize_beam
from rnn_transducer_tpu.decode.greedy import recognize_greedy
from rnn_transducer_tpu.decode.streaming import (stream_transcribe,
                                                 stream_transcribe_beam)
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


def _cfg():
    return TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                            pred_hidden=32, embed_dim=16, joint_dim=32,
                            vocab_size=11, input_dim=8,
                            compute_dtype="float32")


def test_greedy_frames_match_host_replay():
    """Device-loop emit frames == a literal host replay of the same
    greedy trajectory (the frame cursor t at each emission)."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, T = 3, 12
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 9, 12], np.int32))
    toks, lens, frames = recognize_greedy(params, cfg, feats, feat_lens,
                                          max_symbols=10,
                                          with_timestamps=True)
    toks, lens, frames = (np.asarray(toks), np.asarray(lens),
                          np.asarray(frames))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    for b in range(B):
        state = m.init_pred_state(cfg, 1)
        pred_out, state = m.predict_step(
            params, cfg, jnp.full((1,), cfg.blank, jnp.int32), state)
        t, got = 0, []
        while t < int(enc_lens[b]) and len(got) < 10:
            logits = np.asarray(m.joint_step(params, cfg,
                                             enc_out[b][None, t], pred_out))
            k = int(np.argmax(logits[0]))
            if k == cfg.blank:
                t += 1
            else:
                got.append((k, t))
                pred_out, state = m.predict_step(
                    params, cfg, jnp.asarray([k], jnp.int32), state)
        assert len(got) == int(lens[b])
        for i, (k, fr) in enumerate(got):
            assert toks[b, i] == k
            assert frames[b, i] == fr, (b, i)
        assert (frames[b, int(lens[b]):] == 0).all()


def test_greedy_streaming_frames_match_offline():
    """Streaming chunked greedy stamps the same GLOBAL frames as the
    offline decode (the carried frame offset bridges chunks)."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    B, T = 2, 16
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([16, 11], np.int32))
    toks_o, lens_o, fr_o = recognize_greedy(params, cfg, feats, feat_lens,
                                            max_symbols=12,
                                            with_timestamps=True)
    toks_s, lens_s, fr_s = stream_transcribe(params, cfg, feats, feat_lens,
                                             chunk_frames=4, max_symbols=12,
                                             with_timestamps=True)
    np.testing.assert_array_equal(np.asarray(lens_o), np.asarray(lens_s))
    np.testing.assert_array_equal(np.asarray(toks_o), np.asarray(toks_s))
    np.testing.assert_array_equal(np.asarray(fr_o), np.asarray(fr_s))


def test_beam_frames_sane_and_monotonic():
    """Beam timestamps: within [0, enc_len), nondecreasing along each
    hypothesis (frame-synchronous search emits in frame order), zero
    past each beam's length."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, T, K = 2, 10, 3
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([10, 7], np.int32))
    toks, lens, scores, frames = recognize_beam(
        params, cfg, feats, feat_lens, beam=K, max_symbols=8,
        expansions=2, with_timestamps=True)
    lens, frames = np.asarray(lens), np.asarray(frames)
    scores = np.asarray(scores)
    enc_lens = np.asarray(
        m.encode(params, cfg, feats, feat_lens)[1])
    for b in range(B):
        for k in range(K):
            if scores[b, k] <= -5e29:
                continue
            n = int(lens[b, k])
            fr = frames[b, k, :n]
            assert (fr >= 0).all() and (fr < enc_lens[b]).all(), (b, k, fr)
            assert (np.diff(fr) >= 0).all(), (b, k, fr)
            assert (frames[b, k, n:] == 0).all()


def test_beam_streaming_frames_match_offline():
    """Streaming beam stamps the same global frames as offline beam for
    the matching hypotheses."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    B, T, K = 2, 12, 3
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 8], np.int32))
    off = recognize_beam(params, cfg, feats, feat_lens, beam=K,
                         max_symbols=8, expansions=2, with_timestamps=True)
    st = stream_transcribe_beam(params, cfg, feats, feat_lens,
                                chunk_frames=4, beam=K, max_symbols=8,
                                expansions=2, with_timestamps=True)
    toks_o, lens_o, sc_o, fr_o = map(np.asarray, off)
    toks_s, lens_s, sc_s, fr_s = map(np.asarray, st)
    # same search (chunking does not change frame-synchronous expansion)
    np.testing.assert_array_equal(toks_o, toks_s)
    np.testing.assert_array_equal(lens_o, lens_s)
    np.testing.assert_array_equal(fr_o, fr_s)


def test_recognize_cli_timestamps(tmp_path):
    """recognize.py --timestamps writes frames + times_s to --hyps-file."""
    import json

    from recognize import main as recognize_main

    hyps = tmp_path / "hyps.jsonl"
    recognize_main(["--config", "smoke", "--mode", "greedy",
                    "--data", "synthetic", "--batches", "1",
                    "--batch-size", "2", "--max-symbols", "12",
                    "--timestamps", "--hyps-file", str(hyps)])
    recs = [json.loads(l) for l in hyps.read_text().splitlines()]
    assert recs
    for r in recs:
        assert len(r["frames"]) == len(r["hyp"])
        assert len(r["times_s"]) == len(r["hyp"])
        assert all(b >= a for a, b in zip(r["frames"], r["frames"][1:]))
        # times_s = frames * hop (0.01 default)
        for fr, ts in zip(r["frames"], r["times_s"]):
            assert abs(ts - fr * 0.01) < 1e-6


def test_recognize_cli_words(tmp_path):
    """--timestamps + a tokenizer adds word-level segments to the JSONL
    (decode/words.py): words reconstruct the hyp text, times ride the
    frame hop."""
    import json

    from recognize import main as recognize_main

    hyps = tmp_path / "hyps.jsonl"
    recognize_main(["--config", "smoke", "--mode", "greedy",
                    "--data", "synthetic", "--batches", "1",
                    "--batch-size", "2", "--max-symbols", "12",
                    "--timestamps", "--confidence", "--tokenizer", "char",
                    "--hyps-file", str(hyps)])
    recs = [json.loads(l) for l in hyps.read_text().splitlines()]
    assert recs
    for r in recs:
        assert "words" in r
        assert [w["word"] for w in r["words"]] == r["hyp"].split()
        for w in r["words"]:
            assert w["end_s"] > w["start_s"] >= 0.0
            assert w["conf"] <= 0.0  # log-prob domain
