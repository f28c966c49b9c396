"""Serving runtime: dynamic batching correctness + coalescing, streaming
session slots (== offline greedy), and the HTTP transport."""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.greedy import recognize_greedy
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.serve import BatchingEngine, StreamingEngine, http_server

CFG = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                       pred_hidden=32, embed_dim=16, joint_dim=32,
                       vocab_size=16, input_dim=8, compute_dtype="float32")
PARAMS = m.init_params(jax.random.PRNGKey(0), CFG)
MAXSYM = 8


def _feats(T, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(T, CFG.input_dim)).astype(np.float32)


def _direct(feats):
    toks, lens = recognize_greedy(
        PARAMS, CFG, jnp.asarray(feats[None]),
        jnp.asarray([feats.shape[0]], jnp.int32), max_symbols=MAXSYM)
    return np.asarray(toks)[0, : int(lens[0])].tolist()


def test_batching_engine_correct_and_coalesces():
    eng = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                         frame_buckets=(16, 24), max_batch=4,
                         window_ms=300.0)
    try:
        eng.warmup()
        inputs = [_feats(10 + 2 * i, seed=i) for i in range(4)]
        want = [_direct(f) for f in inputs]
        got = [None] * 4
        barrier = threading.Barrier(4)

        def call(i):
            barrier.wait()
            got[i] = eng.submit(inputs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert got == want
        s = eng.stats.summary()
        assert s["requests"] == 4
        assert s["max_batch"] >= 2, s  # simultaneous submits coalesced
    finally:
        eng.close()


def test_batching_engine_rejects_oversize():
    import pytest

    eng = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                         frame_buckets=(16,), max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(ValueError, match="bucket"):
            eng.submit(_feats(64, 9))
    finally:
        eng.close()


def test_streaming_engine_sessions_match_offline():
    eng = StreamingEngine(PARAMS, CFG, slots=4, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=50.0)
    try:
        eng.warmup()
        a, b = _feats(16, 20), _feats(16, 21)
        want_a, want_b = _direct(a), _direct(b)
        sa = eng.open_session()
        sb = eng.open_session()
        # interleave chunks of two concurrent sessions
        for t0 in range(0, 16, 8):
            eng.feed(sa, a[t0: t0 + 8])
            eng.feed(sb, b[t0: t0 + 8])
        got_a = eng.close_session(sa)
        got_b = eng.close_session(sb)
        assert got_a == want_a
        assert got_b == want_b

        # the freed slot state was reset: a new session starts clean
        sc = eng.open_session()
        for t0 in range(0, 16, 8):
            out = eng.feed(sc, a[t0: t0 + 8])
        assert out == want_a
        eng.close_session(sc)
    finally:
        eng.close()


def test_submit_validation_isolated_from_cobatched():
    import pytest

    eng = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                         frame_buckets=(16,), max_batch=4,
                         window_ms=100.0)
    try:
        eng.warmup()
        # malformed request fails in the caller's thread, before batching
        with pytest.raises(ValueError, match="feats must be"):
            eng.submit(np.zeros((8, CFG.input_dim + 1), np.float32))
        with pytest.raises(ValueError, match="empty"):
            eng.submit(np.zeros((0, CFG.input_dim), np.float32))
        # a good request sharing the window still succeeds
        f = _feats(10, 50)
        assert eng.submit(f) == _direct(f)
    finally:
        eng.close()


def test_engine_closed_rejects_and_never_strands():
    import pytest

    eng = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                         frame_buckets=(16,), max_batch=2, window_ms=1.0)
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(_feats(10, 51))


def test_streaming_closed_rejects_feed_and_open():
    import pytest

    eng = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0)
    sid = eng.open_session()
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.feed(sid, _feats(8, 52))
    with pytest.raises(RuntimeError, match="closed"):
        eng.open_session()


def test_streaming_short_chunk_ends_session():
    import pytest

    eng = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0)
    try:
        eng.warmup()
        a = _feats(12, 60)
        sid = eng.open_session()
        eng.feed(sid, a[:8])
        eng.feed(sid, a[8:])  # short -> implicitly last
        with pytest.raises(ValueError, match="last chunk"):
            eng.feed(sid, a[:8])
        final = eng.close_session(sid)
        assert final == _direct(a)  # short-final chunk still == offline
        with pytest.raises(KeyError):
            eng.feed(sid, a[:8])
    finally:
        eng.close()


def test_streaming_beam_engine_matches_offline_beam():
    from rnn_transducer_tpu.decode.beam import recognize_beam

    eng = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=20.0,
                          mode="beam", beam=3, expansions=2)
    try:
        eng.warmup()
        a = _feats(16, 70)
        toks, lens, _ = recognize_beam(
            PARAMS, CFG, jnp.asarray(a[None]),
            jnp.asarray([16], jnp.int32), beam=3, max_symbols=MAXSYM,
            expansions=2)
        want = np.asarray(toks)[0, 0, : int(lens[0, 0])].tolist()
        sid = eng.open_session()
        for t0 in range(0, 16, 8):
            out = eng.feed(sid, a[t0: t0 + 8])
        assert eng.close_session(sid) == want
    finally:
        eng.close()


def test_streaming_ttl_reaps_abandoned_sessions():
    import time as _time

    eng = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0,
                          session_ttl_s=0.05)
    try:
        eng.open_session()
        eng.open_session()  # both slots taken, clients vanish
        _time.sleep(0.1)
        sid = eng.open_session()  # reaps an expired session
        assert sid in eng._live
    finally:
        eng.close()


def test_http_server_end_to_end():
    from rnn_transducer_tpu.data.tokenizer import CharTokenizer

    offline = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                             frame_buckets=(16,), max_batch=2,
                             window_ms=1.0)
    streaming = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                                max_symbols=MAXSYM, window_ms=1.0)
    srv = http_server("127.0.0.1", 0, offline, streaming,
                      tok=CharTokenizer(), max_body_bytes=1 << 20)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                   data=data, method=method)
        with urllib.request.urlopen(r, timeout=60) as resp:
            return json.loads(resp.read())

    try:
        assert req("GET", "/healthz")["ok"]
        f = _feats(12, 30)
        out = req("POST", "/recognize", {"feats": f.tolist()})
        assert out["tokens"] == _direct(f)
        assert isinstance(out.get("text"), str)

        sid = req("POST", "/session")["sid"]
        g = _feats(16, 31)
        for t0 in range(0, 16, 8):
            out = req("POST", f"/session/{sid}",
                      {"feats": g[t0: t0 + 8].tolist()})
        final = req("DELETE", f"/session/{sid}")
        assert final["tokens"] == _direct(g)

        stats = req("GET", "/stats")
        assert stats["offline"]["requests"] >= 1
        assert stats["streaming"]["requests"] >= 2

        # raw-audio body: host FBANK (n_mels = cfg.input_dim) runs before
        # submit; 2000 samples -> 11 frames, inside the 16-frame bucket
        rng = np.random.default_rng(7)
        audio = (rng.normal(size=2000) * 0.1).astype(np.float32)
        out = req("POST", "/recognize", {"audio": audio.tolist()})
        assert isinstance(out["tokens"], list)

        # oversized body: rejected with 413 before being read
        big = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize", data=b"x" * (2 << 20),
            method="POST")
        try:
            urllib.request.urlopen(big, timeout=60)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        srv.shutdown()
        offline.close()
        streaming.close()


def test_beam_engine_full_payload():
    """Beam serving exposes n-best, scores, and per-token confidence
    (VERDICT r2: parity with greedy's serving surface)."""
    from rnn_transducer_tpu.decode.beam import recognize_beam

    eng = BatchingEngine(PARAMS, CFG, mode="beam", beam=3, expansions=2,
                         max_symbols=MAXSYM, frame_buckets=(16,),
                         max_batch=2, window_ms=1.0)
    try:
        f = _feats(12, 80)
        out = eng.submit_full(f)
        toks, lens, scores, confs, frames = recognize_beam(
            PARAMS, CFG, jnp.asarray(f[None]),
            jnp.asarray([12], jnp.int32), beam=3, max_symbols=MAXSYM,
            expansions=2, with_confidence=True, with_timestamps=True)
        want_top = np.asarray(toks)[0, 0, : int(lens[0, 0])].tolist()
        assert out["tokens"] == want_top
        assert out["nbest"][0]["tokens"] == want_top
        np.testing.assert_allclose(out["score"], float(scores[0, 0]),
                                   atol=1e-3)
        np.testing.assert_allclose(
            out["confidence"],
            np.round(np.asarray(confs)[0, 0, : len(want_top)], 4),
            atol=1e-3)
        assert len(out["confidence"]) == len(out["tokens"])
        # per-token emission timestamps (input-feature frames; tr == 1)
        assert out["frames"] == np.asarray(frames)[0, 0,
                                                   : len(want_top)].tolist()
        # n-best sorted best-first, all real log-probs
        sc = [h["score"] for h in out["nbest"]]
        assert sc == sorted(sc, reverse=True)
        # plain submit() keeps the token-list contract
        assert eng.submit(f) == want_top
    finally:
        eng.close()


def test_streaming_full_payload_and_stable_prefix():
    greedy = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                             max_symbols=MAXSYM, window_ms=1.0)
    beam = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                           max_symbols=MAXSYM, window_ms=1.0,
                           mode="beam", beam=3, expansions=2)
    try:
        a = _feats(16, 81)
        sid = greedy.open_session()
        for t0 in range(0, 16, 8):
            out = greedy.feed_full(sid, a[t0: t0 + 8])
        # greedy partials are final: stable == everything, with confidence
        assert out["stable_len"] == len(out["tokens"])
        assert len(out["confidence"]) == len(out["tokens"])
        assert all(c <= 1e-5 for c in out["confidence"])
        # timestamps: one per token, nondecreasing, within the 16 frames fed
        assert len(out["frames"]) == len(out["tokens"])
        assert all(b >= a for a, b in zip(out["frames"], out["frames"][1:]))
        assert all(0 <= fr < 16 for fr in out["frames"])
        greedy.close_session(sid)

        sid = beam.open_session()
        stable_prev = 0
        for t0 in range(0, 16, 8):
            out = beam.feed_full(sid, a[t0: t0 + 8])
            # the stable prefix never shrinks and never exceeds the output
            assert 0 <= out["stable_len"] <= len(out["tokens"])
            assert out["stable_len"] >= stable_prev
            stable_prev = out["stable_len"]
            assert out["nbest"][0]["tokens"] == out["tokens"]
            sc = [h["score"] for h in out["nbest"]]
            assert sc == sorted(sc, reverse=True)
            assert len(out["frames"]) == len(out["tokens"])
        assert beam.close_session(sid) == out["tokens"]
    finally:
        greedy.close()
        beam.close()


def test_streaming_endpointing():
    """Blank-posterior endpointing: with endpoint_frames set, partial
    results carry trailing_frames (input frames since the decoder's last
    emission, from the timestamp stream) and an endpoint flag."""
    # blank-biased model: nothing is ever emitted -> pure trailing silence
    silent = dict(PARAMS, joint=dict(
        PARAMS["joint"], out=dict(
            PARAMS["joint"]["out"],
            b=PARAMS["joint"]["out"]["b"].at[CFG.blank].add(50.0))))
    eng = StreamingEngine(silent, CFG, slots=1, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0,
                          endpoint_frames=12)
    try:
        a = _feats(24, 99)
        sid = eng.open_session()
        out = eng.feed_full(sid, a[0:8])
        assert out["tokens"] == []
        assert out["trailing_frames"] == 8 and out["endpoint"] is False
        out = eng.feed_full(sid, a[8:16])
        assert out["trailing_frames"] == 16 and out["endpoint"] is True
        eng.close_session(sid)
    finally:
        eng.close()

    # emitting model: trailing == fed - (last emission frame + tr);
    # endpoint flag consistent with the reported payload
    eng = StreamingEngine(PARAMS, CFG, slots=1, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0,
                          endpoint_frames=4)
    try:
        sid = eng.open_session()
        fed = 0
        for t0 in range(0, 16, 8):
            out = eng.feed_full(sid, _feats(16, 81)[t0: t0 + 8])
            fed += 8
            want = fed - (out["frames"][-1] + CFG.time_reduction) \
                if out["frames"] else fed
            assert out["trailing_frames"] == want
            assert out["endpoint"] == (want >= 4)
        eng.close_session(sid)
    finally:
        eng.close()

    # default engine: no endpoint keys
    eng = StreamingEngine(PARAMS, CFG, slots=1, chunk_frames=8,
                          max_symbols=MAXSYM, window_ms=1.0)
    try:
        sid = eng.open_session()
        out = eng.feed_full(sid, _feats(8, 82))
        assert "endpoint" not in out and "trailing_frames" not in out
        eng.close_session(sid)
    finally:
        eng.close()


def test_engines_with_contextual_biasing_match_direct():
    """Offline + streaming beam engines with a ContextBias reproduce the
    direct biased decodes exactly (tables ride through the engine paths)."""
    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.context import build_context_bias

    bias = build_context_bias([[1, 2], [3, 4, 5]], CFG.vocab_size,
                              boosts=[1.5, 2.5])
    a = _feats(16, 90)
    toks, lens, scores = recognize_beam(
        PARAMS, CFG, jnp.asarray(a[None]), jnp.asarray([16], jnp.int32),
        beam=3, max_symbols=MAXSYM, expansions=2, context=bias)
    want = np.asarray(toks)[0, 0, : int(lens[0, 0])].tolist()

    eng = BatchingEngine(PARAMS, CFG, mode="beam", beam=3, expansions=2,
                         max_symbols=MAXSYM, frame_buckets=(16,),
                         max_batch=2, window_ms=1.0, context=bias)
    try:
        out = eng.submit_full(a)
        assert out["tokens"] == want
        np.testing.assert_allclose(out["score"],
                                   float(np.asarray(scores)[0, 0]),
                                   atol=1e-3)
    finally:
        eng.close()

    seng = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=8,
                           max_symbols=MAXSYM, window_ms=10.0,
                           mode="beam", beam=3, expansions=2, context=bias)
    try:
        seng.warmup()
        sid = seng.open_session()
        for t0 in range(0, 16, 8):
            seng.feed(sid, a[t0: t0 + 8])
        assert seng.close_session(sid) == want
    finally:
        seng.close()

    # biasing is beam-only
    import pytest
    with pytest.raises(ValueError):
        BatchingEngine(PARAMS, CFG, mode="greedy", context=bias)
    with pytest.raises(ValueError):
        StreamingEngine(PARAMS, CFG, slots=1, mode="greedy", context=bias)


def test_http_pcm_streaming_exact_vs_offline():
    """Raw-PCM streaming sessions accept ANY chunk size: the per-session
    incremental featurizer (data/pcm_stream.py) + feature buffering make
    arbitrarily-split PCM produce the SAME features as featurizing the
    whole waveform, so the final tokens equal the offline /recognize
    result on the full audio (streaming greedy ≡ offline greedy)."""
    offline = BatchingEngine(PARAMS, CFG, max_symbols=MAXSYM,
                             frame_buckets=(32,), max_batch=2,
                             window_ms=1.0)
    streaming = StreamingEngine(PARAMS, CFG, slots=2, chunk_frames=4,
                                max_symbols=MAXSYM, window_ms=1.0)
    srv = http_server("127.0.0.1", 0, offline, streaming,
                      max_body_bytes=1 << 22)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()

    def req(method, path, payload=None):
        data = json.dumps(payload).encode() if payload is not None else None
        r = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                   data=data, method=method)
        with urllib.request.urlopen(r, timeout=60) as resp:
            return json.loads(resp.read())

    rng = np.random.default_rng(11)
    # 400 + 160*18 samples -> 19 feature frames (snip-edges)
    audio = (rng.normal(size=400 + 160 * 18) * 0.1).astype(np.float32)
    try:
        ref = req("POST", "/recognize", {"audio": audio.tolist()})

        sid = req("POST", "/session")["sid"]
        # uneven splits, none aligned to frames or engine chunks; the
        # tiny 50-sample POST completes no frame at all
        cuts = [700, 750, 1911, 2400]
        parts = np.split(audio, cuts)
        outs = [req("POST", f"/session/{sid}", {"audio": p.tolist()})
                for p in parts[:-1]]
        assert any("pending_frames" in o for o in outs)
        last = req("POST", f"/session/{sid}",
                   {"audio": parts[-1].tolist(), "last": True})
        final = req("DELETE", f"/session/{sid}")
        assert final["tokens"] == ref["tokens"]
        # partials were well-formed token lists throughout
        for o in outs + [last]:
            assert isinstance(o["tokens"], list)
    finally:
        srv.shutdown()
        offline.close()
        streaming.close()
