"""Beam search for duration-jump models (multi-blank + TDT): the batched
wake-time search vs literal host-side sequential implementations of the
same algorithm, and streaming ≡ offline exactness across chunk-boundary
jumps (decode/beam.py wake mechanism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnn_transducer_tpu.decode.beam import beam_search
from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig

NEG_INF = -1.0e30


def _cfg(**kw):
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=6, input_dim=4,
                            compute_dtype="float32", **kw)


def _pred_cache(params, cfg):
    cache = {}

    def pred_out_for(seq):
        if seq not in cache:
            out, state = m.predict_step(params, cfg,
                                        jnp.asarray([cfg.blank], jnp.int32),
                                        m.init_pred_state(cfg, 1))
            for tok in seq:
                out, state = m.predict_step(
                    params, cfg, jnp.asarray([tok], jnp.int32), state)
            cache[seq] = out
        return cache[seq]

    return pred_out_for


def _host_beam_multiblank(params, cfg, enc_out, enc_len, beam, expansions,
                          max_symbols):
    """Sequential wake-time search, multi-blank arcs. Hypotheses are
    (seq, wake); the pool merges equal (seq, wake) via logaddexp —
    mirrors the device algorithm exactly."""
    V = cfg.vocab_size
    blank_arcs = [(cfg.blank, 1)] + [
        (V + k, int(d)) for k, d in enumerate(cfg.big_blank_durations)]
    pred_out_for = _pred_cache(params, cfg)

    def lp_for(t, seq):
        logits = m.joint_step(params, cfg, enc_out[None, t],
                              pred_out_for(seq))
        return np.asarray(jax.nn.log_softmax(logits[0]))

    beams = [((), 0, 0.0)]  # (seq, wake, score)
    for t in range(enc_len):
        pool = {}

        def add(seq, wake, sc):
            key = (seq, wake)
            pool[key] = np.logaddexp(pool.get(key, -np.inf), sc)

        live = []
        for seq, wake, sc in beams:
            if wake > t:  # sleeping through a jump: persist unchanged
                add(seq, wake, sc)
            else:
                live.append((seq, sc))
        for e in range(expansions + 1):
            for seq, sc in live:
                lp = lp_for(t, seq)
                for col, d in blank_arcs:
                    add(seq, t + d, sc + lp[col])
            if e == expansions:
                break
            cands = []
            for seq, sc in live:
                if len(seq) >= max_symbols:
                    continue
                lp = lp_for(t, seq)
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v], seq + (v,)))
            cands.sort(key=lambda x: -x[0])
            live = [(seq, sc) for sc, seq in cands[:beam]]
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, wake, sc) for (seq, wake), sc in merged]
    return sorted([(seq, sc) for seq, _, sc in beams], key=lambda x: -x[1])


def _host_beam_tdt(params, cfg, enc_out, enc_len, beam, expansions,
                   max_symbols):
    """Sequential wake-time search, TDT arcs: every emission (token or
    blank) forks over the duration set with the duration head's
    log-probs; duration-0 tokens continue live at the same frame. Same
    top-K-then-fork decomposition as the device search."""
    V = cfg.vocab_size
    dvals = tuple(int(d) for d in cfg.tdt_durations)
    pred_out_for = _pred_cache(params, cfg)

    def lp_for(t, seq):
        logits, dur = m.joint_step_tdt(params, cfg, enc_out[None, t],
                                       pred_out_for(seq))
        return (np.asarray(jax.nn.log_softmax(logits[0])),
                np.asarray(jax.nn.log_softmax(dur[0])))

    beams = [((), 0, 0.0)]
    for t in range(enc_len):
        pool = {}

        def add(seq, wake, sc):
            key = (seq, wake)
            pool[key] = np.logaddexp(pool.get(key, -np.inf), sc)

        live = []
        for seq, wake, sc in beams:
            if wake > t:
                add(seq, wake, sc)
            else:
                live.append((seq, sc))
        for e in range(expansions + 1):
            for seq, sc in live:
                lp, dlp = lp_for(t, seq)
                for i, d in enumerate(dvals):
                    if d > 0:
                        add(seq, t + d, sc + lp[cfg.blank] + dlp[i])
            if e == expansions:
                break
            cands = []
            for seq, sc in live:
                if len(seq) >= max_symbols:
                    continue
                lp, dlp = lp_for(t, seq)
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v], seq + (v,), dlp))
            cands.sort(key=lambda x: -x[0])
            next_live = []
            for sc, seq, dlp in cands[:beam]:
                for i, d in enumerate(dvals):
                    if d > 0:
                        add(seq, t + d, sc + dlp[i])
                    else:
                        next_live.append((seq, sc + dlp[i]))
            live = next_live
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, wake, sc) for (seq, wake), sc in merged]
    return sorted([(seq, sc) for seq, _, sc in beams], key=lambda x: -x[1])


def _device_nbest(params, cfg, enc_out, enc_lens, K, E, U):
    tokens, lens, scores, _ = jax.jit(
        lambda e, el: beam_search(params, cfg, e, el, beam=K,
                                  max_symbols=U, expansions=E))(
        enc_out, enc_lens)
    return map(np.asarray, (tokens, lens, scores))


def _check_vs_host(tokens, lens, scores, host_fn, B):
    for b in range(B):
        want = host_fn(b)
        got = [(tuple(tokens[b, k, : lens[b, k]].tolist()), scores[b, k])
               for k in range(tokens.shape[1]) if scores[b, k] > NEG_INF / 2]
        assert len(got) == len(want), (b, got, want)
        for (gseq, gsc), (wseq, wsc) in zip(got, want):
            assert gseq == wseq, (b, got, want)
            np.testing.assert_allclose(gsc, wsc, rtol=1e-4, atol=1e-4)


def test_multiblank_beam_matches_host_reference():
    cfg = _cfg(big_blank_durations=(2, 3))
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 6
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6, 4, 5], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    K, E, U = 4, 2, 8
    tokens, lens, scores = _device_nbest(params, cfg, enc_out, enc_lens,
                                         K, E, U)
    _check_vs_host(
        tokens, lens, scores,
        lambda b: _host_beam_multiblank(params, cfg, enc_out[b],
                                        int(enc_lens[b]), K, E, U), B)


def test_tdt_beam_matches_host_reference():
    cfg = _cfg(tdt_durations=(0, 1, 2))
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, T = 3, 6
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6, 4, 5], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    K, E, U = 4, 2, 8
    tokens, lens, scores = _device_nbest(params, cfg, enc_out, enc_lens,
                                         K, E, U)
    _check_vs_host(
        tokens, lens, scores,
        lambda b: _host_beam_tdt(params, cfg, enc_out[b], int(enc_lens[b]),
                                 K, E, U), B)


def test_tdt_beam_no_zero_duration_set():
    """A duration set without 0: every emission advances time; the live
    continuation is dead after round 1 but the search must stay valid."""
    cfg = _cfg(tdt_durations=(1, 2, 4))
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 5, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([5, 4], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    K, E, U = 4, 2, 8
    tokens, lens, scores = _device_nbest(params, cfg, enc_out, enc_lens,
                                         K, E, U)
    _check_vs_host(
        tokens, lens, scores,
        lambda b: _host_beam_tdt(params, cfg, enc_out[b], int(enc_lens[b]),
                                 K, E, U), 2)


@pytest.mark.parametrize("family", ["multiblank", "tdt"])
def test_streaming_beam_equals_offline_duration_models(family):
    """Chunked beam decode ≡ offline: wake offsets carried across chunk
    boundaries keep mid-jump hypotheses exact (chunk size 2 < max jump
    duration, so jumps straddle boundaries)."""
    if family == "multiblank":
        cfg = _cfg(big_blank_durations=(2, 3))
    else:
        cfg = _cfg(tdt_durations=(0, 1, 2, 3))
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    B, T = 2, 8
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([8, 6], np.int32))
    K, E, U = 4, 2, 10
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tok_off, len_off, sc_off, _ = beam_search(
        params, cfg, enc_out, enc_lens, beam=K, max_symbols=U,
        expansions=E)
    tok_st, len_st, sc_st = stream_transcribe_beam(
        params, cfg, feats, feat_lens, chunk_frames=2, beam=K,
        max_symbols=U, expansions=E)
    np.testing.assert_allclose(np.asarray(sc_st), np.asarray(sc_off),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(len_st), np.asarray(len_off))
    np.testing.assert_array_equal(np.asarray(tok_st), np.asarray(tok_off))


def test_standard_model_wake_is_inert():
    """For a standard model the wake mechanism must be invisible: every
    surviving beam's carried wake is exactly 0 after re-basing."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(2, 5, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([5, 3], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    _, _, scores, carry = beam_search(params, cfg, enc_out, enc_lens,
                                      beam=4, max_symbols=8, expansions=2)
    wake = np.asarray(carry[4]["wake"])
    live = np.asarray(scores) > NEG_INF / 2
    assert np.all(wake[live] == 0)
