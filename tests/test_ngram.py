"""Backoff n-gram LM (models/ngram.py): estimation correctness
(normalization, discount math, backoff/next-state walks), device fusion
vs a host sequential fused reference, zero-weight identity, streaming
exactness, save/load + trainer CLI, and accuracy evidence (fusion cuts
WER on the grammar task of test_lm_improves_wer)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.beam import beam_search, recognize_beam
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.models.ngram import (NgramLM, load_ngram,
                                             save_ngram, sequence_logprob,
                                             train_ngram)

NEG_INF = -1.0e30


def _cfg(vocab=8):
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=vocab, input_dim=4,
                            compute_dtype="float32")


def test_rows_normalize_and_discount_math():
    V, D = 5, 0.75
    lm = train_ngram([[1, 2], [1, 3], [2, 3]], order=2, vocab_size=V,
                     discount=D)
    lp = np.asarray(lm.lp)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)
    # unigram (state of context ()): counts 1:2, 2:2, 3:2, N=6, T=3
    # P1(v) = max(c-D,0)/6 + (D*3/6)/V
    sid_empty = 0  # shortest-first ordering puts () first
    base = (D * 3 / 6) / V
    np.testing.assert_allclose(np.exp(lp[sid_empty, 1]), (2 - D) / 6 + base,
                               rtol=1e-5)
    np.testing.assert_allclose(np.exp(lp[sid_empty, 4]), base, rtol=1e-5)
    # bigram state (1,): c(1->2)=1, c(1->3)=1: explicit mass + interpolation
    nxt = np.asarray(lm.next_state)
    s1 = int(nxt[lm.start, 1])  # BOS -(1)-> state (1,)
    p2 = np.exp(lp[s1, 2])
    p4 = np.exp(lp[s1, 4])
    want_p2 = (1 - D) / 2 + (D * 2 / 2) * np.exp(lp[sid_empty, 2])
    np.testing.assert_allclose(p2, want_p2, rtol=1e-5)
    assert p2 > p4  # seen continuation beats backoff-only
    # next-state: (1,) -(2)-> (2,) which IS a state (history of 3 in [2,3])
    s2 = int(nxt[s1, 2])
    assert s2 != sid_empty
    # (1,) -(4)-> (4,) unseen history: falls back to ()
    assert int(nxt[s1, 4]) == sid_empty
    # sequence_logprob chains lp/next_state
    want = float(lp[lm.start, 1]) + float(lp[s1, 2])
    np.testing.assert_allclose(sequence_logprob(lm, [1, 2]), want, rtol=1e-6)


def test_trigram_states_and_save_load(tmp_path):
    lm = train_ngram([[1, 2, 3, 1, 2, 4]], order=3, vocab_size=6)
    np.testing.assert_allclose(np.exp(np.asarray(lm.lp)).sum(-1), 1.0,
                               rtol=1e-5)
    # trigram context (1, 2) must be a state that differs from (2,)
    nxt = np.asarray(lm.next_state)
    s1 = int(nxt[lm.start, 1])
    s12 = int(nxt[s1, 2])
    lp = np.asarray(lm.lp)
    # after (1,2): 3 and 4 both observed; after just (2,): same but via
    # different counts — states must be distinct trigram contexts
    assert np.exp(lp[s12, 3]) > 0.2
    p = str(tmp_path / "lm3")
    save_ngram(lm, p)
    lm2 = load_ngram(p)
    np.testing.assert_array_equal(np.asarray(lm.lp), np.asarray(lm2.lp))
    np.testing.assert_array_equal(np.asarray(lm.next_state),
                                  np.asarray(lm2.next_state))
    assert lm2.start == lm.start


def _host_beam_ngram(params, cfg, lm, w, enc_out, enc_len, beam,
                     expansions, max_symbols):
    """Sequential merged reference: label extensions add w * lp walked on
    the host tables (mirrors tests/test_lm_fusion.py's _host_beam_lm)."""
    lp_t = np.asarray(lm.lp)
    nxt = np.asarray(lm.next_state)
    V = cfg.vocab_size
    pred_cache = {}

    def pred_out_for(seq):
        if seq not in pred_cache:
            out, state = m.predict_step(params, cfg,
                                        jnp.asarray([cfg.blank], jnp.int32),
                                        m.init_pred_state(cfg, 1))
            for tok in seq:
                out, state = m.predict_step(
                    params, cfg, jnp.asarray([tok], jnp.int32), state)
            pred_cache[seq] = out
        return pred_cache[seq]

    def lp_for(t, seq):
        logits = m.joint_step(params, cfg, enc_out[None, t],
                              pred_out_for(seq))
        return np.asarray(jax.nn.log_softmax(logits[0]))

    def state_for(seq):
        s = lm.start
        for v in seq:
            s = int(nxt[s, v])
        return s

    beams = [((), 0.0)]
    for t in range(enc_len):
        pool = {}
        live = list(beams)
        for e in range(expansions + 1):
            for seq, sc in live:
                lp = lp_for(t, seq)
                pool[seq] = np.logaddexp(pool.get(seq, -np.inf),
                                         sc + lp[cfg.blank])
            if e == expansions:
                break
            cands = []
            for seq, sc in live:
                if len(seq) >= max_symbols:
                    continue
                lp = lp_for(t, seq)
                ng = lp_t[state_for(seq)]
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v] + w * ng[v], seq + (v,)))
            cands.sort(key=lambda x: -x[0])
            live = [(seq, sc) for sc, seq in cands[:beam]]
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, sc) for seq, sc in merged]
    return beams


def test_device_fusion_matches_host_reference():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    lm = train_ngram([[1, 2, 3], [1, 2, 4], [2, 3]], order=2,
                     vocab_size=cfg.vocab_size)
    rng = np.random.default_rng(0)
    B, T, K, E, U, W = 2, 5, 4, 2, 8, 0.4
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([5, 3], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, scores, _ = jax.jit(
        lambda e, el, ng: beam_search(params, cfg, e, el, beam=K,
                                      max_symbols=U, expansions=E,
                                      ngram=(ng, W)))(enc_out, enc_lens, lm)
    tokens, lens, scores = map(np.asarray, (tokens, lens, scores))
    for b in range(B):
        want = _host_beam_ngram(params, cfg, lm, W, enc_out[b],
                                int(enc_lens[b]), beam=K, expansions=E,
                                max_symbols=U)
        got = [(tuple(tokens[b, k, : lens[b, k]].tolist()), scores[b, k])
               for k in range(K) if scores[b, k] > NEG_INF / 2]
        assert len(got) == len(want)
        for (gseq, gsc), (wseq, wsc) in zip(got, want):
            assert gseq == wseq, (b, got, want)
            np.testing.assert_allclose(gsc, wsc, rtol=1e-4, atol=1e-4)


def test_zero_weight_identity_and_streaming():
    from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    lm = train_ngram([[1, 2], [3, 4, 5]], order=2,
                     vocab_size=cfg.vocab_size)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 8, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([8, 5], np.int32))
    t0, l0, s0 = recognize_beam(params, cfg, feats, feat_lens, beam=3,
                                max_symbols=8, expansions=2)
    t1, l1, s1 = recognize_beam(params, cfg, feats, feat_lens, beam=3,
                                max_symbols=8, expansions=2,
                                ngram=(lm, 0.0))
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)
    # chunked == offline with fusion on
    t2, l2, s2 = recognize_beam(params, cfg, feats, feat_lens, beam=3,
                                max_symbols=8, expansions=2,
                                ngram=(lm, 0.5))
    t3, l3, s3 = stream_transcribe_beam(params, cfg, feats, feat_lens,
                                        chunk_frames=2, beam=3,
                                        max_symbols=8, expansions=2,
                                        ngram=(lm, 0.5))
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(t3))
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s3), rtol=1e-5,
                               atol=1e-5)


def test_ngram_fusion_improves_wer():
    """The grammar task of test_lm_improves_wer, with the count-based LM:
    the AM cannot disambiguate tokens 1/2; a bigram trained on the
    grammar (3->1, 4->2) must strictly cut WER."""
    from rnn_transducer_tpu.decode.metrics import error_rate, tokens_to_lists
    from rnn_transducer_tpu.train.loop import init_train_state, make_train_step
    from rnn_transducer_tpu.models.config import TrainConfig
    from tests.test_lm_improves_wer import (CFG, _am_batch, _grammar_labels,
                                            _paint, FPL)

    rng = np.random.default_rng(0)
    tcfg = TrainConfig(batch_size=16, warmup_steps=20, total_steps=400,
                       learning_rate=3e-3, loss_impl="xla")
    state = init_train_state(jax.random.PRNGKey(0), CFG, tcfg)
    step = make_train_step(CFG, tcfg)
    for _ in range(350):
        f, fl, lab, ll = _am_batch(rng, 16)
        state, info = step(state, jnp.asarray(f), jnp.asarray(fl),
                           jnp.asarray(lab), jnp.asarray(ll))
    assert float(info["loss"]) < 3.0

    lm = train_ngram([_grammar_labels(rng, 1)[0].tolist()
                      for _ in range(200)], order=2,
                     vocab_size=CFG.vocab_size)

    labels = _grammar_labels(rng, 32)
    feats = _paint(labels, rng)
    fl = jnp.full((32,), labels.shape[1] * FPL, jnp.int32)

    def wer(ngram):
        toks, lens, _ = recognize_beam(state.params, CFG,
                                       jnp.asarray(feats), fl, beam=4,
                                       max_symbols=10, expansions=2,
                                       ngram=ngram)
        hyps = tokens_to_lists(np.asarray(toks[:, 0]),
                               np.asarray(lens[:, 0]))
        refs = [r.tolist() for r in labels]
        return error_rate(refs, hyps)

    plain = wer(None)
    fused = wer((lm, 0.8))
    assert plain > 0.05, f"task not ambiguous enough (plain WER {plain})"
    assert fused < plain, (plain, fused)
    assert fused <= 0.02, (plain, fused)


def test_trainer_cli(tmp_path, capsys):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import train_ngram as tool
    man = tmp_path / "manifest.jsonl"
    man.write_text("".join(json.dumps({"labels": s}) + "\n"
                           for s in ([1, 2, 3], [2, 3], [])))
    out = str(tmp_path / "lm2")
    tool.main(["--manifest", str(man), "--vocab-size", "6",
               "--order", "2", "--out", out])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["sequences"] == 2
    lm = load_ngram(out)
    assert lm.lp.shape == (info["states"], 6)


def test_serving_engines_with_ngram_match_direct():
    from rnn_transducer_tpu.serve import BatchingEngine, StreamingEngine
    cfg = _cfg(vocab=8)
    import dataclasses
    cfg = dataclasses.replace(cfg, input_dim=8, enc_hidden=32,
                              pred_hidden=32, joint_dim=32, embed_dim=16)
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    lm = train_ngram([[1, 2, 3], [4, 5]], order=2, vocab_size=8)
    ngram = (lm, 0.6)
    rng = np.random.default_rng(3)
    a = rng.normal(size=(16, cfg.input_dim)).astype(np.float32)
    toks, lens, scores = recognize_beam(
        params, cfg, jnp.asarray(a[None]), jnp.asarray([16], jnp.int32),
        beam=3, max_symbols=8, expansions=2, ngram=ngram)
    want = np.asarray(toks)[0, 0, : int(lens[0, 0])].tolist()

    eng = BatchingEngine(params, cfg, mode="beam", beam=3, expansions=2,
                         max_symbols=8, frame_buckets=(16,), max_batch=2,
                         window_ms=1.0, ngram=ngram)
    try:
        assert eng.submit(a) == want
    finally:
        eng.close()

    seng = StreamingEngine(params, cfg, slots=2, chunk_frames=8,
                           max_symbols=8, window_ms=10.0, mode="beam",
                           beam=3, expansions=2, ngram=ngram)
    try:
        sid = seng.open_session()
        for t0 in range(0, 16, 8):
            seng.feed(sid, a[t0: t0 + 8])
        assert seng.close_session(sid) == want
    finally:
        seng.close()

    import pytest
    with pytest.raises(ValueError):
        BatchingEngine(params, cfg, mode="greedy", ngram=ngram)
