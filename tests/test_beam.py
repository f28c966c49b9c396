"""Beam search: batched on-device implementation vs a literal host-side
sequential implementation of the same merged frame-synchronous search."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.beam import beam_search, recognize_beam
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig

NEG_INF = -1.0e30


def _cfg(vocab=8):
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=vocab, input_dim=4,
                            compute_dtype="float32")


def _host_beam(params, cfg, enc_out, enc_len, beam, expansions, max_symbols):
    """Sequential reference: live set is a LIST (duplicates kept, as in the
    batched version); pool merges identical prefixes via logaddexp."""
    V = cfg.vocab_size
    pred_cache = {}

    def pred_out_for(seq):
        if seq in pred_cache:
            return pred_cache[seq]
        out, state = m.predict_step(params, cfg,
                                    jnp.asarray([cfg.blank], jnp.int32),
                                    m.init_pred_state(cfg, 1))
        for tok in seq:
            out, state = m.predict_step(params, cfg,
                                        jnp.asarray([tok], jnp.int32), state)
        pred_cache[seq] = out
        return out

    def lp_for(t, seq):
        logits = m.joint_step(params, cfg, enc_out[None, t], pred_out_for(seq))
        return np.asarray(jax.nn.log_softmax(logits[0]))

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
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v], seq + (v,)))
            cands.sort(key=lambda x: -x[0])
            live = [(seq, sc) for sc, seq in cands[:beam]]
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, sc) for seq, sc in merged]
    return beams


def test_device_beam_matches_host_reference():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 3, 5
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([5, 3, 4], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    K, E, U = 4, 2, 8
    tokens, lens, scores, _ = jax.jit(
        lambda e, el: beam_search(params, cfg, e, el, beam=K, max_symbols=U,
                                  expansions=E))(enc_out, enc_lens)
    tokens, lens, scores = map(np.asarray, (tokens, lens, scores))
    for b in range(B):
        want = _host_beam(params, cfg, enc_out[b], int(enc_lens[b]),
                          beam=K, expansions=E, max_symbols=U)
        got = [
            (tuple(tokens[b, k, : lens[b, k]].tolist()), scores[b, k])
            for k in range(K) if scores[b, k] > NEG_INF / 2
        ]
        assert len(got) == len(want), (got, want)
        for (gseq, gsc), (wseq, wsc) in zip(got, want):
            assert gseq == wseq, (b, got, want)
            np.testing.assert_allclose(gsc, wsc, rtol=1e-4, atol=1e-4)


def test_wider_beam_never_hurts_top_score():
    cfg = _cfg(vocab=12)
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 7, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([7, 6], np.int32))
    _, _, s1 = recognize_beam(params, cfg, feats, feat_lens, beam=1,
                              max_symbols=10, expansions=2)
    _, _, s8 = recognize_beam(params, cfg, feats, feat_lens, beam=8,
                              max_symbols=10, expansions=2)
    assert np.all(np.asarray(s8[:, 0]) >= np.asarray(s1[:, 0]) - 1e-5)


def test_beam_scores_sorted_and_finite_top1():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 6, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6, 4], np.int32))
    _, _, scores = recognize_beam(params, cfg, feats, feat_lens, beam=4,
                                  max_symbols=8, expansions=2)
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=-1) <= 1e-6)  # descending
    assert np.all(s[:, 0] > NEG_INF / 2)
    assert np.all(s[:, 0] <= 1e-5)  # log-probs


def test_prefix_merge_accumulates_paths():
    """Top-1 merged score must exceed any single alignment's path score."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(1, 4, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([4], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, scores, _ = beam_search(params, cfg, enc_out, enc_lens,
                                          beam=8, max_symbols=6,
                                          expansions=3)
    b0 = np.asarray(scores)[0, 0]
    # exact total log-prob of the winning prefix via the RNN-T loss oracle
    from rnn_transducer_tpu.ops.rnnt_oracle import rnnt_loss_oracle
    seq = np.asarray(tokens)[0, 0, : int(lens[0, 0])]
    if len(seq) > 0:
        pred_out, _ = m.predict(params, cfg, jnp.asarray(seq[None], jnp.int32))
        logits = m.joint(params, cfg, enc_out, pred_out)
        want = -rnnt_loss_oracle(np.asarray(logits), seq[None],
                                 np.asarray(enc_lens), np.array([len(seq)]))[0]
        # beam top-1 merged score is a lower bound on (and here close to)
        # the exact marginal
        assert b0 <= want + 1e-4
        assert b0 >= want - 2.0


def _host_beam_with_conf(params, cfg, enc_out, enc_len, beam, expansions,
                         max_symbols):
    """_host_beam extended with per-token confidence tracking: each live
    hypothesis carries its emission log-probs; the pool keeps the FIRST
    deposit's confidence per prefix (mirroring the device merge's
    lowest-pool-index canonical representative)."""
    V = cfg.vocab_size
    pred_cache = {}

    def pred_out_for(seq):
        if seq in pred_cache:
            return pred_cache[seq]
        out, state = m.predict_step(params, cfg,
                                    jnp.asarray([cfg.blank], jnp.int32),
                                    m.init_pred_state(cfg, 1))
        for tok in seq:
            out, state = m.predict_step(params, cfg,
                                        jnp.asarray([tok], jnp.int32), state)
        pred_cache[seq] = out
        return out

    def lp_for(t, seq):
        logits = m.joint_step(params, cfg, enc_out[None, t],
                              pred_out_for(seq))
        return np.asarray(jax.nn.log_softmax(logits[0]))

    beams = [((), 0.0, ())]  # (seq, score, confs)
    for t in range(enc_len):
        pool, conf_of = {}, {}
        live = list(beams)
        for e in range(expansions + 1):
            for seq, sc, confs in live:
                lp = lp_for(t, seq)
                pool[seq] = np.logaddexp(pool.get(seq, -np.inf),
                                         sc + lp[cfg.blank])
                if seq not in conf_of:  # first deposit wins
                    conf_of[seq] = confs
            if e == expansions:
                break
            cands = []
            for seq, sc, confs in live:
                if len(seq) >= max_symbols:
                    continue
                lp = lp_for(t, seq)
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v], seq + (v,),
                                      confs + (lp[v],)))
            cands.sort(key=lambda x: -x[0])
            live = [(seq, sc, confs) for sc, seq, confs in cands[:beam]]
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, sc, conf_of[seq]) for seq, sc in merged]
    return beams


def test_beam_confidence_matches_host_replay():
    """Device per-token beam confidence == the host reference's emission
    log-probs along the canonical (first-deposited) merged path."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    B, T = 2, 5
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([5, 4], np.int32))
    K, E, U = 4, 2, 8
    tokens, lens, scores, confs = jax.jit(
        lambda f, l: recognize_beam(params, cfg, f, l, beam=K,
                                    max_symbols=U, expansions=E,
                                    with_confidence=True))(feats, feat_lens)
    tokens, lens, scores, confs = map(
        np.asarray, (tokens, lens, scores, confs))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    for b in range(B):
        want = _host_beam_with_conf(params, cfg, enc_out[b],
                                    int(enc_lens[b]), beam=K, expansions=E,
                                    max_symbols=U)
        for k, (wseq, wsc, wconf) in enumerate(want):
            if scores[b, k] <= NEG_INF / 2:
                continue
            gseq = tuple(tokens[b, k, : lens[b, k]].tolist())
            assert gseq == wseq, (b, k, gseq, wseq)
            np.testing.assert_allclose(confs[b, k, : lens[b, k]],
                                       np.asarray(wconf), rtol=1e-4,
                                       atol=1e-4)
    # confidences are log-probs; padding stays zero
    for b in range(B):
        assert np.all(confs[b, 0, : lens[b, 0]] <= 1e-5)
        assert np.all(confs[b, 0, lens[b, 0]:] == 0.0)
