"""CTC decoding: greedy collapse vs a numpy loop; prefix beam search vs a
brute-force path-enumeration oracle (exact when unpruned) and a literal
host dict-based prefix beam (pruned behavior)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.ctc import (ctc_greedy_decode,
                                           ctc_prefix_beam_search,
                                           recognize_ctc)

BLANK = 0


def _log_probs(rng, B, T, V, scale=1.5):
    x = rng.normal(size=(B, T, V)) * scale
    x = x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))
    return x.astype(np.float32)


# ------------------------------ greedy -----------------------------------

def _host_greedy(logits, fl, blank):
    """Literal best-path decode: argmax, collapse repeats, drop blanks."""
    out, confs, frames = [], [], []
    lp = logits - np.log(np.sum(np.exp(logits), -1, keepdims=True))
    prev = blank
    for t in range(fl):
        k = int(np.argmax(logits[t]))
        if k != blank and k != prev:
            out.append(k)
            confs.append(float(lp[t, k]))
            frames.append(t)
        prev = k
    return out, confs, frames


def test_greedy_matches_host_loop():
    rng = np.random.default_rng(0)
    B, T, V = 6, 40, 12
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    # encourage repeats so the collapse actually triggers
    logits[:, :, 3] += 1.0
    fl = np.array([40, 37, 1, 0, 40, 23], np.int32)
    toks, lens, confs, frames = jax.jit(
        lambda x, l: ctc_greedy_decode(x, l, blank=BLANK, max_symbols=32)
    )(jnp.asarray(logits), jnp.asarray(fl))
    toks, lens = np.asarray(toks), np.asarray(lens)
    confs, frames = np.asarray(confs), np.asarray(frames)
    for b in range(B):
        ref, ref_c, ref_f = _host_greedy(logits[b], int(fl[b]), BLANK)
        ref, ref_c, ref_f = ref[:32], ref_c[:32], ref_f[:32]
        assert lens[b] == len(ref)
        assert list(toks[b, : lens[b]]) == ref
        np.testing.assert_allclose(confs[b, : lens[b]], ref_c, rtol=1e-5)
        assert list(frames[b, : lens[b]]) == ref_f
        assert np.all(toks[b, lens[b]:] == BLANK)
        assert np.all(confs[b, lens[b]:] == 0.0)


def test_greedy_max_symbols_truncates():
    rng = np.random.default_rng(1)
    B, T, V = 2, 30, 8
    # alternate non-blank symbols -> ~T kept tokens, far over the cap
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 0.1
    for t in range(T):
        logits[:, t, 1 + t % 2] += 10.0
    fl = np.full((B,), T, np.int32)
    toks, lens, _, _ = ctc_greedy_decode(jnp.asarray(logits),
                                         jnp.asarray(fl), blank=BLANK,
                                         max_symbols=5)
    assert np.all(np.asarray(lens) == 5)
    assert list(np.asarray(toks)[0]) == [1, 2, 1, 2, 1]


# ---------------------------- prefix beam ---------------------------------

def _brute_force_posteriors(lp, fl, blank):
    """Sum path probabilities per collapsed label sequence (exact CTC)."""
    V = lp.shape[1]
    seqs = {(): 0.0}  # collapsed-sequence -> prob
    paths = {((), blank): 1.0}  # (collapsed, last-raw-symbol) -> prob
    for t in range(fl):
        new = {}
        for (seq, last), p in paths.items():
            for v in range(V):
                q = p * math.exp(lp[t, v])
                if v == blank:
                    key = (seq, blank)
                elif v == last:
                    key = (seq, v)
                else:
                    key = (seq + (v,), v)
                new[key] = new.get(key, 0.0) + q
        paths = new
    out = {}
    for (seq, _), p in paths.items():
        out[seq] = out.get(seq, 0.0) + p
    return out


def test_prefix_beam_exact_vs_bruteforce():
    """Unpruned (cand=V-1, beam >= reachable prefixes) device search
    recovers the exact per-sequence posterior of every surviving prefix
    and ranks the true argmax sequence first."""
    rng = np.random.default_rng(2)
    B, T, V = 3, 4, 3
    lp = _log_probs(rng, B, T, V)
    fl = np.array([4, 3, 0], np.int32)
    K = 32  # >= 1 + 2 + 4 + 8 + 16 reachable prefixes at T=4, V=3
    toks, lens, scores = jax.jit(
        lambda x, l: ctc_prefix_beam_search(x, l, beam=K, cand=V - 1,
                                            blank=BLANK, max_symbols=8)
    )(jnp.asarray(lp), jnp.asarray(fl))
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(B):
        post = _brute_force_posteriors(lp[b], int(fl[b]), BLANK)
        best = max(post, key=post.get)
        assert tuple(toks[b, 0, : lens[b, 0]]) == best
        np.testing.assert_allclose(scores[b, 0], math.log(post[best]),
                                   rtol=1e-5, atol=1e-5)
        for k in range(K):
            if scores[b, k] < -1e29:
                continue
            seq = tuple(toks[b, k, : lens[b, k]])
            assert seq in post
            np.testing.assert_allclose(scores[b, k], math.log(post[seq]),
                                       rtol=1e-5, atol=1e-5)
        # distinct surviving prefixes (merge leaves no duplicates)
        live = [tuple(toks[b, k, : lens[b, k]]) for k in range(K)
                if scores[b, k] > -1e29]
        assert len(live) == len(set(live))


def _host_prefix_beam(lp, fl, K, C, blank):
    """Literal dict-based prefix beam with the same pruning rule (top-C
    extension symbols per frame, top-K prefixes kept)."""
    NEG = -1.0e30

    def lae(a, b):
        if a <= NEG / 2:
            return b
        if b <= NEG / 2:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beams = {(): (0.0, NEG)}  # prefix -> (pb, pnb)
    for t in range(fl):
        order = np.argsort(-lp[t])
        cand = [int(v) for v in order if v != blank][:C]
        new = {}

        def add(key, pb, pnb):
            opb, opnb = new.get(key, (NEG, NEG))
            new[key] = (lae(opb, pb), lae(opnb, pnb))

        for seq, (pb, pnb) in beams.items():
            tot = lae(pb, pnb)
            add(seq, tot + lp[t, blank],
                (pnb + lp[t, seq[-1]]) if seq else NEG)
            for v in cand:
                src = pb if (seq and v == seq[-1]) else tot
                add(seq + (v,), NEG, src + lp[t, v])
        pruned = sorted(new.items(), key=lambda kv: -lae(*kv[1]))[:K]
        beams = dict(pruned)
    return {seq: lae(pb, pnb) for seq, (pb, pnb) in beams.items()}


def test_prefix_beam_matches_host_when_pruned():
    rng = np.random.default_rng(3)
    B, T, V, K, C = 4, 10, 8, 4, 3
    lp = _log_probs(rng, B, T, V)
    fl = np.array([10, 7, 10, 2], np.int32)
    toks, lens, scores = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=12)
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(B):
        ref = _host_prefix_beam(lp[b], int(fl[b]), K, C, BLANK)
        ref_sorted = sorted(ref.items(), key=lambda kv: -kv[1])
        for k, (seq, sc) in enumerate(ref_sorted):
            assert tuple(toks[b, k, : lens[b, k]]) == seq, (b, k)
            np.testing.assert_allclose(scores[b, k], sc, rtol=1e-5,
                                       atol=1e-5)


def test_prefix_beam_beats_or_ties_greedy():
    """The beam top-1 sequence's true posterior mass is >= the greedy
    best-path sequence's (the classic case CTC prefix search exists for:
    alignment-summed scores beat single-path scores)."""
    rng = np.random.default_rng(4)
    B, T, V = 8, 5, 4
    lp = _log_probs(rng, B, T, V, scale=1.0)
    fl = np.full((B,), T, np.int32)
    g_toks, g_lens, _, _ = ctc_greedy_decode(jnp.asarray(lp),
                                             jnp.asarray(fl), blank=BLANK,
                                             max_symbols=8)
    # beam >= reachable prefixes (1+3+9+27+81) -> the search is exact and
    # its top-1 is the true posterior argmax
    toks, lens, _ = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=128, cand=V - 1, blank=BLANK,
        max_symbols=8)
    g_toks, g_lens = np.asarray(g_toks), np.asarray(g_lens)
    toks, lens = np.asarray(toks), np.asarray(lens)
    diverged = 0
    for b in range(B):
        post = _brute_force_posteriors(lp[b], T, BLANK)
        beam_seq = tuple(toks[b, 0, : lens[b, 0]])
        greedy_seq = tuple(g_toks[b, : g_lens[b]])
        assert post.get(beam_seq, 0) >= post.get(greedy_seq, 0) - 1e-12
        diverged += beam_seq != greedy_seq
    assert diverged >= 1  # the scale-1.0 posteriors do split the two


def test_recognize_ctc_end_to_end():
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import TransducerConfig

    cfg = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                           pred_hidden=32, embed_dim=16, joint_dim=32,
                           vocab_size=11, input_dim=8, ctc_head=True,
                           compute_dtype="float32")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.normal(size=(3, 20, 8)), jnp.float32)
    fl = jnp.asarray([20, 15, 20], jnp.int32)
    toks, lens, confs, frames = recognize_ctc(
        params, cfg, feats, fl, mode="greedy", max_symbols=16,
        with_confidence=True, with_timestamps=True)
    assert toks.shape == (3, 16) and lens.shape == (3,)
    assert confs.shape == (3, 16) and frames.shape == (3, 16)
    b_toks, b_lens, b_scores = recognize_ctc(
        params, cfg, feats, fl, mode="beam", beam=4, max_symbols=16)
    assert b_toks.shape == (3, 4, 16) and b_scores.shape == (3, 4)
    # beam top-1 score >= the greedy sequence's prefix score: decode the
    # greedy sequence's posterior is <= beam's best by construction
    assert np.all(np.asarray(b_scores)[:, 0] >= np.asarray(b_scores)[:, 1])

    # headless params must be rejected
    import pytest
    cfg2 = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                            pred_hidden=32, embed_dim=16, joint_dim=32,
                            vocab_size=11, input_dim=8,
                            compute_dtype="float32")
    p2 = m.init_params(jax.random.PRNGKey(0), cfg2)
    with pytest.raises(ValueError):
        recognize_ctc(p2, cfg2, feats, fl)


def test_recognize_cli_ctc_modes(tmp_path):
    import recognize
    recognize.main(["--mode", "ctc_greedy", "--data", "synthetic",
                    "--batches", "1", "--batch-size", "2",
                    "--max-symbols", "16"])
    recognize.main(["--mode", "ctc_beam", "--beam", "4", "--data",
                    "synthetic", "--batches", "1", "--batch-size", "2",
                    "--max-symbols", "16"])


def _host_prefix_beam_fused(lp, fl, K, C, blank, lm_lp_fn, w, bonus=0.0):
    """_host_prefix_beam with per-extension LM fusion: extending prefix p
    with c adds w * lm_lp_fn(p)[c] + bonus."""
    NEG = -1.0e30

    def lae(a, b):
        if a <= NEG / 2:
            return b
        if b <= NEG / 2:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beams = {(): (0.0, NEG)}
    for t in range(fl):
        order = np.argsort(-lp[t])
        cand = [int(v) for v in order if v != blank][:C]
        new = {}

        def add(key, pb, pnb):
            opb, opnb = new.get(key, (NEG, NEG))
            new[key] = (lae(opb, pb), lae(opnb, pnb))

        for seq, (pb, pnb) in beams.items():
            tot = lae(pb, pnb)
            add(seq, tot + lp[t, blank],
                (pnb + lp[t, seq[-1]]) if seq else NEG)
            fused = lm_lp_fn(seq)
            for v in cand:
                src = pb if (seq and v == seq[-1]) else tot
                add(seq + (v,), NEG,
                    src + lp[t, v] + w * fused[v] + bonus)
        pruned = sorted(new.items(), key=lambda kv: -lae(*kv[1]))[:K]
        beams = dict(pruned)
    return {seq: lae(pb, pnb) for seq, (pb, pnb) in beams.items()}


def test_prefix_beam_lm_fusion_matches_host():
    """Device CTC beam with LSTM-LM fusion == the host dict beam with the
    same per-extension LM weighting; zero weight == the plain beam."""
    from rnn_transducer_tpu.models.lm import (BOS_ID, LMConfig,
                                              init_lm_params,
                                              init_lm_state, lm_step)

    lm_cfg = LMConfig(vocab_size=8, embed_dim=8, hidden=16, layers=1,
                      compute_dtype="float32")
    lm_params = init_lm_params(jax.random.PRNGKey(7), lm_cfg)
    rng = np.random.default_rng(9)
    B, T, V, K, C = 3, 8, 8, 4, 3
    lp = _log_probs(rng, B, T, V)
    fl = np.array([8, 5, 8], np.int32)
    w = 0.7

    def lm_lp_fn(seq):
        st = init_lm_state(lm_cfg, 1)
        out, st = lm_step(lm_params, lm_cfg,
                          jnp.asarray([BOS_ID], jnp.int32), st)
        for tok in seq:
            out, st = lm_step(lm_params, lm_cfg,
                              jnp.asarray([tok], jnp.int32), st)
        return np.asarray(out[0])

    toks, lens, scores = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10, lm=(lm_params, lm_cfg, w))
    toks, lens, scores = map(np.asarray, (toks, lens, scores))
    for b in range(B):
        ref = _host_prefix_beam_fused(lp[b], int(fl[b]), K, C, BLANK,
                                      lm_lp_fn, w)
        want = sorted(ref.items(), key=lambda kv: -kv[1])
        got = [(tuple(toks[b, k, : lens[b, k]].tolist()), scores[b, k])
               for k in range(K) if scores[b, k] > -1e29]
        assert len(got) == len(want), (b, got, want)
        for (gs, gc), (ws_, wc) in zip(got, want):
            assert gs == ws_, (b, got, want)
            np.testing.assert_allclose(gc, wc, rtol=1e-4, atol=1e-4)
    # zero weight reduces to the plain beam exactly
    t0, l0, s0 = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10)
    t1, l1, s1 = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10, lm=(lm_params, lm_cfg, 0.0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)


def test_prefix_beam_ngram_fusion_and_bonus():
    """n-gram fusion + length bonus run through the device beam (finite,
    sorted); a large positive bonus prefers longer prefixes."""
    from rnn_transducer_tpu.models.ngram import train_ngram

    rng = np.random.default_rng(11)
    B, T, V, K, C = 2, 8, 8, 4, 3
    lp = _log_probs(rng, B, T, V)
    fl = np.array([8, 6], np.int32)
    seqs = [[1, 2, 3], [1, 2, 4], [2, 3, 1]] * 5
    ng = train_ngram(seqs, 2, V)
    toks, lens, scores = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10, ngram=(ng, 0.5))
    assert np.all(np.isfinite(np.asarray(scores)[:, 0]))
    _, l_plain, _ = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10)
    _, l_bonus, _ = ctc_prefix_beam_search(
        jnp.asarray(lp), jnp.asarray(fl), beam=K, cand=C, blank=BLANK,
        max_symbols=10, length_bonus=3.0)
    assert (np.asarray(l_bonus)[:, 0] >= np.asarray(l_plain)[:, 0]).all()
    assert (np.asarray(l_bonus)[:, 0] > np.asarray(l_plain)[:, 0]).any()
