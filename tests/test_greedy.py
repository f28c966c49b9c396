"""Greedy decode: on-device while_loop vs a literal host-side Python loop."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.greedy import greedy_decode, recognize_greedy
from rnn_transducer_tpu.decode.metrics import edit_distance, error_rate
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig


def _cfg():
    return TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                            pred_hidden=32, embed_dim=16, joint_dim=32,
                            vocab_size=11, input_dim=8,
                            compute_dtype="float32")


def _host_greedy(params, cfg, enc_out, enc_len, max_symbols):
    """Literal single-utterance greedy loop (the reference's algorithm)."""
    state = m.init_pred_state(cfg, 1)
    pred_out, state = m.predict_step(
        params, cfg, jnp.full((1,), cfg.blank, jnp.int32), state)
    t, tokens = 0, []
    while t < enc_len and len(tokens) < max_symbols:
        logits = m.joint_step(params, cfg, enc_out[None, t], pred_out)
        k = int(jnp.argmax(logits[0]))
        if k == cfg.blank:
            t += 1
        else:
            tokens.append(k)
            pred_out, state = m.predict_step(
                params, cfg, jnp.asarray([k], jnp.int32), state)
    return tokens


def test_device_greedy_matches_host_loop():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 4, 15
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([15, 11, 7, 15], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, _ = jax.jit(
        lambda e, el: greedy_decode(params, cfg, e, el, max_symbols=20)
    )(enc_out, enc_lens)
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    for b in range(B):
        want = _host_greedy(params, cfg, enc_out[b], int(enc_lens[b]), 20)
        got = tokens[b, : lens[b]].tolist()
        assert got == want, f"utt {b}: {got} != {want}"


def test_recognize_greedy_smoke():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(2, 12, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 9], np.int32))
    tokens, lens = recognize_greedy(params, cfg, feats, feat_lens,
                                    max_symbols=16)
    assert tokens.shape == (2, 16)
    assert np.all(np.asarray(lens) <= 16)


def test_edit_distance_and_wer():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([5, 6, 7, 8], [5, 9, 7]) == 2
    # corpus WER
    refs = [[1, 2, 3], [4, 5]]
    hyps = [[1, 2, 3], [4, 6]]
    assert abs(error_rate(refs, hyps) - 1 / 5) < 1e-9


def test_max_symbols_cap_terminates():
    """A model biased against blank must still terminate at the cap."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    # Bias the output layer strongly against blank.
    params["joint"]["out"]["b"] = params["joint"]["out"]["b"].at[cfg.blank].add(-50.0)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(1, 10, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([10], np.int32))
    tokens, lens = recognize_greedy(params, cfg, feats, feat_lens,
                                    max_symbols=8)
    assert int(lens[0]) == 8


def test_confidences_match_host_replay():
    """Per-token emission log-probs from the device loop == a host replay
    of the same greedy trajectory."""
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    B, T = 3, 12
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 9, 12], np.int32))
    toks, lens, confs = recognize_greedy(params, cfg, feats, feat_lens,
                                         max_symbols=10,
                                         with_confidence=True)
    toks, lens, confs = (np.asarray(toks), np.asarray(lens),
                         np.asarray(confs))
    assert (confs[np.arange(B)[:, None],
                  np.arange(confs.shape[1])[None, :]]
            <= 1e-6).all()  # log-probs
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
                lp = logits[0] - np.log(np.sum(np.exp(
                    logits[0] - logits[0].max()))) - logits[0].max()
                got.append((k, lp[k]))
                pred_out, state = m.predict_step(
                    params, cfg, jnp.asarray([k], jnp.int32), state)
        assert len(got) == int(lens[b])
        for i, (k, lp) in enumerate(got):
            assert toks[b, i] == k
            np.testing.assert_allclose(confs[b, i], lp, atol=1e-5)
        assert (confs[b, int(lens[b]):] == 0.0).all()
