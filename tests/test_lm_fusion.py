"""LSTM LM + shallow fusion: step/batch parity, training, exactness of the
fused device beam vs a literal host-side fused reference, streaming carry,
and the recognize.py CLI path."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.decode.beam import beam_search
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig
from rnn_transducer_tpu.models.lm import (
    LMConfig,
    init_lm_params,
    init_lm_state,
    lm_forward,
    lm_loss,
    lm_step,
)

V = 8


def _cfg():
    return TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=V, input_dim=4,
                            compute_dtype="float32")


def _lm():
    cfg = LMConfig(vocab_size=V, embed_dim=8, hidden=16, layers=2,
                   compute_dtype="float32")
    return init_lm_params(jax.random.PRNGKey(7), cfg), cfg


def test_lm_step_matches_batch_forward():
    lmp, lmc = _lm()
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(1, V, size=(3, 6)), jnp.int32)
    batch_logits = lm_forward(lmp, lmc, labels)  # (B, U, V)
    batch_lp = jax.nn.log_softmax(batch_logits, axis=-1)

    state = init_lm_state(lmc, 3)
    tok = jnp.zeros((3,), jnp.int32)  # BOS = blank id
    for u in range(labels.shape[1]):
        lp, state = lm_step(lmp, lmc, tok, state)
        np.testing.assert_allclose(np.asarray(lp),
                                   np.asarray(batch_lp[:, u]), atol=1e-5)
        tok = labels[:, u]


def test_lm_trains_on_patterns():
    import optax

    lmp, lmc = _lm()
    rng = np.random.default_rng(1)
    pat = rng.integers(1, V, size=8).tolist()
    labels = jnp.asarray([pat * 2] * 4, jnp.int32)
    lens = jnp.full((4,), labels.shape[1], jnp.int32)
    opt = optax.adam(5e-3)
    opt_state = opt.init(lmp)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: lm_loss(q, lmc, labels,
                                                       lens))(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, loss

    first = None
    for _ in range(60):
        lmp, opt_state, loss = step(lmp, opt_state)
        first = float(loss) if first is None else first
    assert float(loss) < first * 0.5


def _host_beam_lm(params, cfg, lmp, lmc, lm_w, enc_out, enc_len, beam,
                  expansions, max_symbols):
    """Sequential fused reference (cf. tests/test_beam.py _host_beam):
    label extensions add lm_w * log P_lm(label | prefix)."""
    pred_cache, lm_cache = {}, {}

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

    def lm_lp_for(seq):
        if seq not in lm_cache:
            lp, state = lm_step(lmp, lmc, jnp.asarray([0], jnp.int32),
                                init_lm_state(lmc, 1))
            for tok in seq:
                lp, state = lm_step(lmp, lmc,
                                    jnp.asarray([tok], jnp.int32), state)
            lm_cache[seq] = np.asarray(lp[0])
        return lm_cache[seq]

    def lp_for(t, seq):
        logits = m.joint_step(params, cfg, enc_out[None, t],
                              pred_out_for(seq))
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
                lm_lp = lm_lp_for(seq)
                for v in range(V):
                    if v != cfg.blank:
                        cands.append((sc + lp[v] + lm_w * lm_lp[v],
                                      seq + (v,)))
            cands.sort(key=lambda x: -x[0])
            live = [(seq, sc) for sc, seq in cands[:beam]]
        merged = sorted(pool.items(), key=lambda kv: -kv[1])[:beam]
        beams = [(seq, sc) for seq, sc in merged]
    return beams


def test_fused_device_beam_matches_host_reference():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    lmp, lmc = _lm()
    rng = np.random.default_rng(0)
    B, T, K, E, U, W = 2, 4, 3, 2, 6, 0.4
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([4, 3], np.int32))
    enc_out, enc_lens = m.encode(params, cfg, feats, feat_lens)
    tokens, lens, scores, _ = jax.jit(
        lambda e, el, lq: beam_search(params, cfg, e, el, beam=K,
                                      max_symbols=U, expansions=E,
                                      lm=(lq, lmc, W)))(enc_out, enc_lens,
                                                        lmp)
    for b in range(B):
        host = _host_beam_lm(params, cfg, lmp, lmc, W,
                             enc_out[b], int(enc_lens[b]), K, E, U)
        for k, (seq, sc) in enumerate(host):
            got = tuple(np.asarray(tokens[b, k, : int(lens[b, k])]).tolist())
            assert got == seq, (b, k, got, seq)
            np.testing.assert_allclose(float(scores[b, k]), sc, atol=1e-4)


def test_zero_weight_fusion_identical_to_plain():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    lmp, lmc = _lm()
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(3, 5, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray([5, 4, 3], jnp.int32)
    enc, el = m.encode(params, cfg, feats, fl)
    t0, l0, s0, _ = beam_search(params, cfg, enc, el, beam=4, max_symbols=6,
                                expansions=2)
    t1, l1, s1, _ = beam_search(params, cfg, enc, el, beam=4, max_symbols=6,
                                expansions=2, lm=(lmp, lmc, 0.0))
    assert np.array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)


def test_streaming_fused_beam_matches_offline():
    from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam

    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    lmp, lmc = _lm()
    rng = np.random.default_rng(3)
    B, T = 2, 8
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    fl = jnp.asarray([8, 6], jnp.int32)
    lm = (lmp, lmc, 0.5)
    enc, el = m.encode(params, cfg, feats, fl)
    t_off, l_off, s_off, _ = beam_search(params, cfg, enc, el, beam=3,
                                         max_symbols=6, expansions=2, lm=lm)
    t_st, l_st, s_st = stream_transcribe_beam(
        params, cfg, feats, fl, chunk_frames=4, beam=3, max_symbols=6,
        expansions=2, lm=lm)
    assert np.array_equal(np.asarray(t_off), np.asarray(t_st))
    np.testing.assert_allclose(np.asarray(s_off), np.asarray(s_st),
                               atol=1e-5)


def test_train_lm_cli_and_recognize_fusion(tmp_path, capsys):
    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "tools"))
    import train_lm

    import recognize
    import train

    lm_dir = str(tmp_path / "lm")
    train_lm.main(["--out-dir", lm_dir, "--vocab-size", "32",
                   "--embed-dim", "8", "--hidden", "16", "--layers", "1",
                   "--steps", "3", "--batch-size", "4", "--max-labels", "16",
                   "--log-every", "1"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_nll"])

    ck = str(tmp_path / "am")
    train.main(["--config", "smoke", "--ckpt-dir", ck, "--steps", "1",
                "--max-frames", "32", "--max-labels", "4",
                "--batch-size", "2", "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    recognize.main(["--mode", "beam", "--ckpt-dir", ck, "--beam", "2",
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "4", "--lm-ckpt", lm_dir,
                    "--lm-weight", "0.3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "beam" and np.isfinite(out["wer"])
