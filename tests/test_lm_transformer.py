"""Transformer LM (models/lm_transformer.py): step≡batch exactness
through the KV cache, causality, training, dispatch through the shared
models/lm.py API, and shallow fusion through beam search + streaming."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models.lm import (BOS_ID, init_lm_params,
                                          init_lm_state, lm_forward,
                                          lm_loss, lm_sequence_logprob,
                                          lm_step, load_lm, rescore_nbest)
from rnn_transducer_tpu.models.lm_transformer import TransformerLMConfig


def _cfg(**kw):
    base = dict(vocab_size=10, d_model=32, heads=4, layers=2, ff_mult=2,
                max_len=16, compute_dtype="float32")
    base.update(kw)
    return TransformerLMConfig(**base)


def test_step_matches_forward():
    """Stepping token-by-token through the KV cache reproduces the full
    causal-attention pass position by position."""
    cfg = _cfg()
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, U = 3, 7
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)
    want = jax.nn.log_softmax(lm_forward(params, cfg, labels), axis=-1)
    state = init_lm_state(cfg, B)
    tok = jnp.full((B,), BOS_ID, jnp.int32)
    for u in range(U):
        lp, state = lm_step(params, cfg, tok, state)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(want[:, u]),
                                   rtol=1e-5, atol=1e-5)
        tok = labels[:, u]


def test_bf16_cache_step_close_to_forward():
    """cache_dtype="bfloat16" (the fusion-cost mitigation: halves the
    per-round KV gather/rewrite HBM traffic in beam fusion) stays within
    bf16 storage rounding of the full-precision pass."""
    cfg = _cfg(cache_dtype="bfloat16")
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, U = 3, 7
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)
    want = jax.nn.log_softmax(lm_forward(params, cfg, labels), axis=-1)
    state = init_lm_state(cfg, B)
    assert state["kv"][0]["k"].dtype == jnp.bfloat16
    tok = jnp.full((B,), BOS_ID, jnp.int32)
    for u in range(U):
        lp, state = lm_step(params, cfg, tok, state)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(want[:, u]),
                                   rtol=0.05, atol=0.05)
        tok = labels[:, u]


def test_causality():
    """Changing token u must not change next-token predictions at
    positions <= u."""
    cfg = _cfg()
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 8)), jnp.int32)
    base = np.asarray(lm_forward(params, cfg, labels))
    mod = labels.at[0, 5].set((int(labels[0, 5]) % (cfg.vocab_size - 1)) + 1)
    out = np.asarray(lm_forward(params, cfg, mod))
    # positions 0..5 predict from prefixes ending at inputs 0..4 — all
    # unchanged; position 6+ sees the edit
    np.testing.assert_array_equal(out[0, :6], base[0, :6])
    assert np.max(np.abs(out[0, 6:] - base[0, 6:])) > 0


def test_trains_on_patterns():
    cfg = _cfg(max_len=24)
    params = init_lm_params(jax.random.PRNGKey(2), cfg)
    import optax
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(2)
    pats = [rng.integers(1, cfg.vocab_size, size=6).tolist()
            for _ in range(4)]

    @jax.jit
    def step(params, opt_state, labels, lens):
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(p, cfg, labels, lens))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(120):
        batch = [pats[rng.integers(4)] * 2 for _ in range(16)]
        labels = jnp.asarray(batch, jnp.int32)
        lens = jnp.full((16,), 12, jnp.int32)
        params, opt_state, loss = step(params, opt_state, labels, lens)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_sequence_logprob_and_rescore_dispatch():
    cfg = _cfg()
    params = init_lm_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 3, 5)),
                         jnp.int32)
    lens = jnp.asarray([[5, 3, 0], [4, 4, 2]], jnp.int32)
    am = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    lp = lm_sequence_logprob(params, cfg, tokens.reshape(6, 5),
                             lens.reshape(6))
    assert np.all(np.asarray(lp) <= 1e-5)
    # zero-length sequence scores exactly 0
    assert float(lp[2]) == 0.0
    _, _, scores = rescore_nbest(params, cfg, tokens, lens, am, weight=0.5)
    assert np.all(np.diff(np.asarray(scores), axis=-1) <= 1e-6)


def test_beam_fusion_and_streaming_with_transformer_lm():
    """Transformer-LM shallow fusion through the device beam search:
    lambda=0 equals the plain search exactly, nonzero lambda changes
    scores, and chunked streaming equals offline (the KV cache + position
    ride the beam carry across chunks)."""
    from rnn_transducer_tpu.decode.beam import beam_search
    from rnn_transducer_tpu.decode.streaming import stream_transcribe_beam
    from rnn_transducer_tpu.models import transducer as tm
    from rnn_transducer_tpu.models.config import TransducerConfig

    acfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                            pred_hidden=16, embed_dim=8, joint_dim=16,
                            vocab_size=10, input_dim=4,
                            compute_dtype="float32")
    aparams = tm.init_params(jax.random.PRNGKey(4), acfg)
    cfg = _cfg()
    params = init_lm_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    B, T = 2, 6
    feats = jnp.asarray(rng.normal(size=(B, T, 4)), jnp.float32)
    feat_lens = jnp.asarray([6, 4], jnp.int32)
    enc_out, enc_lens = tm.encode(aparams, acfg, feats, feat_lens)
    t0, l0, s0, _ = beam_search(aparams, acfg, enc_out, enc_lens, beam=4,
                                max_symbols=8, expansions=2)
    tz, lz, sz, _ = beam_search(aparams, acfg, enc_out, enc_lens, beam=4,
                                max_symbols=8, expansions=2,
                                lm=(params, cfg, 0.0))
    np.testing.assert_allclose(np.asarray(sz), np.asarray(s0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tz), np.asarray(t0))
    tf_, lf, sf, _ = beam_search(aparams, acfg, enc_out, enc_lens, beam=4,
                                 max_symbols=8, expansions=2,
                                 lm=(params, cfg, 0.5))
    assert np.max(np.abs(np.asarray(sf) - np.asarray(s0))) > 1e-6
    ts, ls, ss = stream_transcribe_beam(aparams, acfg, feats, feat_lens,
                                        chunk_frames=2, beam=4,
                                        max_symbols=8, expansions=2,
                                        lm=(params, cfg, 0.5))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sf), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ts), np.asarray(tf_))


def test_train_lm_cli_transformer_roundtrip(tmp_path, capsys):
    import tools.train_lm as train_lm

    out = str(tmp_path / "tlm")
    train_lm.main(["--out-dir", out, "--vocab-size", "12", "--arch",
                   "transformer", "--embed-dim", "32", "--heads", "4",
                   "--layers", "1", "--max-len", "32", "--steps", "30",
                   "--batch-size", "8", "--max-labels", "24",
                   "--log-every", "10"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_nll"])
    params, cfg = load_lm(out)
    assert isinstance(cfg, TransformerLMConfig)
    lp, _ = lm_step(params, cfg, jnp.asarray([BOS_ID], jnp.int32),
                    init_lm_state(cfg, 1))
    assert lp.shape == (1, 12)
