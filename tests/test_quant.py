"""int8 weight quantization (ops/quant.py): elementwise error bound,
tree-walk selection rules, quantized decode through every path (greedy /
beam / streaming / serving engine / conformer), transcription parity on
a trained model, and the CLI flag."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.ops.quant import (QTensor, dequantize_tensor,
                                          maybe_dequant_tree,
                                          quantize_params, quantize_tensor,
                                          quantized_bytes)


def _cfg(**kw):
    base = dict(enc_layers=2, enc_hidden=16, pred_layers=1, pred_hidden=16,
                embed_dim=8, joint_dim=16, vocab_size=8, input_dim=4,
                compute_dtype="float32")
    base.update(kw)
    return TransducerConfig(**base)


def test_quantize_tensor_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(scale=0.3, size=(64, 48)), jnp.float32)
    qt = quantize_tensor(w, channel_axis=-1)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (1, 48)
    deq = dequantize_tensor(qt)
    # symmetric rounding: |w - q*s| <= s/2 elementwise, per channel
    err = np.abs(np.asarray(w) - np.asarray(deq))
    bound = np.asarray(qt.scale)[0] / 2 + 1e-8
    assert np.all(err <= bound[None, :])
    # scales recover each channel's max magnitude
    np.testing.assert_allclose(np.asarray(qt.scale)[0] * 127.0,
                               np.max(np.abs(np.asarray(w)), axis=0),
                               rtol=1e-6)
    # zero channel does not divide by zero
    w0 = w.at[:, 3].set(0.0)
    qt0 = quantize_tensor(w0, channel_axis=-1)
    assert np.all(np.asarray(qt0.q)[:, 3] == 0)
    assert np.isfinite(np.asarray(qt0.scale)).all()


def test_quantize_params_selection_and_bytes():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_params(params)
    # every 2-D leaf quantized, 1-D biases untouched
    assert isinstance(qp["embed"], QTensor)
    assert qp["embed"].scale.shape == (cfg.vocab_size, 1)  # per-row
    assert isinstance(qp["encoder"][0]["w_hh"], QTensor)
    assert qp["encoder"][0]["w_hh"].scale.shape == (1, 4 * cfg.enc_hidden)
    assert qp["encoder"][0]["b"].dtype == jnp.float32
    assert isinstance(qp["joint"]["out"]["w"], QTensor)
    qb, fb = quantized_bytes(qp)
    # tiny test model: biases+scales are a big share; real configs ~4x
    assert qb < 0.4 * fb
    big = quantize_params(m.init_params(
        jax.random.PRNGKey(1), _cfg(enc_hidden=128, pred_hidden=128,
                                    joint_dim=128, embed_dim=64,
                                    vocab_size=64, input_dim=32)))
    qb, fb = quantized_bytes(big)
    assert qb < 0.28 * fb  # production shapes approach the full 4x
    # dequant restores the tree structure; identity on plain trees
    deq = maybe_dequant_tree(qp)
    assert jax.tree.structure(deq) == jax.tree.structure(params)
    assert maybe_dequant_tree(params) is params


def test_quantized_logits_close_and_all_decode_paths_run():
    cfg = _cfg()
    params = m.init_params(jax.random.PRNGKey(1), cfg)
    qp = quantize_params(params)
    rng = np.random.default_rng(1)
    B, T, U = 2, 6, 3
    feats = jnp.asarray(rng.normal(size=(B, T, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([6, 4], np.int32))
    labels = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)

    logits, _ = m.forward(params, cfg, feats, feat_lens, labels)
    logits_q, _ = m.forward(qp, cfg, feats, feat_lens, labels)
    # int8 per-channel keeps small-model logits within a tight band
    np.testing.assert_allclose(np.asarray(logits_q), np.asarray(logits),
                               atol=0.15)

    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.decode.streaming import stream_transcribe
    toks_g, lens_g = jax.jit(lambda p, f, l: recognize_greedy(
        p, cfg, f, l, max_symbols=8))(qp, feats, feat_lens)
    assert toks_g.shape == (B, 8)
    toks_b, lens_b, scores = recognize_beam(qp, cfg, feats, feat_lens,
                                            beam=3, max_symbols=8,
                                            expansions=2)
    assert np.all(np.asarray(scores)[:, 0] <= 1e-5)
    # streaming with quantized params == offline with quantized params
    toks_s, lens_s = stream_transcribe(qp, cfg, feats, feat_lens,
                                       chunk_frames=2, max_symbols=8)
    np.testing.assert_array_equal(np.asarray(toks_g), np.asarray(toks_s))
    np.testing.assert_array_equal(np.asarray(lens_g), np.asarray(lens_s))


def test_quantized_conformer_encode_close():
    cfg = _cfg(enc_type="conformer", enc_layers=2, enc_hidden=32,
               enc_heads=2, time_reduction=2, input_dim=8)
    params = m.init_params(jax.random.PRNGKey(2), cfg)
    qp = quantize_params(params)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 12, cfg.input_dim)), jnp.float32)
    feat_lens = jnp.asarray(np.array([12, 8], np.int32))
    enc, lens = m.encode(params, cfg, feats, feat_lens)
    enc_q, lens_q = m.encode(qp, cfg, feats, feat_lens)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens_q))
    err = np.abs(np.asarray(enc_q) - np.asarray(enc))
    assert np.mean(err) < 0.1, np.mean(err)


def test_trained_model_transcripts_survive_quantization():
    """Train the learnable toy task to convergence; int8-quantized greedy
    decode must produce the SAME transcripts as the fp32 params."""
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.train.loop import (init_train_state,
                                               make_train_step)

    T_, U_, V_ = 16, 4, 6
    cfg = TransducerConfig(input_dim=V_, enc_layers=1, enc_hidden=32,
                           pred_layers=1, pred_hidden=32, embed_dim=16,
                           joint_dim=32, vocab_size=V_,
                           compute_dtype="float32")
    tcfg = TrainConfig(batch_size=8, learning_rate=5e-3, warmup_steps=30,
                       total_steps=600, loss_impl="xla")
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))

    def toy(rng, n):
        feats = np.zeros((n, T_, V_), np.float32)
        labels = rng.integers(1, V_, size=(n, U_)).astype(np.int32)
        for i in range(n):
            for u in range(U_):
                feats[i, 4 * u: 4 * u + 4, labels[i, u]] = 1.0
        feats += rng.normal(scale=0.05, size=feats.shape).astype(np.float32)
        return jnp.asarray(feats), jnp.asarray(labels)

    rng = np.random.default_rng(7)
    fl = jnp.full((8,), T_, jnp.int32)
    ll = jnp.full((8,), U_, jnp.int32)
    for _ in range(600):
        feats, labels = toy(rng, 8)
        state, info = step(state, feats, fl, labels, ll)
    assert np.isfinite(float(info["loss"]))

    rng = np.random.default_rng(99)
    feats, labels = toy(rng, 16)
    fl16 = jnp.full((16,), T_, jnp.int32)
    toks, lens = recognize_greedy(state.params, cfg, feats, fl16,
                                  max_symbols=8)
    qp = quantize_params(state.params)
    toks_q, lens_q = recognize_greedy(qp, cfg, feats, fl16, max_symbols=8)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(lens_q))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_q))
    # and the trained task still decodes correctly from int8 weights
    toks_q, lens_q = np.asarray(toks_q), np.asarray(lens_q)
    exact = sum(
        list(toks_q[i, : int(lens_q[i])]) == list(np.asarray(labels)[i])
        for i in range(16))
    assert exact >= 14, exact


def test_serving_engine_accepts_quantized_params():
    from rnn_transducer_tpu.decode.greedy import recognize_greedy
    from rnn_transducer_tpu.serve import BatchingEngine

    cfg = _cfg(input_dim=8, vocab_size=16, enc_hidden=32, pred_hidden=32,
               joint_dim=32, embed_dim=16, enc_layers=1)
    params = m.init_params(jax.random.PRNGKey(3), cfg)
    qp = quantize_params(params)
    rng = np.random.default_rng(3)
    a = rng.normal(size=(16, cfg.input_dim)).astype(np.float32)
    toks, lens = recognize_greedy(qp, cfg, jnp.asarray(a[None]),
                                  jnp.asarray([16], jnp.int32),
                                  max_symbols=8)
    want = np.asarray(toks)[0, : int(lens[0])].tolist()
    eng = BatchingEngine(qp, cfg, max_symbols=8, frame_buckets=(16,),
                         max_batch=2, window_ms=1.0)
    try:
        assert eng.submit(a) == want
    finally:
        eng.close()


def test_cli_quantize(tmp_path, capsys):
    import recognize
    recognize.main(["--config", "smoke", "--mode", "greedy",
                    "--data", "synthetic", "--quantize", "int8",
                    "--batches", "1", "--batch-size", "2",
                    "--max-symbols", "6"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "greedy" and "wer" in out


def test_int8_pallas_inference_kernel_matches_scan():
    """W8A8 Pallas inference core (interpret mode) vs the scan reference
    running on the SAME dequantized weights — the only difference is the
    kernel's dynamic per-step int8 re-quantization of h."""
    from rnn_transducer_tpu.ops.lstm import init_lstm_params, lstm_layer

    rng = np.random.default_rng(4)
    I, H, B, T = 12, 16, 8, 24
    params = init_lstm_params(jax.random.PRNGKey(4), I, H)
    qw_hh = quantize_tensor(params["w_hh"], channel_axis=-1)
    qw_ih = quantize_tensor(params["w_ih"], channel_axis=-1)
    deq = {"w_ih": dequantize_tensor(qw_ih),
           "w_hh": dequantize_tensor(qw_hh), "b": params["b"]}
    qp = {"w_ih": qw_ih, "w_hh": qw_hh, "b": params["b"]}
    x = jnp.asarray(rng.normal(size=(B, T, I)), jnp.float32)

    ref, (hT, cT) = lstm_layer(deq, x, compute_dtype=jnp.float32,
                               impl="scan")
    got, (hTq, cTq) = lstm_layer(qp, x, compute_dtype=jnp.float32,
                                 impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)
    np.testing.assert_allclose(np.asarray(hTq), np.asarray(hT), atol=0.05)
    np.testing.assert_allclose(np.asarray(cTq), np.asarray(cT), atol=0.08)
    # final state == last output row (inference contract)
    np.testing.assert_array_equal(np.asarray(hTq),
                                  np.asarray(got[:, -1]))
    # carried-state chunking (the streaming path) stays consistent
    g1, (h1, c1) = lstm_layer(qp, x[:, :16], compute_dtype=jnp.float32,
                              impl="pallas")
    g2, (h2, c2) = lstm_layer(qp, x[:, 16:], h1, c1,
                              compute_dtype=jnp.float32, impl="pallas")
    np.testing.assert_allclose(np.asarray(jnp.concatenate([g1, g2], 1)),
                               np.asarray(got), atol=1e-6)
