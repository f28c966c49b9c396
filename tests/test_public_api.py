"""The package's public API surface: one end-to-end flow through it."""

import jax
import jax.numpy as jnp
import numpy as np

import rnn_transducer_tpu as rt


def test_all_exports_resolve():
    for name in rt.__all__:
        assert getattr(rt, name) is not None


def test_reference_style_usage():
    """The reference's model-forward / loss / decode workflow, verbatim."""
    cfg = rt.TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                              pred_hidden=16, embed_dim=8, joint_dim=16,
                              vocab_size=9, input_dim=80,
                              compute_dtype="float32")
    params = rt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 8000)) * 0.1, jnp.float32)
    feats, feat_lens = rt.log_mel(audio, jnp.asarray([8000, 6400]))
    labels = jnp.asarray(rng.integers(1, 9, size=(2, 3)), jnp.int32)
    label_lens = jnp.asarray([3, 2], jnp.int32)

    logits, enc_lens = rt.forward(params, cfg, feats, feat_lens, labels)
    loss = rt.rnnt_loss(logits, labels, enc_lens, label_lens, cfg.blank)
    assert np.all(np.isfinite(np.asarray(loss)))

    toks, lens = rt.recognize_greedy(params, cfg, feats, feat_lens,
                                     max_symbols=8)
    btoks, blens, bscores = rt.recognize_beam(params, cfg, feats, feat_lens,
                                              beam=3, max_symbols=8,
                                              expansions=2)
    assert toks.shape == (2, 8) and btoks.shape == (2, 3, 8)
    wer = rt.error_rate([[1, 2]], [np.asarray(toks)[0, :2].tolist()])
    assert wer >= 0
