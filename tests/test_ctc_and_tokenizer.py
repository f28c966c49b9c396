"""CTC loss parity vs torch.nn.CTCLoss; tokenizer roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from rnn_transducer_tpu.data.tokenizer import (CharTokenizer,
                                               PhonemeTokenizer,
                                               TIMIT_PHONES)
from rnn_transducer_tpu.ops.ctc_loss import ctc_loss_from_logits


def test_ctc_matches_torch():
    rng = np.random.default_rng(0)
    B, T, U, V = 4, 12, 5, 9
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    fl = np.array([12, 9, 7, 12], np.int64)
    ll = np.array([5, 3, 2, 5], np.int64)
    got = ctc_loss_from_logits(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(fl), jnp.asarray(ll))
    lp = torch.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    want = torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels.astype(np.int64)), torch.tensor(fl),
        torch.tensor(ll), blank=0, reduction="none", zero_infinity=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_ctc_grad_matches_torch():
    rng = np.random.default_rng(1)
    B, T, U, V = 2, 8, 3, 6
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, U)).astype(np.int32)
    fl = np.array([8, 6], np.int64)
    ll = np.array([3, 2], np.int64)
    got = jax.grad(lambda x: jnp.sum(ctc_loss_from_logits(
        x, jnp.asarray(labels), jnp.asarray(fl), jnp.asarray(ll))))(
        jnp.asarray(logits))
    tl = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(tl, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels.astype(np.int64)), torch.tensor(fl),
        torch.tensor(ll), blank=0, reduction="sum")
    loss.backward()
    np.testing.assert_allclose(np.asarray(got), tl.grad.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_ctc_jits():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(2, 10, 7)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 7, size=(2, 4)), jnp.int32)
    v = jax.jit(lambda x: jnp.mean(ctc_loss_from_logits(
        x, labels, jnp.asarray([10, 8]), jnp.asarray([4, 2]))))(logits)
    assert np.isfinite(float(v))


def test_char_tokenizer_roundtrip(tmp_path):
    tok = CharTokenizer()
    ids = tok.encode("Hello World")
    assert tok.decode(ids) == "hello world"
    assert 0 not in ids  # blank reserved
    assert tok.vocab_size == 29
    tok.save(str(tmp_path / "tok.json"))
    tok2 = CharTokenizer.load(str(tmp_path / "tok.json"))
    assert tok2.encode("abc") == tok.encode("abc")


def test_phoneme_tokenizer():
    tok = PhonemeTokenizer()
    # 62 phone symbols + blank = 63, matching config_timit().vocab_size
    from rnn_transducer_tpu.models.config import config_timit
    assert tok.vocab_size == config_timit().vocab_size == 63
    ids = tok.encode(["sh", "iy", "h#"])
    assert len(ids) == 3 and all(i > 0 for i in ids)
    assert tok.decode(ids) == ["sh", "iy", "h#"]
    assert len(TIMIT_PHONES) == 62
