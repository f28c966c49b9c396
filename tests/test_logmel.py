"""Fused log-mel frontend parity vs the literal numpy float64 oracle."""

import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.logmel import log_mel, log_mel_oracle, mel_filterbank


def test_logmel_matches_oracle():
    rng = np.random.default_rng(0)
    B, N = 2, 16000  # 1 s at 16 kHz
    audio = (rng.normal(size=(B, N)) * 0.1).astype(np.float32)
    lens = np.array([16000, 8000], np.int32)
    got, got_lens = log_mel(jnp.asarray(audio), jnp.asarray(lens))
    want, want_lens = log_mel_oracle(audio, lens)
    assert got.shape == (B, 98, 80)
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_logmel_tone_peaks_at_expected_mel_bin():
    """A pure 1 kHz tone must put its energy at the 1 kHz mel filter."""
    sr, N = 16000, 16000
    t = np.arange(N) / sr
    audio = np.sin(2 * np.pi * 1000.0 * t)[None, :].astype(np.float32)
    feats, _ = log_mel(jnp.asarray(audio), jnp.asarray([N], np.int32),
                       preemph=0.0)
    mean_spec = np.asarray(feats).mean(axis=(0, 1))  # (80,)
    peak_mel = int(np.argmax(mean_spec))
    # Which mel filter is centered nearest 1 kHz?
    fb = mel_filterbank(80, 512, sr)
    freqs = np.linspace(0, sr / 2, fb.shape[0])
    centers = freqs[np.argmax(fb, axis=0)]
    want = int(np.argmin(np.abs(centers - 1000.0)))
    assert abs(peak_mel - want) <= 1


def test_logmel_cmvn_normalizes_valid_region():
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=(2, 12000)) * 0.5 + 0.2).astype(np.float32)
    lens = np.array([12000, 6000], np.int32)
    feats, flens = log_mel(jnp.asarray(audio), jnp.asarray(lens), cmvn=True)
    f = np.asarray(feats)
    for b in range(2):
        valid = f[b, : int(flens[b])]
        assert abs(valid.mean()) < 1e-4
        assert abs(valid.std() - 1.0) < 1e-2
        # padding must be zeroed
        assert np.all(f[b, int(flens[b]):] == 0)
