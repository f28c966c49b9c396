"""Fused XLA log-mel / FBANK frontend.

The reference extracts 80-dim log-mel features on the host with
numpy/kaldi-style tooling (SURVEY.md §A: "log-mel/FBANK audio frontend";
80-dim per BASELINE.json configs[0]). Here the whole chain —
pre-emphasis -> framing -> window -> rFFT -> power -> mel filterbank ->
log -> (optional per-utterance CMVN) — is a single jitted XLA graph that
runs on-device: framing is a strided gather, the filterbank is one
(F, n_fft/2+1) x (n_fft/2+1, n_mels) matmul on the MXU, and everything
else fuses into elementwise VPU work.

The mel filterbank matrix is built host-side in numpy (HTK-style
triangular filters) and closed over as a constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """HTK-style triangular mel filterbank: (n_fft//2 + 1, n_mels) fp32."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop", "win", "n_mels",
                     "preemph", "cmvn", "log_floor"),
)
def log_mel(audio, audio_lens, *, sample_rate: int = 16000, n_fft: int = 512,
            hop: int = 160, win: int = 400, n_mels: int = 80,
            preemph: float = 0.97, cmvn: bool = False,
            log_floor: float = 1e-10):
    """(B, N) waveform -> ((B, T, n_mels) log-mel features, (B,) frame lens).

    T = 1 + (N - win) // hop (no padding — matches kaldi snip-edges).
    """
    audio = audio.astype(jnp.float32)
    B, N = audio.shape
    if preemph:
        audio = jnp.concatenate(
            [audio[:, :1], audio[:, 1:] - preemph * audio[:, :-1]], axis=1)
    T = 1 + (N - win) // hop
    # Framing as a strided gather: (B, T, win).
    idx = (jnp.arange(T)[:, None] * hop + jnp.arange(win)[None, :])  # (T, win)
    frames = audio[:, idx]  # (B, T, win)
    window = jnp.asarray(np.hanning(win).astype(np.float32))
    frames = frames * window
    # Zero-pad to n_fft and take the real FFT -> power spectrum.
    if n_fft > win:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - win)))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, T, n_fft//2+1)
    fb = jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    mel = jnp.dot(power, fb, preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, log_floor))
    frame_lens = jnp.maximum(
        1 + (audio_lens.astype(jnp.int32) - win) // hop, 0)
    frame_lens = jnp.minimum(frame_lens, T)
    if cmvn:
        t_ids = jnp.arange(T, dtype=jnp.int32)[None, :, None]
        mask = (t_ids < frame_lens[:, None, None]).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feats * mask, axis=1, keepdims=True) / denom
        var = jnp.sum((feats - mean) ** 2 * mask, axis=1, keepdims=True) / denom
        feats = (feats - mean) * jax.lax.rsqrt(var + 1e-8)
        feats = feats * mask
    return feats, frame_lens


def log_mel_oracle(audio, audio_lens, sample_rate=16000, n_fft=512, hop=160,
                   win=400, n_mels=80, preemph=0.97, log_floor=1e-10):
    """Literal numpy float64 reference for parity tests."""
    audio = np.asarray(audio, np.float64)
    B, N = audio.shape
    if preemph:
        audio = np.concatenate(
            [audio[:, :1], audio[:, 1:] - preemph * audio[:, :-1]], axis=1)
    T = 1 + (N - win) // hop
    window = np.hanning(win)
    fb = mel_filterbank(n_mels, n_fft, sample_rate).astype(np.float64)
    out = np.zeros((B, T, n_mels))
    for b in range(B):
        for t in range(T):
            fr = audio[b, t * hop: t * hop + win] * window
            spec = np.fft.rfft(fr, n=n_fft)
            power = np.abs(spec) ** 2
            out[b, t] = np.log(np.maximum(power @ fb, log_floor))
    frame_lens = np.minimum(np.maximum(1 + (np.asarray(audio_lens) - win) // hop, 0), T)
    return out, frame_lens
