"""Incremental (streaming) FBANK featurization of raw PCM.

The offline frontend (ops/logmel.py, cpp/hostio.cpp) frames with
kaldi-style snip-edges: frame t covers samples [t*hop, t*hop + win), so
consecutive frames OVERLAP by win - hop samples and the preemphasis
filter x[k] - p*x[k-1] reaches one sample across every boundary.
Featurizing each network chunk of PCM independently therefore computes
different features than featurizing the whole waveform — frames that
straddle a chunk boundary are simply never produced, and each chunk's
first sample is preemphasized as if it were the start of the stream.

``PcmFeaturizer`` makes chunked featurization EXACT: it preemphasizes
incrementally (carrying the previous raw sample across chunks) and
keeps the un-framed tail of the preemphasized signal (up to win - hop
samples plus hop alignment) so that, for any split of a waveform into
chunks, the concatenated outputs equal the offline frontend on the full
waveform, frame for frame. The final partial window (< win samples) is
dropped exactly as snip-edges framing drops it offline.

Used by the serving HTTP layer for raw-PCM streaming sessions
(rnn_transducer_tpu/serve.py); any host pipeline that receives audio in
pieces can use it directly.
"""

from __future__ import annotations

import numpy as np


class PcmFeaturizer:
    """Chunked raw PCM -> log-mel features, exactly ≡ offline featurization.

    feed(chunk) returns the (F, n_mels) features newly completed by this
    chunk (possibly F=0). Matches utils/hostio.fbank / ops/logmel.log_mel
    defaults (16 kHz, 25 ms window, 10 ms hop, preemph 0.97).
    """

    def __init__(self, n_mels: int = 80, *, sample_rate: int = 16000,
                 n_fft: int = 512, hop: int = 160, win: int = 400,
                 preemph: float = 0.97):
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop = hop
        self.win = win
        self.preemph = preemph
        self._prev: float | None = None  # last raw sample seen
        self._buf = np.zeros((0,), np.float32)  # preemphasized tail

    def feed(self, chunk) -> np.ndarray:
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        if chunk.size:
            pre = np.empty_like(chunk)
            if self._prev is None:
                pre[0] = chunk[0]  # stream start: first sample unchanged
            else:
                pre[0] = chunk[0] - self.preemph * self._prev
            pre[1:] = chunk[1:] - self.preemph * chunk[:-1]
            self._prev = float(chunk[-1])
            self._buf = np.concatenate([self._buf, pre])
        n = self._buf.shape[0]
        if n < self.win:
            return np.zeros((0, self.n_mels), np.float32)
        F = 1 + (n - self.win) // self.hop
        feats = self._fbank(self._buf)
        assert feats.shape[0] == F, (feats.shape, F)
        # frames 0..F-1 consumed samples [0, (F-1)*hop + win); the next
        # frame starts at F*hop — keep everything from there on
        self._buf = self._buf[F * self.hop:]
        return feats

    def _fbank(self, pre: np.ndarray) -> np.ndarray:
        """FBANK of an already-preemphasized signal (preemph=0)."""
        from rnn_transducer_tpu.utils import hostio
        if hostio.available():
            return hostio.fbank(
                pre, sample_rate=self.sample_rate, n_fft=self.n_fft,
                hop=self.hop, win=self.win, n_mels=self.n_mels,
                preemph=0.0)
        from rnn_transducer_tpu.ops.logmel import log_mel_oracle
        f, _ = log_mel_oracle(
            pre[None], np.array([pre.shape[0]]),
            sample_rate=self.sample_rate, n_fft=self.n_fft, hop=self.hop,
            win=self.win, n_mels=self.n_mels, preemph=0.0)
        return f[0].astype(np.float32)
