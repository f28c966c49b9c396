"""Evaluation metrics: WER/PER (edit distance), RTF and latency summaries.

Host-side numpy; the reference computes WER + RTF for its beam-search
benchmark (BASELINE.json configs[3]).
"""

from __future__ import annotations

import time

import numpy as np

try:  # python-Levenshtein: fast C edit distance over sequences of hashables
    import Levenshtein as _lev
except ImportError:  # pragma: no cover
    _lev = None


def edit_distance(ref, hyp) -> int:
    """Levenshtein distance between two token sequences."""
    ref, hyp = list(ref), list(hyp)
    from rnn_transducer_tpu.utils import hostio
    if hostio.available():  # native C++ path (cpp/hostio.cpp)
        return hostio.edit_distance(ref, hyp)
    if _lev is not None:
        # Map tokens to unicode codepoints so the C string path applies.
        alphabet = {t: chr(0x100 + i) for i, t in enumerate(dict.fromkeys(ref + hyp))}
        return _lev.distance("".join(alphabet[t] for t in ref),
                             "".join(alphabet[t] for t in hyp))
    # numpy DP fallback
    m, n = len(ref), len(hyp)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (ref[i - 1] != hyp[j - 1]))
    return int(d[n])


def error_rate(refs, hyps) -> float:
    """Corpus-level WER/PER: total edits / total reference tokens."""
    from rnn_transducer_tpu.utils import hostio
    if hostio.available() and refs:
        return hostio.corpus_error_rate(refs, hyps)
    edits = sum(edit_distance(r, h) for r, h in zip(refs, hyps))
    total = sum(len(r) for r in refs)
    return edits / max(total, 1)


def tokens_to_lists(tokens, lengths):
    """(B, U) padded token array + lengths -> list of python lists."""
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    return [tokens[b, : lengths[b]].tolist() for b in range(tokens.shape[0])]


class RtfMeter:
    """Accumulates decode wall time vs audio duration; reports RTF + p50/p90.

    RTF = processing_time / audio_duration (lower is better).
    """

    def __init__(self):
        self.latencies: list[float] = []
        self.audio_secs: list[float] = []

    def add(self, wall_s: float, audio_s: float, n_utts: int = 1):
        self.latencies.extend([wall_s / max(n_utts, 1)] * n_utts)
        self.audio_secs.append(audio_s)

    @property
    def rtf(self) -> float:
        return sum(self.latencies) / max(sum(self.audio_secs), 1e-9)

    def percentile_latency(self, q: float) -> float:
        return float(np.percentile(np.asarray(self.latencies), q))

    def summary(self) -> dict:
        return {
            "rtf": self.rtf,
            "p50_latency_s": self.percentile_latency(50),
            "p90_latency_s": self.percentile_latency(90),
            "n": len(self.latencies),
        }

