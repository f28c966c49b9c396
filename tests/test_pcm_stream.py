"""Incremental PCM featurization (data/pcm_stream.py): any chunking of a
waveform must produce EXACTLY the offline frontend's features — the
preemphasis filter carries one raw sample across every boundary and
snip-edges frames overlap by win - hop samples."""

import numpy as np
import pytest

from rnn_transducer_tpu.data.pcm_stream import PcmFeaturizer
from rnn_transducer_tpu.ops.logmel import log_mel_oracle
from rnn_transducer_tpu.utils import hostio

pytestmark = pytest.mark.quick

N = 400 + 160 * 42 + 73  # 43 frames + a dropped partial window
AUDIO = (np.random.default_rng(0).normal(size=N) * 0.1).astype(np.float32)
OFFLINE = log_mel_oracle(AUDIO[None], np.array([N]), n_mels=8)[0][0]


def _run_chunked(audio, cuts, **kw):
    f = PcmFeaturizer(8, **kw)
    outs = [f.feed(p) for p in np.split(audio, cuts)]
    return np.concatenate(outs, axis=0)


def test_random_splits_match_offline():
    rng = np.random.default_rng(1)
    for _ in range(4):
        cuts = np.sort(rng.integers(1, N, size=7))
        got = _run_chunked(AUDIO, cuts)
        assert got.shape == OFFLINE.shape
        np.testing.assert_allclose(got, OFFLINE, atol=5e-4)


def test_single_feed_matches_offline():
    got = _run_chunked(AUDIO, [])
    np.testing.assert_allclose(got, OFFLINE, atol=5e-4)


def test_tiny_chunks_and_empty_feeds():
    # 1-sample chunks around a window boundary + zero-length feeds
    f = PcmFeaturizer(8)
    outs = [f.feed(AUDIO[:399])]
    outs.append(f.feed(np.zeros((0,), np.float32)))  # no-op
    for k in range(399, 402):
        outs.append(f.feed(AUDIO[k: k + 1]))
    outs.append(f.feed(AUDIO[402:]))
    got = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, OFFLINE, atol=5e-4)
    # the first frame completed exactly when sample 400 arrived
    assert outs[0].shape[0] == 0 and outs[2].shape[0] == 1


def test_oracle_fallback_path(monkeypatch):
    if not hostio.available():
        pytest.skip("native hostio not built; fallback is the only path")
    monkeypatch.setattr(hostio, "available", lambda: False)
    got = _run_chunked(AUDIO, [1234, 5000])
    np.testing.assert_allclose(got, OFFLINE, atol=5e-4)


def test_partial_window_dropped_like_offline():
    # total < win: offline yields 0 frames; so must the stream
    f = PcmFeaturizer(8)
    assert f.feed(AUDIO[:399]).shape == (0, 8)
