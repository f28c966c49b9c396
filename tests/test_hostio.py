"""Native hostio library: FBANK parity vs numpy oracle; edit distance."""

import numpy as np
import pytest

from rnn_transducer_tpu.utils import hostio

pytestmark = pytest.mark.skipif(not hostio.available(),
                                reason="no C++ toolchain")


def test_fbank_matches_numpy_oracle():
    from rnn_transducer_tpu.ops.logmel import log_mel_oracle
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=12000) * 0.1).astype(np.float32)
    got = hostio.fbank(audio)
    want, _ = log_mel_oracle(audio[None], np.array([len(audio)]))
    assert got.shape == want[0].shape
    np.testing.assert_allclose(got, want[0], rtol=1e-3, atol=1e-3)


def test_fbank_short_audio():
    assert hostio.fbank(np.zeros(10, np.float32)).shape == (0, 80)


def test_edit_distance_matches_python():
    from rnn_transducer_tpu.decode.metrics import edit_distance as py_ed
    rng = np.random.default_rng(1)
    for _ in range(20):
        a = rng.integers(0, 10, size=rng.integers(0, 15)).tolist()
        b = rng.integers(0, 10, size=rng.integers(0, 15)).tolist()
        assert hostio.edit_distance(a, b) == py_ed(a, b)


def test_corpus_error_rate_matches_python():
    from rnn_transducer_tpu.decode.metrics import error_rate as py_er
    rng = np.random.default_rng(2)
    refs = [rng.integers(1, 9, size=rng.integers(1, 12)).tolist()
            for _ in range(10)]
    hyps = [rng.integers(1, 9, size=rng.integers(0, 12)).tolist()
            for _ in range(10)]
    assert abs(hostio.corpus_error_rate(refs, hyps) - py_er(refs, hyps)) < 1e-12
