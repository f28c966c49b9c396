"""Native C++ prefetching loader (cpp/loader.cpp) vs the Python pipeline."""

import itertools
import json
import os

import numpy as np
import pytest

from rnn_transducer_tpu.data import native_loader
from rnn_transducer_tpu.data.bucketing import bucket_stream
from rnn_transducer_tpu.models.config import TransducerConfig

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="no native toolchain")

CFG = TransducerConfig(input_dim=8, vocab_size=16)
BUCKETS = ((6, 3), (12, 5))


def _write_manifest(tmp_path, n=13, seed=0, audio=False):
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        u = int(rng.integers(1, 6))
        labels = rng.integers(1, CFG.vocab_size, size=u).tolist()
        if audio:
            samples = int(rng.integers(800, 2000))
            wav = rng.normal(size=samples).astype(np.float32)
            p = os.path.join(tmp_path, f"a{i}.npy")
            np.save(p, wav)
            recs.append({"audio": p, "labels": labels})
        else:
            t = int(rng.integers(2, 14))
            feats = rng.normal(size=(t, CFG.input_dim)).astype(np.float32)
            p = os.path.join(tmp_path, f"f{i}.npy")
            np.save(p, feats)
            recs.append({"feats": p, "labels": labels})
    mpath = os.path.join(tmp_path, "manifest.jsonl")
    with open(mpath, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    return mpath, recs


def _python_batches(mpath):
    from rnn_transducer_tpu.data.manifest import manifest_examples
    return list(bucket_stream(manifest_examples(mpath, CFG), BUCKETS,
                              batch_size=4, blank=CFG.blank,
                              with_valid=True))


def test_matches_python_bucket_stream_exactly(tmp_path):
    """Single worker + manifest order => identical batches to Python."""
    mpath, _ = _write_manifest(str(tmp_path), n=13)
    want = _python_batches(mpath)
    with native_loader.NativeLoader(mpath, CFG, BUCKETS, 4, loop=False,
                                    seed=None, n_threads=1) as ld:
        got = list(ld)
        dropped = ld.dropped
    assert len(got) == len(want) and len(want) >= 2
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bucket_stream counts drops identically
    from rnn_transducer_tpu.data.bucketing import BucketBatcher
    from rnn_transducer_tpu.data.manifest import manifest_examples
    bb = BucketBatcher(BUCKETS, 4, blank=CFG.blank)
    for f, l in manifest_examples(mpath, CFG):
        bb.add(f, l)
    assert dropped == bb.n_dropped


def test_audio_path_matches_native_fbank(tmp_path):
    """Raw-audio records run the in-loader FBANK == hostio.fbank."""
    from rnn_transducer_tpu.utils import hostio

    mpath, recs = _write_manifest(str(tmp_path), n=4, audio=True)
    # generous buckets so nothing drops; batch_size 4 -> one batch
    buckets = ((64, 8),)
    with native_loader.NativeLoader(mpath, CFG, buckets, 4, loop=False,
                                    seed=None, n_threads=1) as ld:
        (feats, fl, labels, ll, n_valid), = list(ld)
    assert n_valid == 4
    for i, rec in enumerate(recs):
        wav = np.load(rec["audio"])
        want = hostio.fbank(wav, n_mels=CFG.input_dim)
        np.testing.assert_allclose(feats[i, : fl[i]], want, rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_array_equal(labels[i, : ll[i]],
                                      np.asarray(rec["labels"], np.int32))


def test_multithreaded_same_multiset(tmp_path):
    """4 workers produce the same examples (any batch order)."""
    mpath, _ = _write_manifest(str(tmp_path), n=23, seed=3)
    want = _python_batches(mpath)

    def key_set(batches):
        keys = []
        for feats, fl, labels, ll, n_valid in batches:
            for i in range(n_valid):
                keys.append((float(np.sum(feats[i, : fl[i]])),
                             tuple(labels[i, : ll[i]].tolist())))
        return sorted(keys)

    with native_loader.NativeLoader(mpath, CFG, BUCKETS, 4, loop=False,
                                    seed=None, n_threads=4) as ld:
        got = list(ld)
    assert key_set(got) == key_set(want)


def test_train_cli_with_native_loader(tmp_path, capsys):
    """train.py --loader native runs the C++ pipeline end to end."""
    import json as _json

    import train

    rng = np.random.default_rng(0)
    recs = []
    for i in range(8):
        t = int(rng.integers(20, 40))
        u = int(rng.integers(2, 5))
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 30, size=u).tolist()})
    man = tmp_path / "train.jsonl"
    man.write_text("\n".join(_json.dumps(r) for r in recs))
    train.main(["--config", "smoke", "--steps", "3", "--batch-size", "4",
                "--data", f"manifest:{man}", "--loader", "native",
                "--data-parallel", "1"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])
    assert res["steps"] == 3


def test_recognize_cli_with_native_loader(tmp_path, capsys):
    import json as _json

    import recognize

    rng = np.random.default_rng(1)
    recs = []
    for i in range(6):
        t = int(rng.integers(20, 40))
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        p = tmp_path / f"r{i}.npy"
        np.save(p, feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 30, size=3).tolist()})
    man = tmp_path / "eval.jsonl"
    man.write_text("\n".join(_json.dumps(r) for r in recs))
    recognize.main(["--config", "smoke", "--mode", "greedy",
                    "--data", f"manifest:{man}", "--loader", "native",
                    "--batch-size", "4", "--max-symbols", "8"])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["wer"] >= 0 and res["rtf"] > 0


def test_loop_mode_reshuffles_and_keeps_feeding(tmp_path):
    mpath, _ = _write_manifest(str(tmp_path), n=16, seed=5)
    with native_loader.NativeLoader(mpath, CFG, BUCKETS, 4, loop=True,
                                    seed=7, n_threads=2) as ld:
        batches = list(itertools.islice(iter(ld), 10))
    assert len(batches) == 10
    for feats, fl, labels, ll, n_valid in batches:
        assert n_valid == 4
        assert np.all(fl > 0)
