"""Exact data-stream resume (data/manifest.py fast_forward_state /
manifest_batches(resume_batches=)): a resumed stream must reproduce, batch
for batch, exactly what the uninterrupted stream would have produced —
across mid-epoch cuts, cuts inside the end-of-epoch flush, and epoch
boundaries. The fast-forward replays bucketing decisions on manifest
METADATA only (no feature payloads), so the replay itself is also checked
against the real stream's batch count."""

import itertools
import json

import numpy as np

from rnn_transducer_tpu.data.manifest import (fast_forward_state,
                                              manifest_batches)
from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig

CFG = TransducerConfig(input_dim=8, vocab_size=16)


def _manifest(tmp_path, lengths, label_lens=None):
    rng = np.random.default_rng(0)
    recs = []
    for i, t in enumerate(lengths):
        feats = rng.normal(size=(t, CFG.input_dim)).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, feats)
        u = label_lens[i] if label_lens else 2
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 16, size=u).tolist()})
    m = tmp_path / "m.jsonl"
    m.write_text("\n".join(json.dumps(r) for r in recs))
    return str(m)


def _take(stream, n):
    return [tuple(np.asarray(a) for a in b)
            for b in itertools.islice(stream, n)]


def _assert_batches_equal(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for a, b in zip(g, w):
            np.testing.assert_array_equal(a, b)


def _tcfg(**kw):
    base = dict(batch_size=2, buckets=((8, 3), (16, 5)))
    base.update(kw)
    return TrainConfig(**base)


def test_resume_matches_uninterrupted_at_every_cut(tmp_path):
    """Exhaustive over cut points spanning ~3 epochs: mid-epoch, inside
    the flush, and on epoch boundaries all reproduce the uninterrupted
    stream exactly."""
    lengths = [5, 12, 7, 15, 4, 9, 14, 6, 11]
    label_lens = [2, 4, 3, 5, 1, 2, 4, 3, 5]
    m = _manifest(tmp_path, lengths, label_lens)
    tcfg = _tcfg()
    kw = dict(skip_first=1, shuffle_seed=3)
    total = 18  # ~3 epochs worth of batches
    want = _take(manifest_batches(m, CFG, tcfg, **kw), total + 4)
    for cut in range(1, total):
        got = _take(manifest_batches(m, CFG, tcfg, resume_batches=cut, **kw),
                    4)
        _assert_batches_equal(got, want[cut:cut + 4])


def test_resume_with_sortagrad_first_epoch(tmp_path):
    """SortaGrad's shortest-first epoch 0 and the shuffled epoch 1 both
    survive the fast-forward."""
    lengths = [5, 12, 7, 15, 4, 9, 14, 6]
    m = _manifest(tmp_path, lengths)
    tcfg = _tcfg()
    kw = dict(sortagrad=True, shuffle_seed=11)
    want = _take(manifest_batches(m, CFG, tcfg, **kw), 14)
    for cut in (1, 3, 5, 8):
        got = _take(manifest_batches(m, CFG, tcfg, resume_batches=cut, **kw),
                    3)
        _assert_batches_equal(got, want[cut:cut + 3])


def test_fast_forward_is_metadata_only(tmp_path, monkeypatch):
    """fast_forward_state never loads a feature payload."""
    import rnn_transducer_tpu.data.manifest as mf

    lengths = [5, 12, 7, 15, 4, 9]
    m = _manifest(tmp_path, lengths)

    def boom(*a, **kw):
        raise AssertionError("fast_forward_state loaded features")

    monkeypatch.setattr(mf, "load_example", boom)
    epoch, pos, pending, in_flush = fast_forward_state(
        m, _tcfg(), 7, shuffle_seed=5)
    assert epoch >= 1  # 6 examples / bs 2 -> ~4 batches per epoch
    assert all(0 <= i < len(lengths) for i in pending)


def test_resume_zero_is_identity(tmp_path):
    m = _manifest(tmp_path, [5, 12, 7, 15])
    tcfg = _tcfg()
    want = _take(manifest_batches(m, CFG, tcfg, shuffle_seed=1), 4)
    got = _take(manifest_batches(m, CFG, tcfg, shuffle_seed=1,
                                 resume_batches=0), 4)
    _assert_batches_equal(got, want)


def test_train_cli_resume_exact_matches_uninterrupted(tmp_path, capsys):
    """End to end through train.py: run A trains 6 steps straight; run B
    trains 3, checkpoints, and resumes for 3 more with the default
    --resume-data exact. B's per-step losses at steps 4-6 equal A's —
    the resumed process consumed exactly the batches A did."""
    import train

    rng = np.random.default_rng(0)
    recs = []
    for i in range(10):
        t = int(rng.integers(20, 60))
        feats = rng.normal(size=(t, 80)).astype(np.float32)
        p = tmp_path / f"u{i}.npy"
        np.save(p, feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 32,
                                            size=int(rng.integers(2, 6))
                                            ).tolist()})
    man = tmp_path / "m.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in recs))

    def run(steps, ckpt, log, resume=False):
        argv = ["--config", "smoke", "--data", f"manifest:{man}",
                "--steps", str(steps), "--batch-size", "2",
                "--ckpt-dir", ckpt, "--log-file", log, "--log-every", "1",
                "--data-parallel", "1", "--seed", "5"]
        train.main(argv + (["--resume"] if resume else []))
        capsys.readouterr()
        return {r["step"]: r["loss"]
                for r in map(json.loads, open(log)) if "loss" in r}

    la = run(6, str(tmp_path / "ckA"), str(tmp_path / "logA"))
    run(3, str(tmp_path / "ckB"), str(tmp_path / "logB1"))
    lb = run(6, str(tmp_path / "ckB"), str(tmp_path / "logB2"), resume=True)
    for s in (4, 5, 6):
        assert la[s] == lb[s], (s, la, lb)
