"""Global CMVN (data/cmvn.py): stats math vs direct numpy, padded-batch
masking, manifest threading, serving featurization, and the CLI
roundtrip (train --cmvn records stats in meta.json; recognize applies
them automatically)."""

import json

import numpy as np
import pytest

from rnn_transducer_tpu.data.cmvn import (apply_cmvn, apply_cmvn_batch,
                                          compute_cmvn, load_cmvn,
                                          save_cmvn, stats_arrays)

DIM = 8


def _manifest(tmp_path, n=5, dim=DIM, offset=0.0, scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    recs, all_feats = [], []
    for i in range(n):
        T = int(rng.integers(6, 20))
        feats = (rng.normal(size=(T, dim)) * scale + offset).astype(
            np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, feats)
        all_feats.append(feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 9, size=3).tolist()})
    man = tmp_path / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in recs))
    return str(man), all_feats


@pytest.mark.quick
def test_compute_cmvn_matches_direct_stats(tmp_path):
    man, feats = _manifest(tmp_path, offset=3.0, scale=2.0)
    stats = compute_cmvn(man, DIM)
    cat = np.concatenate(feats, axis=0).astype(np.float64)
    np.testing.assert_allclose(stats["mean"], cat.mean(0), rtol=1e-6)
    np.testing.assert_allclose(stats["std"], cat.std(0), rtol=1e-5)
    assert stats["frames"] == cat.shape[0]
    # the normalized corpus is standardized
    norm = np.concatenate([apply_cmvn(f, stats) for f in feats], axis=0)
    np.testing.assert_allclose(norm.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(norm.std(0), 1.0, atol=1e-3)


@pytest.mark.quick
def test_save_load_roundtrip_and_validation(tmp_path):
    man, _ = _manifest(tmp_path)
    stats = compute_cmvn(man, DIM)
    p = str(tmp_path / "cmvn.json")
    save_cmvn(stats, p)
    got = load_cmvn(p)
    np.testing.assert_allclose(got["mean"], stats["mean"])
    assert load_cmvn(stats) is stats  # dict passthrough (meta.json form)
    with pytest.raises(ValueError):
        load_cmvn({"mean": [0.0]})  # missing std
    with pytest.raises(ValueError):
        apply_cmvn(np.zeros((4, DIM + 1), np.float32), stats)


@pytest.mark.quick
def test_apply_cmvn_batch_keeps_padding_zero(tmp_path):
    man, feats = _manifest(tmp_path, offset=5.0)
    stats = compute_cmvn(man, DIM)
    T = max(f.shape[0] for f in feats) + 4
    B = len(feats)
    batch = np.zeros((B, T, DIM), np.float32)
    lens = np.array([f.shape[0] for f in feats], np.int32)
    for i, f in enumerate(feats):
        batch[i, : f.shape[0]] = f
    out = apply_cmvn_batch(batch, lens, stats)
    for i, f in enumerate(feats):
        np.testing.assert_allclose(out[i, : lens[i]], apply_cmvn(f, stats),
                                   rtol=1e-6)
        assert np.all(out[i, lens[i]:] == 0.0)  # pads survive as zero


@pytest.mark.quick
def test_manifest_examples_thread_cmvn(tmp_path):
    from rnn_transducer_tpu.data.manifest import manifest_examples
    from rnn_transducer_tpu.models.config import TransducerConfig
    man, feats = _manifest(tmp_path, offset=2.0)
    cfg = TransducerConfig(input_dim=DIM, vocab_size=16)
    stats = compute_cmvn(man, DIM)
    plain = [f for f, _ in manifest_examples(man, cfg)]
    norm = [f for f, _ in manifest_examples(man, cfg, cmvn=stats)]
    for p, q in zip(plain, norm):
        np.testing.assert_allclose(q, apply_cmvn(p, stats), rtol=1e-6)


@pytest.mark.quick
def test_serving_feats_apply_cmvn(tmp_path):
    from rnn_transducer_tpu.models.config import TransducerConfig
    from rnn_transducer_tpu.serve import _feats_from_body
    man, _ = _manifest(tmp_path)
    stats = compute_cmvn(man, DIM)
    cfg = TransducerConfig(input_dim=DIM, vocab_size=16)
    raw = np.random.default_rng(1).normal(size=(7, DIM)).astype(np.float32)
    body = {"feats": raw.tolist()}
    np.testing.assert_allclose(_feats_from_body(body, cfg), raw, rtol=1e-6)
    np.testing.assert_allclose(_feats_from_body(body, cfg, stats),
                               apply_cmvn(raw, stats), rtol=1e-6)


def test_cli_train_records_recognize_applies(tmp_path, capsys):
    """compute_cmvn CLI -> train --cmvn (meta.json records stats) ->
    recognize auto-applies: hyps equal an explicit --cmvn run, and the
    stats genuinely change the features (offset corpus)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import compute_cmvn as cc
    import recognize
    import train

    rng = np.random.default_rng(3)
    recs = []
    for i in range(8):
        T = int(rng.integers(20, 40))
        feats = (rng.normal(size=(T, 80)) * 3.0 + 4.0).astype(np.float32)
        p = tmp_path / f"g{i}.npy"
        np.save(p, feats)
        recs.append({"feats": str(p),
                     "labels": rng.integers(1, 30, size=3).tolist()})
    man = tmp_path / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in recs))

    stats_path = str(tmp_path / "cmvn.json")
    cc.main(["--manifest", str(man), "--out", stats_path,
             "--input-dim", "80"])
    capsys.readouterr()

    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "4",
                "--data", f"manifest:{man}", "--cmvn", stats_path,
                "--ckpt-dir", ck, "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    meta = json.loads((tmp_path / "ck" / "meta.json").read_text())
    assert "cmvn" in meta and len(meta["cmvn"]["mean"]) == 80
    # the recorded stats reflect the offset corpus, not identity
    assert abs(np.mean(meta["cmvn"]["mean"]) - 4.0) < 1.0

    def hyps_of(extra):
        out = str(tmp_path / f"h{len(extra)}.jsonl")
        recognize.main(["--ckpt-dir", ck, "--mode", "greedy",
                        "--data", f"manifest:{man}", "--batch-size", "4",
                        "--max-symbols", "6", "--hyps-file", out] + extra)
        capsys.readouterr()
        with open(out) as f:
            return [json.loads(l)["hyp"] for l in f]

    auto = hyps_of([])                          # stats from meta.json
    explicit = hyps_of(["--cmvn", stats_path])  # same stats, CLI path
    assert auto == explicit

    # --cmvn on synthetic data is rejected
    with pytest.raises(SystemExit):
        train.main(["--config", "smoke", "--steps", "1",
                    "--cmvn", stats_path, "--data-parallel", "1"])
