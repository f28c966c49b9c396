"""End-to-end data prep: wav -> features + manifest -> trainable batches."""

import json
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import prepare_manifest


def _write_wav(path, n_samples=8000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def test_prepare_paired_and_train(tmp_path, capsys):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i, text in enumerate(["hello world", "the quick brown fox",
                              "jumps over", "the lazy dog"]):
        _write_wav(corpus / f"utt{i}.wav", n_samples=6000 + 800 * i, seed=i)
        (corpus / f"utt{i}.txt").write_text(text)
    out = tmp_path / "out"
    prepare_manifest.main(["--in-dir", str(corpus), "--out-dir", str(out),
                           "--tokenizer", "char"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["utts"] == 4
    man = out / "manifest.jsonl"
    recs = [json.loads(l) for l in man.read_text().splitlines()]
    assert all(os.path.exists(r["feats"]) for r in recs)
    feats = np.load(recs[0]["feats"])
    assert feats.shape[1] == 80 and feats.shape[0] > 10

    # feed straight into the training CLI
    import train
    train.main(["--config", "smoke", "--steps", "1", "--batch-size", "4",
                "--data", f"manifest:{man}", "--data-parallel", "1"])
    out_line = capsys.readouterr().out.strip().splitlines()[-1]
    assert np.isfinite(json.loads(out_line)["final_loss"])


def test_manifest_batches_raise_instead_of_spinning(tmp_path):
    """A holdout that consumes every example must raise, not loop forever
    re-reading the manifest (regression: train.py dev holdout on a corpus
    with <= batch_size utterances)."""
    import pytest

    from rnn_transducer_tpu.data.manifest import manifest_batches
    from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig

    man = tmp_path / "m.jsonl"
    feats = tmp_path / "f.npy"
    np.save(feats, np.zeros((12, 8), np.float32))
    man.write_text("\n".join(
        json.dumps({"feats": str(feats), "labels": [1, 2]})
        for _ in range(3)))
    cfg = TransducerConfig(input_dim=8)
    tcfg = TrainConfig(batch_size=4, buckets=((16, 4),))
    with pytest.raises(ValueError, match="no training batches"):
        next(manifest_batches(str(man), cfg, tcfg, skip_first=3))
    # sanity: without the holdout the same manifest yields a drained batch
    batch = next(manifest_batches(str(man), cfg, tcfg))
    assert batch[0].shape == (4, 16, 8)


def test_prepare_timit_layout_with_sphere(tmp_path, capsys):
    d = tmp_path / "timit" / "dr1" / "fcjf0"
    d.mkdir(parents=True)
    # synthetic NIST SPHERE file (uncompressed PCM16 little-endian)
    rng = np.random.default_rng(3)
    pcm = (rng.normal(size=7000) * 3000).astype("<i2")
    header = (b"NIST_1A\n   1024\n"
              b"sample_rate -i 16000\n"
              b"channel_count -i 1\n"
              b"sample_n_bytes -i 2\n"
              b"sample_byte_format -s2 01\n"
              b"sample_coding -s3 pcm\n"
              b"end_head\n")
    with open(d / "sa1.wav", "wb") as f:
        f.write(header.ljust(1024, b" "))
        f.write(pcm.tobytes())
    (d / "sa1.phn").write_text(
        "0 2000 h#\n2000 4000 sh\n4000 6000 iy\n6000 7000 h#\n")
    out = tmp_path / "out"
    prepare_manifest.main(["--in-dir", str(tmp_path / "timit"),
                           "--out-dir", str(out), "--layout", "timit",
                           "--tokenizer", "phone"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["utts"] == 1 and res["vocab_size"] == 63
    rec = json.loads((out / "manifest.jsonl").read_text().splitlines()[0])
    assert len(rec["labels"]) == 4  # h# sh iy h#


def test_prepare_librispeech_layout(tmp_path, capsys):
    d = tmp_path / "ls" / "19" / "198"
    d.mkdir(parents=True)
    _write_wav(d / "19-198-0000.wav", seed=1)
    _write_wav(d / "19-198-0001.wav", seed=2)
    (d / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO THERE\n19-198-0001 GENERAL KENOBI\n")
    out = tmp_path / "out"
    prepare_manifest.main(["--in-dir", str(tmp_path / "ls"),
                           "--out-dir", str(out),
                           "--layout", "librispeech"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["utts"] == 2
