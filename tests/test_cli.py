"""End-to-end CLI tests: train -> checkpoint -> resume -> recognize."""

import json

import numpy as np
import pytest

import recognize
import train


def test_train_cli_smoke(capsys):
    train.main(["--config", "smoke", "--steps", "3", "--batch-size", "2",
                "--max-frames", "40", "--max-labels", "5",
                "--log-every", "1", "--data-parallel", "1"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["steps"] == 3
    assert np.isfinite(res["final_loss"])


def test_train_ckpt_resume_roundtrip(tmp_path, capsys):
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--ckpt-dir", ck, "--data-parallel", "1",
                "--max-frames", "40", "--max-labels", "5"])
    train.main(["--config", "smoke", "--steps", "4", "--batch-size", "2",
                "--ckpt-dir", ck, "--resume", "--data-parallel", "1",
                "--max-frames", "40", "--max-labels", "5"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["steps"] == 4


def test_train_cli_data_parallel(capsys):
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "8",
                "--data-parallel", "8", "--max-frames", "40",
                "--max-labels", "5"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])


@pytest.mark.parametrize("mode", ["greedy", "beam", "streaming", "streaming_beam"])
def test_recognize_cli_modes(mode, capsys):
    argv = ["--config", "smoke", "--mode", mode, "--batch-size", "2",
            "--batches", "1", "--max-symbols", "16", "--beam", "3",
            "--expansions", "2", "--chunk-frames", "8"]
    recognize.main(argv)
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["mode"] == mode
    assert 0.0 <= res["wer"]
    assert res["rtf"] > 0
    assert res["p50_latency_s"] > 0


def test_manifest_pipeline(tmp_path, capsys):
    """Write a tiny feats manifest, train 2 steps, then decode it."""
    rng = np.random.default_rng(0)
    recs = []
    for i in range(8):
        T = int(rng.integers(20, 40))
        U = int(rng.integers(2, 5))
        feats = rng.normal(size=(T, 80)).astype(np.float32)
        path = tmp_path / f"f{i}.npy"
        np.save(path, feats)
        recs.append({"feats": str(path),
                     "labels": rng.integers(1, 30, size=U).tolist()})
    man = tmp_path / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in recs))
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "4",
                "--data", f"manifest:{man}", "--data-parallel", "1"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])
    recognize.main(["--config", "smoke", "--mode", "greedy",
                    "--data", f"manifest:{man}", "--batch-size", "4",
                    "--max-symbols", "8"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["wer"] >= 0


def test_recognize_nbest_output(tmp_path, capsys):
    """--nbest writes top-N hypotheses + scores per utterance (beam and
    ctc-free path smoke)."""
    import recognize
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--ckpt-dir", ck, "--steps", "1",
                "--max-frames", "32", "--max-labels", "4",
                "--batch-size", "2", "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    hyps = str(tmp_path / "h.jsonl")
    recognize.main(["--mode", "beam", "--ckpt-dir", ck, "--beam", "3",
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "4", "--nbest", "3",
                    "--hyps-file", hyps])
    capsys.readouterr()
    with open(hyps) as f:
        rec = json.loads(f.readline())
    assert "nbest" in rec and 1 <= len(rec["nbest"]) <= 3
    assert rec["nbest"][0]["hyp"] == rec["hyp"]  # top-1 consistent
    scores = [e["score"] for e in rec["nbest"]]
    assert scores == sorted(scores, reverse=True)


def test_recognize_confidence_output(tmp_path, capsys):
    """--confidence writes per-token emission log-probs (greedy + beam)."""
    import recognize
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--ckpt-dir", ck, "--steps", "1",
                "--max-frames", "32", "--max-labels", "4",
                "--batch-size", "2", "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    for mode in ("greedy", "beam"):
        hyps = str(tmp_path / f"h_{mode}.jsonl")
        recognize.main(["--mode", mode, "--ckpt-dir", ck, "--beam", "2",
                        "--batch-size", "2", "--batches", "1",
                        "--max-symbols", "4", "--confidence",
                        "--hyps-file", hyps])
        capsys.readouterr()
        with open(hyps) as f:
            rec = json.loads(f.readline())
        assert "confs" in rec and len(rec["confs"]) == len(rec["hyp"])
        assert all(c <= 1e-5 for c in rec["confs"])  # log-probs
