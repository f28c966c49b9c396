"""recognize.py --data-parallel: offline eval sharded over the device mesh
must produce exactly the single-device results (params replicated, batch
split, no cross-shard state)."""

import json

import pytest

import recognize


def _run(tmp_path, name, extra):
    hyps = tmp_path / f"{name}.jsonl"
    recognize.main(["--config", "smoke", "--data", "synthetic",
                    "--batch-size", "8", "--batches", "2",
                    "--hyps-file", str(hyps)] + extra)
    return [json.loads(l) for l in hyps.read_text().splitlines()]


def test_dp_greedy_matches_single_device(tmp_path):
    want = _run(tmp_path, "g1", ["--mode", "greedy"])
    got = _run(tmp_path, "g4", ["--mode", "greedy", "--data-parallel", "4"])
    assert got == want and len(got) == 16


def test_dp_beam_with_confidence_nbest_matches_single_device(tmp_path):
    extra = ["--mode", "beam", "--beam", "4", "--confidence", "--nbest", "2"]
    want = _run(tmp_path, "b1", extra)
    got = _run(tmp_path, "b4", extra + ["--data-parallel", "4"])
    assert got == want


def test_dp_ctc_greedy_matches_single_device(tmp_path):
    extra = ["--mode", "ctc_greedy"]
    want = _run(tmp_path, "c1", extra)
    got = _run(tmp_path, "c2", extra + ["--data-parallel", "2"])
    assert got == want


def test_dp_guards(tmp_path):
    with pytest.raises(SystemExit, match="divide"):
        recognize.main(["--config", "smoke", "--batch-size", "6",
                        "--data-parallel", "4"])
    with pytest.raises(SystemExit, match="streaming"):
        recognize.main(["--config", "smoke", "--mode", "streaming",
                        "--data-parallel", "2"])
