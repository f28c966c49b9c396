"""Error-analysis tooling: align_pair backtrace vs edit_distance,
error_report breakdown accounting, and the tools/wer_report.py CLI."""

import json

from rnn_transducer_tpu.decode.metrics import (align_pair, edit_distance,
                                               error_report)


def test_align_pair_matches_edit_distance():
    import numpy as np
    rng = np.random.default_rng(0)
    for _ in range(25):
        ref = rng.integers(0, 5, size=rng.integers(0, 10)).tolist()
        hyp = rng.integers(0, 5, size=rng.integers(0, 10)).tolist()
        ops = align_pair(ref, hyp)
        errs = sum(1 for op, _r, _h in ops if op != "ok")
        assert errs == edit_distance(ref, hyp), (ref, hyp, ops)
        # ops reconstruct both sequences
        assert [r for op, r, _ in ops if op in ("ok", "sub", "del")] == ref
        assert [h for op, _, h in ops if op in ("ok", "sub", "ins")] == hyp


def test_error_report_breakdown():
    refs = ["the cat sat".split(), [1, 2, 3]]
    hyps = ["the bat sat".split(), [1, 3]]
    rep = error_report(refs, hyps)
    assert abs(rep["wer"] - 2 / 6) < 1e-9
    assert abs(rep["sub_rate"] - 1 / 6) < 1e-9
    assert abs(rep["del_rate"] - 1 / 6) < 1e-9
    assert rep["ins_rate"] == 0.0
    assert rep["sentence_error_rate"] == 1.0
    assert rep["confusions"] == [(("cat", "bat"), 1)]
    assert rep["deletions"] == [(2, 1)]
    # perfect hyps
    rep = error_report(refs, refs)
    assert rep["wer"] == 0.0 and rep["sentence_error_rate"] == 0.0


def test_cli(tmp_path, capsys):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import wer_report
    p = tmp_path / "hyps.jsonl"
    p.write_text(json.dumps({"ref": "a b c", "hyp": "a x c"}) + "\n"
                 + json.dumps({"ref": [1, 2], "hyp": [1, 2]}) + "\n")
    out_json = tmp_path / "rep.json"
    wer_report.main(["--hyps", str(p), "--json", str(out_json)])
    out = capsys.readouterr().out
    assert "WER" in out and "confusions" in out
    rep = json.loads(out_json.read_text())
    assert abs(rep["wer"] - 1 / 5) < 1e-9
