"""Tokenizer metadata rides in checkpoints: train --tokenizer stores it,
recognize emits text hypotheses + word-level WER from --ckpt-dir alone."""

import json

import numpy as np
import pytest

import recognize
import train
from rnn_transducer_tpu.data.tokenizer import (
    BpeTokenizer,
    decode_to_text,
    tokenizer_from_meta,
    tokenizer_from_spec,
    tokenizer_to_meta,
)

SMALL = ["--max-frames", "32", "--max-labels", "4", "--batch-size", "2",
         "--log-every", "1", "--eval-every", "0", "--steps", "1",
         "--data-parallel", "1"]


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_meta_roundtrip_all_kinds(tmp_path):
    bpe = BpeTokenizer.train(["the cat sat", "the dog sat"], vocab_size=24)
    p = tmp_path / "bpe.json"
    bpe.save(str(p))
    for spec in ("char", "phone", f"bpe:{p}"):
        tok = tokenizer_from_spec(spec)
        tok2 = tokenizer_from_meta(tokenizer_to_meta(tok))
        assert tok2.vocab_size == tok.vocab_size
        sample = ["aa", "b"] if spec == "phone" else "the cat"
        assert tok2.encode(sample) == tok.encode(sample)
        assert decode_to_text(tok2, tok2.encode(sample)) in (
            "aa b", "the cat")


def test_train_stores_tokenizer_recognize_emits_text(tmp_path, capsys):
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--ckpt-dir", ck,
                "--tokenizer", "char"] + SMALL)
    meta = json.loads((tmp_path / "ck" / "meta.json").read_text())
    assert meta["tokenizer"]["kind"] == "char"

    hyps_file = tmp_path / "hyps.jsonl"
    recognize.main(["--mode", "greedy", "--ckpt-dir", ck,
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "4", "--hyps-file", str(hyps_file)])
    out = _last_json(capsys)
    assert "word_wer" in out and np.isfinite(out["word_wer"])
    recs = [json.loads(l) for l in hyps_file.read_text().splitlines()]
    assert len(recs) == 2
    assert all(isinstance(r["hyp"], str) and isinstance(r["ref"], str)
               for r in recs)


def test_tokenizer_vocab_larger_than_model_errors(tmp_path):
    # smoke model vocab is 32; char tokenizer needs 29 (fits), a big BPE
    # model must be rejected.
    bpe = BpeTokenizer(
        [f"tok{i}" for i in range(40)], [])
    p = tmp_path / "big.json"
    bpe.save(str(p))
    with pytest.raises(SystemExit, match="vocab"):
        train.main(["--config", "smoke", "--tokenizer", f"bpe:{p}",
                    "--ckpt-dir", str(tmp_path / "ck")] + SMALL)
