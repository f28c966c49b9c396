"""BPE subword tokenizer: training, encode/decode, determinism, and the
incremental pair-count trainer vs a brute-force recount oracle."""

import json
import os
import sys
import wave
from collections import Counter

import numpy as np
import pytest

from rnn_transducer_tpu.data.bpe import (
    WORD_MARK,
    BpeTokenizer,
    _learn_merges,
    _word_counts,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks at the quick fox",
    "a lazy brown dog sleeps",
    "the fox is quick and the dog is lazy",
    "quick quick quick said the brown fox",
]


def _learn_merges_oracle(word_counts, n_merges):
    """Brute-force trainer: recount every pair from scratch per merge."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        a, b = best
        merges.append(best)
        for syms in words.values():
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [a + b]
                else:
                    i += 1
    return merges


def test_incremental_trainer_matches_bruteforce_oracle():
    wc = _word_counts(CORPUS)
    assert _learn_merges(wc, 40) == _learn_merges_oracle(wc, 40)


def test_incremental_trainer_oracle_randomized():
    rng = np.random.default_rng(0)
    words = ["".join(rng.choice(list("abcde"), size=rng.integers(1, 9)))
             for _ in range(60)]
    texts = [" ".join(rng.choice(words, size=6)) for _ in range(30)]
    wc = _word_counts(texts)
    assert _learn_merges(wc, 60) == _learn_merges_oracle(wc, 60)


def test_roundtrip_and_vocab_budget():
    tok = BpeTokenizer.train(CORPUS, vocab_size=60)
    assert tok.vocab_size <= 60
    for text in CORPUS:
        ids = tok.encode(text)
        assert all(1 <= i < tok.vocab_size for i in ids)  # 0 = blank
        assert tok.decode(ids) == text
    # frequent words compress below character length
    the = tok.encode("the")
    assert len(the) < len("the") + 1


def test_no_duplicate_symbol_ids():
    """Distinct merges can produce identical strings; the vocab must not
    spend two ids on one string."""
    rng = np.random.default_rng(7)
    words = ["".join(rng.choice(list("abc"), size=rng.integers(2, 6)))
             for _ in range(80)]
    texts = [" ".join(rng.choice(words, size=8)) for _ in range(50)]
    tok = BpeTokenizer.train(texts, vocab_size=120)
    assert len(set(tok.symbols)) == len(tok.symbols)
    for t in texts[:5]:
        assert tok.decode(tok.encode(t)) == t


def test_deterministic_and_save_load(tmp_path):
    t1 = BpeTokenizer.train(CORPUS, vocab_size=50)
    t2 = BpeTokenizer.train(list(CORPUS), vocab_size=50)
    assert t1.symbols == t2.symbols and t1.merges == t2.merges
    p = tmp_path / "bpe.json"
    t1.save(str(p))
    t3 = BpeTokenizer.load(str(p))
    s = "the quick dog"
    assert t3.encode(s) == t1.encode(s)
    assert t3.decode(t3.encode(s)) == s


def test_unknown_chars_dropped_and_casefold():
    tok = BpeTokenizer.train(CORPUS, vocab_size=50)
    assert tok.decode(tok.encode("THE Qüick FOX!")) == "the qick fox"


def test_vocab_too_small_raises():
    with pytest.raises(ValueError):
        BpeTokenizer.train(CORPUS, vocab_size=5)


def test_word_mark_starts_every_word():
    tok = BpeTokenizer.train(CORPUS, vocab_size=80)
    ids = tok.encode("lazy fox")
    toks = [tok.symbols[i - 1] for i in ids]
    rebuilt = "".join(toks).split(WORD_MARK)
    assert [w for w in rebuilt if w] == ["lazy", "fox"]


def _write_wav(path, n_samples=6000, seed=0):
    rng = np.random.default_rng(seed)
    pcm = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def test_prepare_manifest_bpe_train_then_reuse(tmp_path, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import prepare_manifest

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for i, text in enumerate(CORPUS):
        _write_wav(corpus / f"utt{i}.wav", n_samples=6000 + 400 * i, seed=i)
        (corpus / f"utt{i}.txt").write_text(text)

    out = tmp_path / "train"
    prepare_manifest.main(["--in-dir", str(corpus), "--out-dir", str(out),
                           "--tokenizer", "bpe", "--vocab-size", "64"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["utts"] == len(CORPUS) and res["vocab_size"] <= 64
    bpe_path = res["bpe_model"]
    assert os.path.exists(bpe_path)
    tok = BpeTokenizer.load(bpe_path)
    recs = [json.loads(l)
            for l in (out / "manifest.jsonl").read_text().splitlines()]
    assert recs[0]["labels"] == tok.encode(recs[0]["text"])

    # eval set reuses the trained model instead of re-training
    out2 = tmp_path / "eval"
    prepare_manifest.main(["--in-dir", str(corpus), "--out-dir", str(out2),
                           "--tokenizer", "bpe", "--bpe-model", bpe_path])
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["vocab_size"] == res["vocab_size"]
    assert res2["bpe_model"] == bpe_path
