"""Word-level segment tests (decode/words.py).

Token streams + emission frames + confidences -> word segments grouped by
the tokenizer's own boundary semantics (BPE word marker, char-tokenizer
space, per-phone for TIMIT). Pure host logic; no device work.
"""

import json
import urllib.request

import numpy as np
import pytest

from rnn_transducer_tpu.data.bpe import BpeTokenizer
from rnn_transducer_tpu.data.tokenizer import (CharTokenizer,
                                               PhonemeTokenizer)
from rnn_transducer_tpu.decode.words import (attach_words, token_pieces,
                                             word_segments)

pytestmark = pytest.mark.quick


def test_char_grouping_times_and_conf():
    tok = CharTokenizer()
    text = " hi yo "  # leading/trailing spaces must not create empty words
    ids = tok.encode(text)
    frames = [2, 10, 14, 20, 31, 40, 55]  # one per token (incl. spaces)
    confs = [-.5, -.1, -.2, -.3, -.05, -.4, -.6]
    segs = word_segments(tok, ids, frames, confs, hop_s=0.01)
    assert [s["word"] for s in segs] == ["hi", "yo"]
    # word 1 = tokens h(10) i(14); start = first frame, end = last + 1 hop
    assert segs[0]["start_s"] == pytest.approx(0.10)
    assert segs[0]["end_s"] == pytest.approx(0.15)
    # conf = min over the word's token log-probs (space conf excluded)
    assert segs[0]["conf"] == pytest.approx(-0.2)
    assert segs[1]["start_s"] == pytest.approx(0.31)
    assert segs[1]["end_s"] == pytest.approx(0.41)
    assert segs[1]["conf"] == pytest.approx(-0.4)


def test_char_double_space_and_no_confs():
    tok = CharTokenizer()
    ids = tok.encode("a  b")
    segs = word_segments(tok, ids, [1, 2, 3, 4])
    assert [s["word"] for s in segs] == ["a", "b"]
    assert all("conf" not in s for s in segs)


def test_bpe_word_marker_boundaries():
    corpus = ["the cat sat on the mat", "a cat on a mat"] * 4
    tok = BpeTokenizer.train(corpus, vocab_size=40)
    text = "the cat sat"
    ids = tok.encode(text)
    frames = list(range(0, 4 * len(ids), 4))
    confs = [-0.1 * (k + 1) for k in range(len(ids))]
    segs = word_segments(tok, ids, frames, confs, hop_s=0.01)
    assert [s["word"] for s in segs] == ["the", "cat", "sat"]
    # reconstruction must agree with the tokenizer's own decode
    assert " ".join(s["word"] for s in segs) == tok.decode(ids).strip()
    # segments tile the token stream in order: starts non-decreasing,
    # each word's end after its start
    starts = [s["start_s"] for s in segs]
    assert starts == sorted(starts)
    assert all(s["end_s"] > s["start_s"] for s in segs)
    # min-conf: the last word's conf is the min of its tokens = the
    # last token's conf (confs strictly decreasing)
    assert segs[-1]["conf"] == pytest.approx(confs[-1])


def test_phoneme_per_token_segments():
    tok = PhonemeTokenizer()
    ids = tok.encode(["aa", "b", "sh"])
    segs = word_segments(tok, ids, [5, 9, 13], [-1.0, -2.0, -3.0])
    assert [s["word"] for s in segs] == ["aa", "b", "sh"]
    assert [s["start_s"] for s in segs] == [0.05, 0.09, 0.13]
    assert [s["conf"] for s in segs] == [-1.0, -2.0, -3.0]


def test_unknown_ids_skipped():
    tok = CharTokenizer()
    ids = tok.encode("ab")
    segs = word_segments(tok, [ids[0], 9999, ids[1]], [1, 2, 3])
    assert [s["word"] for s in segs] == ["ab"]


def test_token_pieces_tables():
    tok = CharTokenizer()
    assert token_pieces(tok, tok.encode("a b")) == ["a", " ", "b"]
    with pytest.raises(TypeError):
        token_pieces(object(), [1])


def test_attach_words_gating():
    tok = CharTokenizer()
    out = {"tokens": tok.encode("ab"), "frames": [3, 7],
           "confidence": [-.1, -.2]}
    attach_words(out, tok)
    assert out["words"][0]["word"] == "ab"
    assert out["words"][0]["conf"] == pytest.approx(-0.2)
    # no frames -> no-op; no tokenizer -> no-op
    out2 = {"tokens": [1, 2]}
    assert "words" not in attach_words(out2, tok)
    assert "words" not in attach_words({"tokens": [1], "frames": [0]}, None)


def test_words_in_serving_payloads():
    """HTTP /recognize responses carry word segments grouped from the
    payload's own frames/confidence sidecars."""
    import jax

    from rnn_transducer_tpu.models.config import TransducerConfig
    from rnn_transducer_tpu.models.transducer import init_params
    from rnn_transducer_tpu.serve import BatchingEngine, http_server

    cfg = TransducerConfig(enc_layers=1, enc_hidden=32, pred_layers=1,
                           pred_hidden=32, embed_dim=16, joint_dim=32,
                           vocab_size=16, input_dim=8,
                           compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    tok = CharTokenizer(alphabet=" abcdefghijklmn")  # 15 chars + blank = 16
    offline = BatchingEngine(params, cfg, max_batch=2,
                             frame_buckets=(16,), window_ms=1.0)
    srv = http_server("127.0.0.1", 0, offline, None, tok,
                      frame_hop_s=0.02)
    import threading
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        feats = np.random.default_rng(0).normal(
            size=(12, cfg.input_dim)).astype(np.float32)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recognize",
            data=json.dumps({"feats": feats.tolist()}).encode(),
            method="POST")
        out = json.loads(urllib.request.urlopen(req).read())
        assert "words" in out
        # every word's times are consistent with the 20 ms hop
        for w in out["words"]:
            assert w["end_s"] > w["start_s"] >= 0.0
        # words reconstruct the text's whitespace split
        assert [w["word"] for w in out["words"]] == out["text"].split()
    finally:
        srv.shutdown()
        offline.close()
