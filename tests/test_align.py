"""Forced alignment (ops/rnnt_align.py) vs brute-force best-path search,
plus structural properties and the model-level wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.ops.rnnt_align import (
    backtrace_emit_frames,
    rnnt_forced_align,
    rnnt_viterbi,
)
from rnn_transducer_tpu.ops.rnnt_loss import _gather_label_logprobs, rnnt_loss


def _brute_best(lp_blank, lp_y, T, U):
    """Enumerate every monotonic path (single utterance); return
    (best score, emit_frames list)."""
    best = {"score": -np.inf, "emits": None}

    def go(t, u, acc, emits):
        if t == T - 1 and u == U:
            s = acc + lp_blank[t, u]
            if s > best["score"]:
                best["score"] = s
                best["emits"] = list(emits)
            return
        if u < U:  # emit label u at frame t
            go(t, u + 1, acc + lp_y[t, u], emits + [t])
        if t + 1 < T:  # blank: advance a frame
            go(t + 1, u, acc + lp_blank[t, u], emits)

    go(0, 0, 0.0, [])
    return best["score"], best["emits"]


def test_viterbi_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, T, U = 3, 5, 3
    lp_blank = rng.normal(size=(B, T, U + 1)).astype(np.float32)
    lp_y = rng.normal(size=(B, T, U + 1)).astype(np.float32)
    frame_lens = np.array([5, 4, 3], np.int32)
    label_lens = np.array([3, 2, 3], np.int32)
    score, K = rnnt_viterbi(jnp.asarray(lp_blank), jnp.asarray(lp_y),
                            jnp.asarray(frame_lens), jnp.asarray(label_lens))
    emits = backtrace_emit_frames(K, frame_lens, label_lens)
    for b in range(B):
        want_s, want_e = _brute_best(lp_blank[b], lp_y[b],
                                     int(frame_lens[b]),
                                     int(label_lens[b]))
        np.testing.assert_allclose(float(score[b]), want_s, rtol=1e-5)
        assert emits[b, : label_lens[b]].tolist() == want_e, (
            b, emits[b], want_e)
        assert (emits[b, label_lens[b]:] == -1).all()


def test_viterbi_score_bounded_by_total():
    """max over paths <= logsumexp over paths (= -loss)."""
    rng = np.random.default_rng(1)
    B, T, U, V = 2, 6, 4, 8
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    fl = jnp.asarray([6, 5], jnp.int32)
    ll = jnp.asarray([4, 2], jnp.int32)
    emits, score = rnnt_forced_align(logits, labels, fl, ll)
    total = -rnnt_loss(logits, labels, fl, ll, 0)
    assert (np.asarray(score) <= np.asarray(total) + 1e-5).all()
    # emit frames monotonic and within frame range
    for b in range(B):
        e = emits[b, : int(ll[b])]
        assert (np.diff(e) >= 0).all()
        assert e.min() >= 0 and e.max() < int(fl[b])


def test_align_cli(tmp_path, capsys):
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import align as align_cli

    import train

    # tiny manifest: .npy feature files + token labels
    rng = np.random.default_rng(3)
    feats_dir = tmp_path / "feats"
    feats_dir.mkdir()
    man = tmp_path / "manifest.jsonl"
    with open(man, "w") as f:
        for i in range(3):
            fp = feats_dir / f"u{i}.npy"
            np.save(fp, rng.normal(size=(20 + 4 * i, 80)).astype(np.float32))
            labs = rng.integers(1, 32, size=3 + i).tolist()
            f.write(json.dumps({"feats": str(fp), "labels": labs}) + "\n")

    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--steps", "1", "--batch-size", "2",
                "--data", f"manifest:{man}", "--ckpt-dir", ck,
                "--eval-every", "0", "--data-parallel", "1"])
    capsys.readouterr()

    out = tmp_path / "align.jsonl"
    align_cli.main(["--ckpt-dir", ck, "--manifest", str(man),
                    "--out", str(out), "--batch-size", "2"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert res["utts"] == len(recs) > 0
    for r in recs:
        assert len(r["emit_frames"]) == len(r["emit_seconds"]) > 0
        assert all(b >= a for a, b in zip(r["emit_frames"],
                                          r["emit_frames"][1:]))
        assert np.isfinite(r["score"])


def test_model_level_align():
    from rnn_transducer_tpu.models import transducer as m
    from rnn_transducer_tpu.models.config import TransducerConfig
    from rnn_transducer_tpu.ops.rnnt_align import align

    cfg = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                           pred_hidden=16, embed_dim=8, joint_dim=16,
                           vocab_size=8, input_dim=4,
                           compute_dtype="float32")
    params = m.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(2, 10, 4)), jnp.float32)
    fl = jnp.asarray([10, 7], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 8, size=(2, 3)), jnp.int32)
    ll = jnp.asarray([3, 2], jnp.int32)
    emits, score = align(params, cfg, feats, fl, labels, ll)
    assert emits.shape == (2, 3)
    assert np.isfinite(np.asarray(score)).all()
    assert (emits[0, :3] >= 0).all() and (emits[1, 2] == -1)
