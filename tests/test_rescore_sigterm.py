"""LM N-best rescoring and SIGTERM-graceful checkpointing."""

import json
import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models.lm import (
    LMConfig,
    init_lm_params,
    init_lm_state,
    lm_sequence_logprob,
    lm_step,
    rescore_nbest,
)

V = 8


def _lm():
    cfg = LMConfig(vocab_size=V, embed_dim=8, hidden=16, layers=1,
                   compute_dtype="float32")
    return init_lm_params(jax.random.PRNGKey(5), cfg), cfg


def test_sequence_logprob_matches_stepwise():
    lmp, lmc = _lm()
    labels = jnp.asarray([[3, 1, 4, 2], [2, 2, 0, 0]], jnp.int32)
    lens = jnp.asarray([4, 2], jnp.int32)
    total = lm_sequence_logprob(lmp, lmc, labels, lens)
    for b in range(2):
        state = init_lm_state(lmc, 1)
        tok = jnp.zeros((1,), jnp.int32)
        acc = 0.0
        for u in range(int(lens[b])):
            lp, state = lm_step(lmp, lmc, tok, state)
            acc += float(lp[0, int(labels[b, u])])
            tok = labels[b, u][None]
        np.testing.assert_allclose(float(total[b]), acc, atol=1e-5)


def test_rescore_orders_by_fused_score():
    lmp, lmc = _lm()
    rng = np.random.default_rng(0)
    B, K, U = 2, 4, 5
    tokens = jnp.asarray(rng.integers(1, V, size=(B, K, U)), jnp.int32)
    lens = jnp.asarray(rng.integers(1, U + 1, size=(B, K)), jnp.int32)
    am = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    w = 0.7
    toks2, lens2, scores2 = rescore_nbest(lmp, lmc, tokens, lens, am,
                                          weight=w)
    lm_lp = lm_sequence_logprob(lmp, lmc, tokens.reshape(B * K, U),
                                lens.reshape(B * K)).reshape(B, K)
    want = np.asarray(am) + w * np.asarray(lm_lp)
    for b in range(B):
        order = np.argsort(-want[b])
        np.testing.assert_allclose(np.asarray(scores2[b]), want[b][order],
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(lens2[b]),
                                      np.asarray(lens)[b][order])
    # weight 0: pure am order (beams already sorted by am -> identity)
    t0, l0, s0 = rescore_nbest(lmp, lmc, tokens, lens,
                               -jnp.sort(-am, axis=-1), weight=0.0)
    np.testing.assert_allclose(np.asarray(s0),
                               np.asarray(-jnp.sort(-am, axis=-1)),
                               atol=1e-6)


def test_recognize_cli_lm_rescore(tmp_path, capsys):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import train_lm

    import recognize
    import train

    lm_dir = str(tmp_path / "lm")
    train_lm.main(["--out-dir", lm_dir, "--vocab-size", "32",
                   "--embed-dim", "8", "--hidden", "16", "--layers", "1",
                   "--steps", "2", "--batch-size", "4", "--max-labels", "8",
                   "--log-every", "1"])
    ck = str(tmp_path / "am")
    train.main(["--config", "smoke", "--ckpt-dir", ck, "--steps", "1",
                "--max-frames", "32", "--max-labels", "4",
                "--batch-size", "2", "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    recognize.main(["--mode", "beam", "--ckpt-dir", ck, "--beam", "2",
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "4", "--lm-ckpt", lm_dir,
                    "--lm-rescore", "--lm-weight", "0.5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "beam" and np.isfinite(out["wer"])
    # --timestamps composes with rescoring: the per-token frames are
    # reordered with their beams (rescore_nbest extras=)
    hyps = str(tmp_path / "hyps.jsonl")
    recognize.main(["--mode", "beam", "--ckpt-dir", ck, "--beam", "2",
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "4", "--lm-ckpt", lm_dir,
                    "--lm-rescore", "--lm-weight", "0.5",
                    "--timestamps", "--hyps-file", hyps])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["wer"])
    with open(hyps) as f:
        rec = json.loads(f.readline())
    assert "frames" in rec and len(rec["frames"]) == len(rec["hyp"])


def test_sigterm_checkpoints_and_stops(tmp_path, capsys):
    import train
    from rnn_transducer_tpu.train import checkpoint as ckpt

    ck = str(tmp_path / "ck")
    timer = threading.Timer(
        8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        train.main(["--config", "smoke", "--ckpt-dir", ck,
                    "--steps", "100000", "--max-frames", "16",
                    "--max-labels", "3", "--batch-size", "2",
                    "--eval-every", "0", "--log-every", "1000",
                    "--ckpt-every", "1000000", "--data-parallel", "1"])
    finally:
        timer.cancel()
    err = capsys.readouterr()
    res = json.loads(err.out.strip().splitlines()[-1])
    assert res["steps"] < 100000  # stopped early
    assert ckpt.latest_step(ck) == res["steps"]  # checkpointed at stop
