"""StableHLO export (tools/export_model.py): roundtrip equality with the
live decode, and the CLI."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import export_model

from rnn_transducer_tpu.decode.greedy import recognize_greedy
from rnn_transducer_tpu.models import transducer as m
from rnn_transducer_tpu.models.config import TransducerConfig

CFG = TransducerConfig(enc_layers=1, enc_hidden=16, pred_layers=1,
                       pred_hidden=16, embed_dim=8, joint_dim=16,
                       vocab_size=8, input_dim=4, compute_dtype="float32")


def test_export_roundtrip_matches_live(tmp_path):
    params = m.init_params(jax.random.PRNGKey(0), CFG)
    blob, meta = export_model.export_decode(
        params, CFG, mode="greedy", batch=2, frames=12, max_symbols=6)
    assert meta["model_config"]["vocab_size"] == 8
    path = tmp_path / "greedy.stablehlo"
    path.write_bytes(blob)

    fn = export_model.load_exported(str(path))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 12, 4)), jnp.float32)
    lens = jnp.asarray([12, 9], jnp.int32)
    toks_e, lens_e = fn(params, feats, lens)
    toks_l, lens_l = recognize_greedy(params, CFG, feats, lens,
                                      max_symbols=6)
    np.testing.assert_array_equal(np.asarray(toks_e), np.asarray(toks_l))
    np.testing.assert_array_equal(np.asarray(lens_e), np.asarray(lens_l))


def test_export_cli(tmp_path, capsys):
    import train

    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--ckpt-dir", ck, "--steps", "1",
                "--max-frames", "16", "--max-labels", "3",
                "--batch-size", "2", "--eval-every", "0",
                "--data-parallel", "1"])
    capsys.readouterr()
    out = str(tmp_path / "export")
    export_model.main(["--ckpt-dir", ck, "--out-dir", out,
                       "--batch", "2", "--frames", "16",
                       "--max-symbols", "4"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(res["out"]) and res["bytes"] > 0
    meta = json.loads(
        (tmp_path / "export" / "export_meta.json").read_text())
    assert meta["mode"] == "greedy" and meta["checkpoint_step"] == 1


def test_export_streaming_step_matches_live_engine(tmp_path):
    """The exported masked chunk step drives a StreamingEngine to the
    same results as the live-jitted one (VERDICT r2: serving cold-start)."""
    from rnn_transducer_tpu.serve import StreamingEngine

    params = m.init_params(jax.random.PRNGKey(1), CFG)
    blob, meta = export_model.export_streaming(
        params, CFG, mode="streaming_greedy", slots=2, chunk_frames=4,
        max_symbols=6)
    path = tmp_path / "streaming_greedy.stablehlo"
    path.write_bytes(blob)
    step = export_model.load_exported(str(path))

    rng = np.random.default_rng(3)
    feats = rng.normal(size=(8, CFG.input_dim)).astype(np.float32)

    def run(exported):
        eng = StreamingEngine(params, CFG, slots=2, chunk_frames=4,
                              max_symbols=6, window_ms=1.0,
                              exported_step=step if exported else None)
        try:
            sid = eng.open_session()
            for t0 in range(0, 8, 4):
                out = eng.feed(sid, feats[t0: t0 + 4])
            eng.close_session(sid)
            return out
        finally:
            eng.close()

    live, exp = run(False), run(True)
    assert live == exp
    assert meta["slots"] == 2
