"""CLI end-to-end: train with --model-parallel (tp/sp/pp), checkpoint,
resume same-topology, and decode the parallel checkpoint with recognize.py.
Runs on the virtual 8-device CPU mesh."""

import dataclasses
import json

import jax
import numpy as np
import pytest

import recognize
import train
from rnn_transducer_tpu.models.config import TransducerConfig

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

SMALL = ["--max-frames", "32", "--max-labels", "4", "--batch-size", "4",
         "--log-every", "1", "--eval-every", "0"]


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@needs8
@pytest.mark.parametrize("mode,mp", [("tp", 4), ("sp", 4), ("pp", 2),
                                     ("ep", 4)])
def test_train_cli_model_parallel(mode, mp, tmp_path, capsys):
    cfg = "smoke"
    if mode == "pp":  # pp needs enc_layers % stages == 0; smoke has 1 layer
        c = TransducerConfig(enc_layers=2, enc_hidden=64, pred_layers=1,
                             pred_hidden=64, embed_dim=32, joint_dim=64,
                             vocab_size=32, input_dim=80)
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(dataclasses.asdict(c)))
        cfg = str(cfg_path)
    elif mode == "ep":  # ep needs an MoE joint
        c = TransducerConfig(enc_layers=1, enc_hidden=64, pred_layers=1,
                             pred_hidden=64, embed_dim=32, joint_dim=64,
                             vocab_size=32, input_dim=80, joint_experts=4,
                             joint_expert_hidden=64)
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(dataclasses.asdict(c)))
        cfg = str(cfg_path)
    extra = ["--microbatches", "2"] if mode == "pp" else []
    # dropout + a 1-step CTC pretraining phase ride along: both are
    # threaded through every model-parallel mode
    train.main(["--config", cfg, "--steps", "2",
                "--data-parallel", "2", "--model-parallel", str(mp),
                "--parallel-mode", mode, "--dropout", "0.1",
                "--ctc-pretrain-steps", "1"] + extra + SMALL)
    res = _last_json(capsys)
    assert res["steps"] == 2 and np.isfinite(res["final_loss"])


@needs8
def test_tp_ckpt_resume_and_recognize(tmp_path, capsys):
    ck = str(tmp_path / "ck")
    common = ["--config", "smoke", "--data-parallel", "2",
              "--model-parallel", "4", "--parallel-mode", "tp",
              "--ckpt-dir", ck] + SMALL
    train.main(common + ["--steps", "2"])
    train.main(common + ["--steps", "3", "--resume"])
    res = _last_json(capsys)
    assert res["steps"] == 3

    # topology mismatch on resume is an error
    with pytest.raises(SystemExit, match="topology"):
        train.main(["--config", "smoke", "--data-parallel", "4",
                    "--model-parallel", "2", "--parallel-mode", "tp",
                    "--ckpt-dir", ck, "--resume", "--steps", "4"] + SMALL)

    # recognize.py merges the sharded checkpoint into plain params
    recognize.main(["--mode", "greedy", "--ckpt-dir", ck,
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "8"])
    out = _last_json(capsys)
    assert out["mode"] == "greedy" and out["rtf"] > 0
