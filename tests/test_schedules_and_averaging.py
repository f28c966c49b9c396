"""LR schedule variants and checkpoint averaging."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from rnn_transducer_tpu.models.config import TrainConfig, TransducerConfig
from rnn_transducer_tpu.train.loop import make_lr_schedule

CFG = TransducerConfig(enc_layers=1, enc_hidden=64, pred_layers=1,
                       pred_hidden=64, embed_dim=32, joint_dim=64,
                       vocab_size=32, input_dim=8)


def _lr(tcfg, step):
    return float(make_lr_schedule(tcfg)(jnp.asarray(step, jnp.int32)))


def test_noam_schedule_shape():
    t = TrainConfig(learning_rate=1e-3, warmup_steps=100)
    t = dataclasses.replace(t, lr_schedule="noam")
    assert abs(_lr(t, 50) - 0.5e-3) < 1e-9   # linear warmup
    assert abs(_lr(t, 100) - 1e-3) < 1e-9    # peak at warmup
    assert abs(_lr(t, 400) - 0.5e-3) < 1e-9   # 1/sqrt(4) decay
    assert _lr(t, 10000) < _lr(t, 400)


def test_step_decay_schedule():
    t = dataclasses.replace(TrainConfig(learning_rate=1e-3, warmup_steps=10),
                            lr_schedule="step_decay", decay_rate=0.5,
                            decay_every=100)
    assert abs(_lr(t, 50) - 1e-3) < 1e-9
    assert abs(_lr(t, 150) - 0.5e-3) < 1e-9
    assert abs(_lr(t, 250) - 0.25e-3) < 1e-9


def test_constant_schedule():
    t = dataclasses.replace(TrainConfig(learning_rate=2e-3, warmup_steps=10),
                            lr_schedule="constant")
    assert abs(_lr(t, 5) - 1e-3) < 1e-9
    assert abs(_lr(t, 10) - 2e-3) < 1e-9
    assert abs(_lr(t, 9999) - 2e-3) < 1e-9


def test_train_cli_accepts_schedule(capsys):
    import train

    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--lr-schedule", "noam", "--max-frames", "40",
                "--max-labels", "5", "--data-parallel", "1"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])


def test_average_checkpoints_is_param_mean(tmp_path, capsys):
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import init_train_state
    from tools.average_checkpoints import average_checkpoints

    tcfg = TrainConfig(batch_size=2)
    ck = str(tmp_path / "ck")
    states = []
    for i, step in enumerate((10, 20, 30)):
        s = init_train_state(jax.random.PRNGKey(i), CFG, tcfg)
        states.append(s)
        ckpt.save_checkpoint(ck, step, dataclasses.asdict(s), model_cfg=CFG,
                             train_config=dataclasses.asdict(tcfg))
    steps, out_step = average_checkpoints(ck, last=2)
    assert steps == [20, 30] and out_step == 31

    template = dataclasses.asdict(
        init_train_state(jax.random.PRNGKey(9), CFG, tcfg))
    restored, got_step = ckpt.restore_checkpoint(ck, template)
    assert got_step == 31
    want = jax.tree.map(lambda a, b: (np.asarray(a) + np.asarray(b)) / 2,
                        states[1].params, states[2].params)
    jax.tree.map(
        lambda a, e: np.testing.assert_allclose(np.asarray(a), e, rtol=1e-6),
        restored["params"], want)
