"""Round-2 feature tests: bucketing valid counts, zero-length-utterance
loss guard, self-describing checkpoints, CTC pretraining CLI, JSONL
metrics logging, dev-manifest holdout."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import recognize
import train
from rnn_transducer_tpu.data.bucketing import bucket_stream
from rnn_transducer_tpu.ops.rnnt_loss import rnnt_loss
from rnn_transducer_tpu.ops.rnnt_loss_pallas import rnnt_loss_pallas


def _examples(n, rng, t_range=(5, 20), u_range=(1, 4), dim=8):
    for _ in range(n):
        T = int(rng.integers(*t_range))
        U = int(rng.integers(*u_range))
        yield (rng.normal(size=(T, dim)).astype(np.float32),
               rng.integers(1, 9, size=U).astype(np.int32))


def test_flush_pads_cyclically_and_reports_valid():
    rng = np.random.default_rng(0)
    batches = list(bucket_stream(_examples(3, rng), [(32, 8)], batch_size=4,
                                 with_valid=True))
    assert len(batches) == 1
    feats, fl, labels, ll, n_valid = batches[0]
    assert n_valid == 3
    # the padding row cycles through the real items (index 0 first)
    assert np.array_equal(feats[3, : fl[3]], feats[0, : fl[0]])
    # a fuller partial batch should not repeat only item 0
    batches = list(bucket_stream(_examples(2, rng), [(32, 8)], batch_size=4,
                                 with_valid=True))
    feats, fl, labels, ll, n_valid = batches[0]
    assert n_valid == 2
    assert np.array_equal(feats[2, : fl[2]], feats[0, : fl[0]])
    assert np.array_equal(feats[3, : fl[3]], feats[1, : fl[1]])


def test_bucket_stream_default_yields_4_tuples():
    rng = np.random.default_rng(1)
    for batch in bucket_stream(_examples(8, rng), [(32, 8)], batch_size=4):
        assert len(batch) == 4


@pytest.mark.parametrize("impl", [rnnt_loss, rnnt_loss_pallas])
def test_zero_frame_utterance_loss_and_grad_are_zero(impl):
    rng = np.random.default_rng(2)
    B, T, U, V = 3, 6, 3, 8
    logits = jnp.asarray(rng.normal(size=(B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    frame_lens = jnp.asarray([0, T, 4], jnp.int32)
    label_lens = jnp.asarray([2, U, 1], jnp.int32)

    def total(lg):
        return jnp.sum(impl(lg, labels, frame_lens, label_lens, 0))

    loss = impl(logits, labels, frame_lens, label_lens, 0)
    grad = jax.grad(total)(logits)
    assert np.all(np.isfinite(np.asarray(loss)))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(loss[0]) == 0.0
    assert float(loss[1]) > 0.0
    np.testing.assert_array_equal(np.asarray(grad[0]), 0.0)
    assert float(jnp.abs(grad[1]).max()) > 0.0


def test_zero_frame_utterance_fused():
    from rnn_transducer_tpu.ops.rnnt_joint_fused import rnnt_loss_fused
    rng = np.random.default_rng(3)
    B, T, U, J, V = 2, 6, 3, 16, 8
    f = jnp.asarray(rng.normal(size=(B, T, J)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, U + 1, J)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(J, V)) * 0.1, jnp.float32)
    b = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, size=(B, U)), jnp.int32)
    frame_lens = jnp.asarray([0, T], jnp.int32)
    label_lens = jnp.asarray([1, U], jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda *a: jnp.sum(rnnt_loss_fused(*a, labels, frame_lens,
                                           label_lens, 0)),
        argnums=(0, 1, 2, 3))(f, g, w, b)
    per_utt = rnnt_loss_fused(f, g, w, b, labels, frame_lens, label_lens, 0)
    assert float(per_utt[0]) == 0.0 and float(per_utt[1]) > 0.0
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
    np.testing.assert_array_equal(np.asarray(grads[0][0]), 0.0)  # df row 0


def test_checkpoint_meta_roundtrip_and_recognize_from_ckpt_alone(
        tmp_path, capsys):
    ck = str(tmp_path / "ck")
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--ckpt-dir", ck, "--data-parallel", "1",
                "--max-frames", "40", "--max-labels", "5"])
    from rnn_transducer_tpu.train import checkpoint as ckpt
    cfg = ckpt.load_model_config(ck)
    assert cfg is not None and cfg.enc_hidden == 64 and cfg.vocab_size == 32
    capsys.readouterr()
    # recognize with NO --config: model comes from meta.json
    recognize.main(["--mode", "greedy", "--ckpt-dir", ck,
                    "--batch-size", "2", "--batches", "1",
                    "--max-symbols", "8"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["wer"] >= 0
    # mismatched explicit --config errors out
    with pytest.raises(SystemExit):
        recognize.main(["--config", "greedy_smoke", "--ckpt-dir", ck,
                        "--batch-size", "2", "--batches", "1"])


def test_ctc_pretrain_two_phase_schedule(tmp_path, capsys):
    logf = str(tmp_path / "metrics.jsonl")
    train.main(["--config", "smoke", "--steps", "4", "--batch-size", "2",
                "--ctc-pretrain-steps", "2", "--log-every", "1",
                "--log-file", logf, "--eval-every", "0",
                "--max-frames", "40", "--max-labels", "5",
                "--data-parallel", "1"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_loss"])
    records = [json.loads(l) for l in open(logf)]
    phases = [r["phase"] for r in records if "phase" in r]
    assert phases == ["ctc", "ctc", "rnnt", "rnnt"]
    assert all(np.isfinite(r["loss"]) for r in records if "loss" in r)


def test_dev_manifest_holdout(tmp_path, capsys):
    rng = np.random.default_rng(4)
    recs = []
    for i in range(6):
        T = int(rng.integers(20, 40))
        feats = rng.normal(size=(T, 80)).astype(np.float32)
        path = tmp_path / f"f{i}.npy"
        np.save(path, feats)
        recs.append({"feats": str(path),
                     "labels": rng.integers(1, 30, size=3).tolist()})
    man = tmp_path / "train.jsonl"
    man.write_text("\n".join(json.dumps(r) for r in recs))
    logf = str(tmp_path / "metrics.jsonl")
    train.main(["--config", "smoke", "--steps", "2", "--batch-size", "2",
                "--data", f"manifest:{man}", "--data-parallel", "1",
                "--eval-every", "1", "--log-file", logf])
    records = [json.loads(l) for l in open(logf)]
    dev = [r for r in records if "dev_loss" in r]
    assert dev and all(np.isfinite(r["dev_loss"]) for r in dev)
    # held-out dev batch == first 2 manifest examples; training stream
    # skips them, so each epoch has (6-2)/2 = 2 batches
    from rnn_transducer_tpu.data.manifest import (manifest_batches,
                                                  manifest_dev_batch)
    from rnn_transducer_tpu.models.config import TrainConfig
    cfg = train.get_model_config("smoke")
    tcfg = TrainConfig(batch_size=2)
    dev_batch = manifest_dev_batch(str(man), cfg, tcfg)
    assert dev_batch is not None and dev_batch[4] == 2
    first_train = next(manifest_batches(str(man), cfg, tcfg, skip_first=2))
    # the first training batch must not contain the dev utterances
    assert not np.allclose(first_train[0][0, : dev_batch[1][0]],
                           dev_batch[0][0, : dev_batch[1][0]])
