"""tools/import_torch_ckpt.py: a torch RNN-T state_dict becomes a working
tpu-rnnt checkpoint — config inferred from shapes, weights mapped with torch
semantics (w.T, b_ih+b_hh), meta.json self-describing — with end-to-end
logits parity against the torch model as the acceptance bar."""

import dataclasses
import json

import numpy as np
import pytest
import torch

from tests.test_torch_parity import UNI, BI, TorchTransducerRef, _batch

from tools.import_torch_ckpt import (classify, import_torch_checkpoint,
                                     infer_config, load_state_dict, main)


def _save(tmp_path, obj, name="model.pt"):
    p = tmp_path / name
    torch.save(obj, p)
    return str(p)


def _import_and_load(tmp_path, ckpt_path, **kw):
    from rnn_transducer_tpu.train import checkpoint as ckpt

    out = str(tmp_path / "ck")
    cfg, _ = import_torch_checkpoint(ckpt_path, out,
                                     compute_dtype="float32", **kw)
    params, cfg2, step, meta = ckpt.load_plain_params(out)
    assert cfg2 == cfg and "imported_from" in meta
    return params, cfg


def _assert_forward_parity(tm, params, cfg):
    import jax.numpy as jnp

    from rnn_transducer_tpu.models import transducer as m

    feats, frame_lens, labels, label_lens = _batch(cfg)
    with torch.no_grad():
        want, want_lens = tm(torch.tensor(feats), torch.tensor(frame_lens),
                             torch.tensor(labels.astype(np.int64)))
    got, got_lens = m.forward(params, cfg, jnp.asarray(feats),
                              jnp.asarray(frame_lens), jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(got_lens), want_lens.numpy())
    for b in range(feats.shape[0]):
        Tb = int(got_lens[b])
        np.testing.assert_allclose(np.asarray(got)[b, :Tb],
                                   want.numpy()[b, :Tb],
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("ref_cfg", [UNI, BI], ids=["uni_tr2", "bi"])
def test_import_roundtrip_logits_parity(tmp_path, ref_cfg):
    """state_dict -> import (config INFERRED, incl. time_reduction and
    bidirectionality) -> load_plain_params -> logits == torch model."""
    torch.manual_seed(0)
    tm = TorchTransducerRef(ref_cfg)
    params, cfg = _import_and_load(tmp_path, _save(tmp_path, tm.state_dict()))
    assert cfg == dataclasses.replace(ref_cfg, compute_dtype="float32")
    _assert_forward_parity(tm, params, cfg)


def test_import_unwraps_nesting_and_module_prefix(tmp_path):
    """Lightning-style {"state_dict": ...} nesting + nn.DataParallel's
    "module." prefix + non-tensor sidecar entries are all handled."""
    torch.manual_seed(1)
    tm = TorchTransducerRef(UNI)
    wrapped = {"epoch": 7, "optimizer": {"lr": [0.1]},
               "state_dict": {f"module.{k}": v
                              for k, v in tm.state_dict().items()}}
    params, cfg = _import_and_load(tmp_path, _save(tmp_path, wrapped))
    _assert_forward_parity(tm, params, cfg)


def test_import_multilayer_lstm_module(tmp_path):
    """A single multi-layer nn.LSTM (weight_ih_l0/l1 in one module) and NO
    name hints anywhere: the encoder/predictor split falls back to the
    embed_dim chain heuristic."""
    cfg = dataclasses.replace(UNI, time_reduction=1, enc_layers=2,
                              compute_dtype="float32")

    class Plain(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.a = torch.nn.LSTM(cfg.input_dim, cfg.enc_hidden,
                                   num_layers=2, batch_first=True)
            self.b = torch.nn.Embedding(cfg.vocab_size, cfg.embed_dim)
            self.c = torch.nn.LSTM(cfg.embed_dim, cfg.pred_hidden,
                                   batch_first=True)
            self.d = torch.nn.Linear(cfg.enc_hidden, cfg.joint_dim)
            self.e = torch.nn.Linear(cfg.pred_hidden, cfg.joint_dim)
            self.f = torch.nn.Linear(cfg.joint_dim, cfg.vocab_size)

    torch.manual_seed(2)
    pm = Plain()
    sd = load_state_dict(_save(tmp_path, pm.state_dict()))
    comp = classify(sd)
    got = infer_config(comp, compute_dtype="float32")
    assert got == cfg
    # same weights through the hint-carrying reference module = same params
    tm = TorchTransducerRef(cfg)
    tm.enc_layers[0].weight_ih_l0.data = pm.a.weight_ih_l0.data
    tm.enc_layers[0].weight_hh_l0.data = pm.a.weight_hh_l0.data
    tm.enc_layers[0].bias_ih_l0.data = pm.a.bias_ih_l0.data
    tm.enc_layers[0].bias_hh_l0.data = pm.a.bias_hh_l0.data
    tm.enc_layers[1].weight_ih_l0.data = pm.a.weight_ih_l1.data
    tm.enc_layers[1].weight_hh_l0.data = pm.a.weight_hh_l1.data
    tm.enc_layers[1].bias_ih_l0.data = pm.a.bias_ih_l1.data
    tm.enc_layers[1].bias_hh_l0.data = pm.a.bias_hh_l1.data
    tm.embed.weight.data = pm.b.weight.data
    tm.pred_layers[0].weight_ih_l0.data = pm.c.weight_ih_l0.data
    tm.pred_layers[0].weight_hh_l0.data = pm.c.weight_hh_l0.data
    tm.pred_layers[0].bias_ih_l0.data = pm.c.bias_ih_l0.data
    tm.pred_layers[0].bias_hh_l0.data = pm.c.bias_hh_l0.data
    tm.enc_proj.weight.data, tm.enc_proj.bias.data = (pm.d.weight.data,
                                                      pm.d.bias.data)
    tm.pred_proj.weight.data, tm.pred_proj.bias.data = (pm.e.weight.data,
                                                        pm.e.bias.data)
    tm.out.weight.data, tm.out.bias.data = pm.f.weight.data, pm.f.bias.data
    params, cfg2 = _import_and_load(tmp_path, _save(tmp_path,
                                                    pm.state_dict(), "p.pt"))
    assert cfg2 == cfg
    _assert_forward_parity(tm, params, cfg)


def test_import_ambiguous_linears_error_and_map_json(tmp_path):
    """joint_dim == enc_out == pred_hidden with hint-free linear names is
    ambiguous -> hard error naming the candidates; --map-json resolves it."""
    d = 16
    cfg = dataclasses.replace(UNI, enc_hidden=d, pred_hidden=d, joint_dim=d,
                              embed_dim=d, time_reduction=1,
                              compute_dtype="float32")

    class Amb(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.stack_a = torch.nn.LSTM(cfg.input_dim, d, num_layers=2,
                                         batch_first=True)
            self.table = torch.nn.Embedding(cfg.vocab_size, d)
            self.stack_b = torch.nn.LSTM(d, d, batch_first=True)
            self.fc1 = torch.nn.Linear(d, d)
            self.fc2 = torch.nn.Linear(d, d)
            self.fc3 = torch.nn.Linear(d, cfg.vocab_size)

    torch.manual_seed(3)
    am = Amb()
    path = _save(tmp_path, am.state_dict())
    with pytest.raises(SystemExit, match="enc_proj"):
        import_torch_checkpoint(path, str(tmp_path / "ck_fail"))
    mp = tmp_path / "map.json"
    mp.write_text(json.dumps({"encoder": ["stack_a"],
                              "predictor": ["stack_b"], "embed": "table",
                              "enc_proj": "fc1", "pred_proj": "fc2",
                              "out": "fc3"}))
    params, cfg2 = _import_and_load(tmp_path, path, map_json=str(mp))
    assert cfg2 == cfg
    np.testing.assert_allclose(params["joint"]["enc_proj"]["w"],
                               am.fc1.weight.detach().numpy().T)
    np.testing.assert_allclose(params["joint"]["pred_proj"]["w"],
                               am.fc2.weight.detach().numpy().T)


def test_import_cli_then_recognize(tmp_path, capsys):
    """The CLI writes a checkpoint recognize.py decodes from directly."""
    torch.manual_seed(4)
    tm = TorchTransducerRef(UNI)
    out = str(tmp_path / "ck")
    main(["--torch-ckpt", _save(tmp_path, tm.state_dict()),
          "--out-dir", out, "--compute-dtype", "float32"])
    info = json.loads(capsys.readouterr().out)
    assert info["model_config"]["enc_layers"] == UNI.enc_layers

    feats = np.random.default_rng(0).normal(
        size=(30, UNI.input_dim)).astype(np.float32)
    np.save(tmp_path / "u0.npy", feats)
    man = tmp_path / "m.jsonl"
    man.write_text(json.dumps({"feats": str(tmp_path / "u0.npy"),
                               "labels": [1, 2]}))
    hyps = tmp_path / "hyps.jsonl"
    import recognize
    recognize.main(["--ckpt-dir", out, "--data", f"manifest:{man}",
                    "--mode", "greedy", "--hyps-file", str(hyps)])
    rec = json.loads(hyps.read_text().splitlines()[0])
    assert "hyp" in rec and rec["ref"] == [1, 2]


@pytest.mark.parametrize("ref_cfg", [UNI, BI], ids=["uni_tr2", "bi"])
def test_export_roundtrip_to_torch(tmp_path, ref_cfg, capsys):
    """import -> export -> torch.load into a fresh torch model: its forward
    equals the original torch model's to fp32 ulp tolerance (the bias split
    bias_ih=b, bias_hh=0 sums in a different order than the original
    bias_ih + bias_hh — same cell up to one rounding)."""
    from tools.export_torch_ckpt import main as export_main

    torch.manual_seed(5)
    tm = TorchTransducerRef(ref_cfg)
    out = str(tmp_path / "ck")
    cfg, _ = import_torch_checkpoint(_save(tmp_path, tm.state_dict()), out,
                                     compute_dtype="float32")
    pt = str(tmp_path / "back.pt")
    export_main(["--ckpt-dir", out, "--out", pt])
    assert json.loads(capsys.readouterr().out)["tensors"] > 0
    tm2 = TorchTransducerRef(ref_cfg)
    tm2.load_state_dict(torch.load(pt, weights_only=True))
    feats, frame_lens, labels, _ = _batch(ref_cfg)
    with torch.no_grad():
        want, _ = tm(torch.tensor(feats), torch.tensor(frame_lens),
                     torch.tensor(labels.astype(np.int64)))
        got, _ = tm2(torch.tensor(feats), torch.tensor(frame_lens),
                     torch.tensor(labels.astype(np.int64)))
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               atol=1e-6, rtol=1e-4)


def test_export_rejects_conformer(tmp_path):
    import jax

    from rnn_transducer_tpu.models.config import (TrainConfig,
                                                  TransducerConfig)
    from rnn_transducer_tpu.train.loop import init_train_state
    from tools.export_torch_ckpt import params_to_torch_state_dict

    cfg = TransducerConfig(input_dim=8, enc_type="conformer", enc_layers=1,
                           enc_hidden=16, enc_heads=2, vocab_size=11)
    state = init_train_state(jax.random.PRNGKey(0), cfg, TrainConfig())
    with pytest.raises(SystemExit, match="enc_type"):
        params_to_torch_state_dict(state.params, cfg)
