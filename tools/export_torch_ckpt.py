"""Export a tpu-rnnt checkpoint as a PyTorch state_dict.

The inverse of tools/import_torch_ckpt.py: the params pytree of an LSTM
transducer checkpoint is written as a `torch.save`d state_dict in the
reference family's module naming (the layout tests/test_torch_parity.py
proves parity for: per-layer `enc_layers.{i}` / `pred_layers.{i}` LSTM
modules, `embed`, `enc_proj`/`pred_proj`/`out` linears), so a model trained
here can be loaded into a torch implementation for comparison or migration
back. Our fused bias `b = b_ih + b_hh` is split as `bias_ih = b, bias_hh =
0` — torch sums them, so the module computes identically (up to one fp32
rounding from the changed summation order).

Usage:
  python tools/export_torch_ckpt.py --ckpt-dir /ckpt --out model.pt \
      [--step N] [--use-ema]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t_lstm(out: dict, prefix: str, p: dict, suffix: str = ""):
    import torch

    out[f"{prefix}.weight_ih_l0{suffix}"] = torch.tensor(
        np.ascontiguousarray(np.asarray(p["w_ih"], np.float32).T))
    out[f"{prefix}.weight_hh_l0{suffix}"] = torch.tensor(
        np.ascontiguousarray(np.asarray(p["w_hh"], np.float32).T))
    b = torch.tensor(np.asarray(p["b"], np.float32))
    out[f"{prefix}.bias_ih_l0{suffix}"] = b
    out[f"{prefix}.bias_hh_l0{suffix}"] = torch.zeros_like(b)


def _t_linear(out: dict, prefix: str, p: dict):
    import torch

    out[f"{prefix}.weight"] = torch.tensor(
        np.ascontiguousarray(np.asarray(p["w"], np.float32).T))
    out[f"{prefix}.bias"] = torch.tensor(np.asarray(p["b"], np.float32))


def params_to_torch_state_dict(params: dict, cfg) -> dict:
    """Map our params pytree to a TorchTransducerRef-layout state_dict."""
    import torch

    if cfg.enc_type != "lstm":
        raise SystemExit(f"only LSTM encoders export to torch "
                         f"(enc_type={cfg.enc_type!r})")
    if cfg.pred_type != "lstm":
        raise SystemExit(f"only LSTM predictors export to torch "
                         f"(pred_type={cfg.pred_type!r})")
    sd: dict = {}
    for i, layer in enumerate(params["encoder"]):
        if cfg.bidirectional:
            _t_lstm(sd, f"enc_layers.{i}", layer["fwd"])
            _t_lstm(sd, f"enc_layers.{i}", layer["bwd"], "_reverse")
        else:
            _t_lstm(sd, f"enc_layers.{i}", layer)
    sd["embed.weight"] = torch.tensor(np.asarray(params["embed"], np.float32))
    for i, layer in enumerate(params["predictor"]):
        _t_lstm(sd, f"pred_layers.{i}", layer)
    _t_linear(sd, "enc_proj", params["joint"]["enc_proj"])
    _t_linear(sd, "pred_proj", params["joint"]["pred_proj"])
    _t_linear(sd, "out", params["joint"]["out"])
    return sd


def main(argv=None):
    import torch

    from rnn_transducer_tpu.train import checkpoint as ckpt

    p = argparse.ArgumentParser(
        description="Export an LSTM-transducer checkpoint as a torch "
                    "state_dict (see the module docstring)")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--use-ema", action="store_true",
                   help="export the Polyak-averaged params")
    args = p.parse_args(argv)
    params, cfg, step, _ = ckpt.load_plain_params(
        args.ckpt_dir, step=args.step, prefer_ema=args.use_ema)
    sd = params_to_torch_state_dict(params, cfg)
    torch.save(sd, args.out)
    print(json.dumps({"out": os.path.abspath(args.out), "step": step,
                      "tensors": len(sd)}))


if __name__ == "__main__":
    main()
