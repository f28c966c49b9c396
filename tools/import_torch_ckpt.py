"""Import a PyTorch RNN-T checkpoint into a tpu-rnnt checkpoint directory.

The reference family trains LSTM transducers in torch and checkpoints with
`torch.save` (SURVEY.md §A/§B); this tool lets a user of such a repo switch
to this framework WITH their trained model: it maps a torch `state_dict`
onto our parameter pytree and writes a self-describing orbax checkpoint
(`train/checkpoint.py` meta.json) that recognize.py / serve.py /
export_model.py / align.py / train.py --resume all read unchanged.

Architecture covered: stacked (uni/bi) LSTM encoder + embedding + LSTM
prediction network + enc/pred projections + output linear — the layout
`tests/test_torch_parity.py` proves logit/loss/grad parity for. Weight
semantics follow torch exactly: `weight_ih_l{k}` (4H, in) transposes to our
`w_ih` (in, 4H); `bias_ih + bias_hh` fold into our single `b` (our LSTM cell
keeps torch's i,f,g,o gate order, ops/lstm.py).

Tensors are located by a heuristic that handles the common torch layouts —
per-layer `nn.LSTM` modules OR one multi-layer module (`weight_ih_l0..lN`),
`nn.DataParallel`'s `module.` prefix, Lightning-style `{"state_dict": ...}`
nesting — with name hints ("enc"/"pred"/"dec"/"embed"/"out") breaking
dimension ties. Anything ambiguous is a hard error naming the candidates;
`--map-json` pins the module names explicitly.

Usage:
  python tools/import_torch_ckpt.py --torch-ckpt model.pt --out-dir /ckpt \
      [--tokenizer char|bpe:tok.json] [--compute-dtype bfloat16] \
      [--time-reduction K] [--map-json mapping.json] [--step N]

The model config is INFERRED from the tensor shapes (layer counts, hidden
sizes, bidirectionality, vocab, and — when the encoder stacks frames after
layer 0 — the time_reduction factor); `--time-reduction` overrides the
inference for single-layer encoders where it is unobservable.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LSTM_KEY = re.compile(r"^(.*?)\.?(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$")


def _natkey(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def load_state_dict(path: str) -> dict:
    """torch.load a checkpoint file down to a flat {name: ndarray} dict.

    weights_only=True keeps untrusted pickles from executing code; common
    wrapper layouts ({"state_dict": ...}, {"model": ...}) are unwrapped and
    nn.DataParallel's "module." prefix is stripped.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise SystemExit(f"{path}: expected a state_dict, got {type(obj)}")
    sd = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue  # step counters / scheduler scalars etc.
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v.detach().cpu().numpy()
    if not sd:
        raise SystemExit(f"{path}: no tensors found in the checkpoint")
    return sd


# ----------------------------- module grouping -----------------------------

def group_modules(sd: dict):
    """Split the flat state_dict into LSTM stacks / linears / embeddings.

    Returns (lstms, linears, embeds):
      lstms   {module_prefix: {layer_idx: {"": {w_ih, w_hh, b_ih, b_hh},
                                           "_reverse": {...}?}}}
      linears {prefix: {"weight": (out,in), "bias": (out,)}}
      embeds  {prefix: (rows, cols) weight}
    """
    lstms: dict = {}
    rest: dict = {}
    for k, v in sd.items():
        m = _LSTM_KEY.match(k)
        if m:
            prefix, kind, gate, lidx, rev = m.groups()
            layer = lstms.setdefault(prefix, {}).setdefault(int(lidx), {})
            layer.setdefault(rev or "", {})[f"{kind}_{gate}"] = v
        else:
            rest.setdefault(k.rsplit(".", 1)[0] if "." in k else "",
                            {})[k.rsplit(".", 1)[-1]] = v
    for prefix, layers in lstms.items():
        for lidx, sides in layers.items():
            for side, t in sides.items():
                missing = {"weight_ih", "weight_hh", "bias_ih",
                           "bias_hh"} - set(t)
                if missing:
                    raise SystemExit(
                        f"LSTM {prefix!r} layer {lidx}{side}: missing "
                        f"{sorted(missing)} (bias-free LSTMs unsupported)")
    linears, embeds = {}, {}
    for prefix, t in rest.items():
        w = t.get("weight")
        if w is None:
            continue
        if set(t) >= {"weight", "bias"} and w.ndim == 2 and \
                t["bias"].ndim == 1 and t["bias"].shape[0] == w.shape[0]:
            linears[prefix] = t
        elif set(t) == {"weight"} and w.ndim == 2:
            embeds[prefix] = t["weight"]
    return lstms, linears, embeds


def _flat_lstm_layers(lstms: dict):
    """Flatten to an ordered list of (name, layer_dict) single layers.

    Module prefixes sort naturally ("enc.2" < "enc.10"); layers within one
    multi-layer nn.LSTM module keep their l{k} index order.
    """
    out = []
    for prefix in sorted(lstms, key=_natkey):
        for lidx in sorted(lstms[prefix]):
            out.append((f"{prefix}[l{lidx}]" if len(lstms[prefix]) > 1
                        else prefix, lstms[prefix][lidx]))
    return out


def _in_dim(layer):  # input feature dim of one (possibly bidir) LSTM layer
    return layer[""]["weight_ih"].shape[1]


def _hid(layer):
    return layer[""]["weight_hh"].shape[1]


def _name_hits(name: str, words) -> bool:
    low = name.lower()
    return any(w in low for w in words)


ENC_HINTS = ("enc", "transcription", "audio", "acoustic")
PRED_HINTS = ("pred", "dec", "prediction", "label", "lm")


def classify(sd: dict, map_spec: dict | None = None):
    """Resolve the state_dict into the six logical components.

    Returns {"encoder": [(name, layer)], "predictor": [(name, layer)],
    "embed": ndarray, "enc_proj"/"pred_proj"/"out": {"weight","bias"}}.
    map_spec (from --map-json) pins module prefixes:
      {"encoder": ["enc.0", ...], "predictor": [...], "embed": "embed",
       "enc_proj": "...", "pred_proj": "...", "out": "..."}
    """
    lstms, linears, embeds = group_modules(sd)
    layers = _flat_lstm_layers(lstms)
    if map_spec:
        return _classify_mapped(map_spec, lstms, linears, embeds)
    if not layers:
        raise SystemExit("no LSTM weights (weight_ih_l0...) found")

    # --- embedding ---
    if len(embeds) == 1:
        (embed_name, embed), = embeds.items()
    else:
        hinted = [n for n in embeds if _name_hits(n, ("embed",))]
        if len(hinted) != 1:
            raise SystemExit(
                f"cannot identify the embedding among {sorted(embeds)}; "
                "use --map-json")
        embed_name = hinted[0]
        embed = embeds[embed_name]
    embed_dim = embed.shape[1]

    # --- encoder vs predictor stacks ---
    enc, pred = [], []
    unhinted = []
    for name, layer in layers:
        e, p = _name_hits(name, ENC_HINTS), _name_hits(name, PRED_HINTS)
        if e and not p:
            enc.append((name, layer))
        elif p and not e:
            pred.append((name, layer))
        else:
            unhinted.append((name, layer))
    if unhinted:
        if enc or pred:
            raise SystemExit(
                "mixed hinted/unhinted LSTM module names "
                f"({[n for n, _ in layers]}); use --map-json")
        # no name hints at all: the predictor is the earliest layer suffix
        # that chains from embed_dim; everything before it is the encoder
        split = None
        for i in range(1, len(unhinted)):
            chain = embed_dim
            ok = True
            for _, layer in unhinted[i:]:
                if _in_dim(layer) != chain:
                    ok = False
                    break
                chain = _hid(layer)
            if ok:
                split = i
                break
        if split is None:
            raise SystemExit(
                "cannot split encoder/predictor LSTMs by name or shape "
                f"({[n for n, _ in layers]}); use --map-json")
        enc, pred = unhinted[:split], unhinted[split:]
    if not enc or not pred:
        raise SystemExit(
            f"need both encoder and predictor LSTMs; got encoder="
            f"{[n for n, _ in enc]} predictor={[n for n, _ in pred]}; "
            "use --map-json")

    # --- the three linears ---
    enc_out = _hid(enc[-1][1]) * (2 if "_reverse" in enc[-1][1] else 1)
    pred_hidden = _hid(pred[-1][1])
    vocab = embed.shape[0]
    cands = dict(linears)

    def take(role, match, hints):
        hits = [n for n, t in cands.items() if match(t["weight"])]
        if len(hits) > 1:
            hinted = [n for n in hits if _name_hits(n, hints)]
            if len(hinted) == 1:
                hits = hinted
        if len(hits) != 1:
            raise SystemExit(
                f"cannot identify {role!r} among linears {sorted(cands)} "
                f"(candidates: {hits}); use --map-json")
        return hits[0], cands.pop(hits[0])

    out_name, out = take("out", lambda w: w.shape[0] == vocab,
                         ("out", "fc", "classifier", "joint"))
    joint_dim = out["weight"].shape[1]
    ep_name, enc_proj = take(
        "enc_proj", lambda w: w.shape == (joint_dim, enc_out), ENC_HINTS)
    pp_name, pred_proj = take(
        "pred_proj", lambda w: w.shape == (joint_dim, pred_hidden),
        PRED_HINTS)
    return {"encoder": enc, "predictor": pred, "embed": embed,
            "enc_proj": enc_proj, "pred_proj": pred_proj, "out": out,
            "names": {"embed": embed_name, "enc_proj": ep_name,
                      "pred_proj": pp_name, "out": out_name}}


def _classify_mapped(spec, lstms, linears, embeds):
    def lstm_list(names):
        out = []
        for n in names:
            if n not in lstms:
                raise SystemExit(f"--map-json: LSTM module {n!r} not found "
                                 f"(have {sorted(lstms)})")
            for lidx in sorted(lstms[n]):
                out.append((f"{n}[l{lidx}]", lstms[n][lidx]))
        return out

    def linear(n):
        if n not in linears:
            raise SystemExit(f"--map-json: linear {n!r} not found "
                             f"(have {sorted(linears)})")
        return linears[n]

    if spec["embed"] not in embeds:
        raise SystemExit(f"--map-json: embedding {spec['embed']!r} not found "
                         f"(have {sorted(embeds)})")
    return {"encoder": lstm_list(spec["encoder"]),
            "predictor": lstm_list(spec["predictor"]),
            "embed": embeds[spec["embed"]],
            "enc_proj": linear(spec["enc_proj"]),
            "pred_proj": linear(spec["pred_proj"]),
            "out": linear(spec["out"]),
            "names": {k: spec[k] for k in
                      ("embed", "enc_proj", "pred_proj", "out")}}


# ------------------------- config inference + build ------------------------

def infer_config(comp: dict, time_reduction: int | None = None,
                 compute_dtype: str = "bfloat16"):
    """TransducerConfig from the classified tensors' shapes."""
    from rnn_transducer_tpu.models.config import TransducerConfig

    enc, pred = comp["encoder"], comp["predictor"]
    bidir = "_reverse" in enc[0][1]
    for name, layer in enc:
        if ("_reverse" in layer) != bidir:
            raise SystemExit(f"encoder mixes uni/bidirectional layers "
                             f"({name})")
    hid = {_hid(layer) for _, layer in enc}
    if len(hid) != 1:
        raise SystemExit(f"encoder hidden sizes differ across layers: {hid}")
    enc_hidden = hid.pop()
    enc_out = enc_hidden * (2 if bidir else 1)
    if time_reduction is None:
        if len(enc) > 1:
            k, rem = divmod(_in_dim(enc[1][1]), enc_out)
            if rem or k < 1:
                raise SystemExit(
                    f"encoder layer 1 input dim {_in_dim(enc[1][1])} is not "
                    f"a multiple of the layer-0 output dim {enc_out}")
            time_reduction = k
        else:
            time_reduction = 1
    # validate the whole chain under that reduction factor
    for i, (name, layer) in enumerate(enc):
        if i == 0:
            continue
        want = enc_out * (time_reduction if i == 1 else 1)
        if _in_dim(layer) != want:
            raise SystemExit(f"encoder layer {i} ({name}) input dim "
                             f"{_in_dim(layer)} != expected {want}")
    phid = {_hid(layer) for _, layer in pred}
    if len(phid) != 1:
        raise SystemExit(f"predictor hidden sizes differ: {phid}")
    if any("_reverse" in layer for _, layer in pred):
        raise SystemExit("bidirectional prediction network is not a "
                         "transducer architecture (non-causal decoder)")
    vocab, embed_dim = comp["embed"].shape
    if _in_dim(pred[0][1]) != embed_dim:
        raise SystemExit(f"predictor input dim {_in_dim(pred[0][1])} != "
                         f"embedding dim {embed_dim}")
    if comp["out"]["weight"].shape[0] != vocab:
        raise SystemExit(f"output vocab {comp['out']['weight'].shape[0]} != "
                         f"embedding rows {vocab}")
    return TransducerConfig(
        input_dim=_in_dim(enc[0][1]), enc_layers=len(enc),
        enc_hidden=enc_hidden, bidirectional=bidir,
        time_reduction=time_reduction, pred_layers=len(pred),
        pred_hidden=phid.pop(), embed_dim=embed_dim,
        joint_dim=comp["out"]["weight"].shape[1], vocab_size=vocab,
        compute_dtype=compute_dtype)


def _jax_lstm(t: dict) -> dict:
    return {"w_ih": np.ascontiguousarray(t["weight_ih"].T, np.float32),
            "w_hh": np.ascontiguousarray(t["weight_hh"].T, np.float32),
            "b": (t["bias_ih"] + t["bias_hh"]).astype(np.float32)}


def _jax_linear(t: dict) -> dict:
    return {"w": np.ascontiguousarray(t["weight"].T, np.float32),
            "b": t["bias"].astype(np.float32)}


def build_params(comp: dict, cfg) -> dict:
    enc = []
    for _, layer in comp["encoder"]:
        if cfg.bidirectional:
            enc.append({"fwd": _jax_lstm(layer[""]),
                        "bwd": _jax_lstm(layer["_reverse"])})
        else:
            enc.append(_jax_lstm(layer[""]))
    return {"encoder": enc,
            "embed": comp["embed"].astype(np.float32),
            "predictor": [_jax_lstm(layer[""])
                          for _, layer in comp["predictor"]],
            "joint": {"enc_proj": _jax_linear(comp["enc_proj"]),
                      "pred_proj": _jax_linear(comp["pred_proj"]),
                      "out": _jax_linear(comp["out"])}}


def import_torch_checkpoint(torch_ckpt: str, out_dir: str,
                            time_reduction: int | None = None,
                            compute_dtype: str = "bfloat16",
                            tokenizer: str | None = None,
                            map_json: str | None = None, step: int = 0):
    """The whole pipeline; returns (cfg, n_tensors). Used by tests."""
    import jax

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import init_train_state

    sd = load_state_dict(torch_ckpt)
    spec = None
    if map_json:
        with open(map_json) as f:
            spec = json.load(f)
    comp = classify(sd, spec)
    cfg = infer_config(comp, time_reduction, compute_dtype)
    params = build_params(comp, cfg)

    # shape-check against a freshly initialized state: any drift between
    # the inferred config and the tensors is caught here, not at decode
    state = init_train_state(jax.random.PRNGKey(0), cfg, TrainConfig())
    want = jax.tree.map(np.shape, state.params)
    got = jax.tree.map(np.shape, params)
    if want != got:
        raise SystemExit(f"imported params do not match the inferred config "
                         f"{cfg}:\n  expected {want}\n  got {got}")
    state = dataclasses.replace(state, params=params)

    extra = {"imported_from": os.path.abspath(torch_ckpt),
             "train_config": dataclasses.asdict(TrainConfig())}
    if tokenizer:
        from rnn_transducer_tpu.data.tokenizer import (tokenizer_from_spec,
                                                       tokenizer_to_meta)
        tok = tokenizer_from_spec(tokenizer)
        if tok.vocab_size > cfg.vocab_size:
            raise SystemExit(f"--tokenizer {tokenizer} needs vocab "
                             f"{tok.vocab_size} > model {cfg.vocab_size}")
        extra["tokenizer"] = tokenizer_to_meta(tok)
    ckpt.save_checkpoint(out_dir, step, dataclasses.asdict(state),
                         model_cfg=cfg, **extra)
    return cfg, len(sd)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Import a torch RNN-T state_dict as a tpu-rnnt "
                    "checkpoint (see the module docstring)")
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--time-reduction", type=int, default=None,
                   help="override the inferred frame-stacking factor "
                        "(needed only for 1-layer encoders)")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="matmul dtype for the imported model (bfloat16 = "
                        "TPU default; float32 for bit-parity debugging)")
    p.add_argument("--tokenizer", default=None,
                   help="tokenizer spec recorded in meta.json "
                        "(char | phone | bpe:<model.json>)")
    p.add_argument("--map-json", default=None,
                   help="explicit module-name mapping (JSON with keys "
                        "encoder/predictor [lists], embed/enc_proj/"
                        "pred_proj/out) when the heuristics are ambiguous")
    p.add_argument("--step", type=int, default=0,
                   help="step number to save the checkpoint at")
    args = p.parse_args(argv)
    cfg, n = import_torch_checkpoint(
        args.torch_ckpt, args.out_dir, args.time_reduction,
        args.compute_dtype, args.tokenizer, args.map_json, args.step)
    print(json.dumps({"out_dir": os.path.abspath(args.out_dir),
                      "tensors": n,
                      "model_config": dataclasses.asdict(cfg)}))


if __name__ == "__main__":
    main()
