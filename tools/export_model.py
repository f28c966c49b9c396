"""Export jitted inference functions as serialized StableHLO artifacts.

Deployment path: the decode graph (greedy or beam) is traced once at fixed
serving shapes and serialized with `jax.export` — the artifact is
platform-checked StableHLO that a serving binary can deserialize and call
without any Python model code. Weights stay ARGUMENTS of the artifact
(shipped separately via the orbax checkpoint), so the artifact is small
and weight updates do not require re-export.

  python tools/export_model.py --ckpt-dir /ckpts/libri100 \
      --out-dir /export --batch 8 --frames 400 --mode greedy

Writes <out-dir>/<mode>.stablehlo + export_meta.json (shapes, config,
calling convention). `load_exported()` restores a callable.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_decode(params, cfg, *, mode: str, batch: int, frames: int,
                  max_symbols: int, beam: int = 8, expansions: int = 3,
                  platforms=None):
    """-> (serialized bytes, meta dict). Artifact signature:
    f(params_pytree, feats (B,T,D) f32, feat_lens (B,) i32)."""
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.beam import recognize_beam
    from rnn_transducer_tpu.decode.greedy import recognize_greedy

    if mode == "greedy":
        fn = lambda p, f, l: recognize_greedy(
            p, cfg, f, l, max_symbols=max_symbols)
    elif mode == "beam":
        def fn(p, f, l):
            t, ln, s = recognize_beam(p, cfg, f, l, beam=beam,
                                      max_symbols=max_symbols,
                                      expansions=expansions)
            return t[:, 0], ln[:, 0]
    else:
        raise ValueError(mode)

    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)
    f_spec = jax.ShapeDtypeStruct((batch, frames, cfg.input_dim),
                                  jnp.float32)
    l_spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(
        p_spec, f_spec, l_spec)
    meta = {
        "mode": mode, "batch": batch, "frames": frames,
        "max_symbols": max_symbols, "beam": beam, "expansions": expansions,
        "platforms": list(exp.platforms),
        "model_config": dataclasses.asdict(cfg),
        "calling_convention":
            "f(params, feats_f32[B,T,D], feat_lens_i32[B]) -> "
            "(tokens_i32[B,max_symbols], lens_i32[B])",
    }
    return exp.serialize(), meta


def load_exported(path: str):
    """Deserialize an exported artifact -> callable(params, feats, lens)."""
    import jax

    with open(path, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    return lambda *args: exp.call(*args)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--max-symbols", type=int, default=100)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from rnn_transducer_tpu.models.config import TrainConfig
    from rnn_transducer_tpu.train import checkpoint as ckpt
    from rnn_transducer_tpu.train.loop import TrainState, init_train_state

    cfg = ckpt.load_model_config(args.ckpt_dir)
    if cfg is None:
        raise SystemExit(f"{args.ckpt_dir}: no meta.json model config")
    state = init_train_state(jax.random.PRNGKey(args.seed), cfg,
                             TrainConfig())
    tree, step = ckpt.restore_checkpoint(args.ckpt_dir,
                                         dataclasses.asdict(state))
    params = TrainState(**tree).params
    print(f"loaded checkpoint step {step}", file=sys.stderr)

    blob, meta = export_decode(
        params, cfg, mode=args.mode, batch=args.batch, frames=args.frames,
        max_symbols=args.max_symbols, beam=args.beam)
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.mode}.stablehlo")
    with open(out, "wb") as f:
        f.write(blob)
    meta["checkpoint_step"] = step
    with open(os.path.join(args.out_dir, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({"out": out, "bytes": len(blob),
                      "platforms": meta["platforms"]}))


if __name__ == "__main__":
    main()
