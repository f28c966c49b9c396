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


_SERIALIZED_STATES: set = set()


def _register_state_serialization(cls):
    """Register pytree (de)serialization for a state dataclass so the
    streaming artifact's in/out trees can be serialized (jax.export
    refuses unregistered custom nodes). Auxdata is pickled verbatim —
    both sides of the artifact are this package."""
    import pickle

    import jax

    if cls in _SERIALIZED_STATES:
        return
    jax.export.register_pytree_node_serialization(
        cls,
        serialized_name=f"{cls.__module__}.{cls.__qualname__}",
        serialize_auxdata=pickle.dumps,
        deserialize_auxdata=pickle.loads)
    _SERIALIZED_STATES.add(cls)


def export_streaming(params, cfg, *, mode: str, slots: int,
                     chunk_frames: int, max_symbols: int, beam: int = 8,
                     expansions: int = 3, platforms=None):
    """Export the serving runtime's masked streaming chunk step.

    The traced graph IS serve.StreamingEngine's device step
    (make_masked_chunk_step), so a server can skip the 10-20 min
    beam-mode trace+compile at startup (VERDICT r2 item 3). Artifact
    signature: f(params, None, state_pytree, chunks (S,C,D) f32,
    lens (S,) i32, active (S,) bool) -> (state', out_dict) — out_dict per
    serve.make_masked_chunk_step (tokens/lens/confidence, + scores in
    beam mode). mode: "streaming_greedy" | "streaming_beam" (no-LM
    graphs; LM-fused serving still compiles live).
    """
    import jax
    import jax.numpy as jnp

    from rnn_transducer_tpu.decode.streaming import StreamState
    from rnn_transducer_tpu.serve import make_masked_chunk_step

    _register_state_serialization(StreamState)
    base = mode.removeprefix("streaming_")
    init_state_fn, gstep = make_masked_chunk_step(
        cfg, slots=slots, max_symbols=max_symbols, mode=base, beam=beam,
        expansions=expansions)
    state0 = jax.eval_shape(lambda: init_state_fn(params))
    spec = lambda tree: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)
    exp = jax.export.export(jax.jit(gstep), platforms=platforms)(
        spec(params), None, state0,
        jax.ShapeDtypeStruct((slots, chunk_frames, cfg.input_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((slots,), jnp.int32),
        jax.ShapeDtypeStruct((slots,), jnp.bool_))
    meta = {
        "mode": mode, "slots": slots, "chunk_frames": chunk_frames,
        "max_symbols": max_symbols, "beam": beam, "expansions": expansions,
        "platforms": list(exp.platforms),
        "model_config": dataclasses.asdict(cfg),
        "calling_convention":
            "f(params, None, state, chunks_f32[S,C,D], lens_i32[S], "
            "active_bool[S]) -> (state', out_dict) — out_dict per "
            "serve.make_masked_chunk_step",
    }
    return exp.serialize(), meta


def load_exported(path: str):
    """Deserialize an exported artifact -> callable (args per the
    artifact's calling_convention in export_meta.json)."""
    import jax

    from rnn_transducer_tpu.decode.streaming import StreamState

    _register_state_serialization(StreamState)
    with open(path, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    return lambda *args: exp.call(*args)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--mode", default="greedy",
                   choices=["greedy", "beam", "streaming_greedy",
                            "streaming_beam"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--max-symbols", type=int, default=100)
    p.add_argument("--beam", type=int, default=8)
    p.add_argument("--slots", type=int, default=8,
                   help="streaming_*: session slots of the exported step")
    p.add_argument("--chunk-frames", type=int, default=32,
                   help="streaming_*: frames per chunk")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from rnn_transducer_tpu.train import checkpoint as ckpt

    try:
        params, cfg, step, _ = ckpt.load_plain_params(args.ckpt_dir,
                                                      seed=args.seed)
    except FileNotFoundError as e:
        raise SystemExit(str(e))
    print(f"loaded checkpoint step {step}", file=sys.stderr)

    if args.mode.startswith("streaming_"):
        blob, meta = export_streaming(
            params, cfg, mode=args.mode, slots=args.slots,
            chunk_frames=args.chunk_frames, max_symbols=args.max_symbols,
            beam=args.beam)
    else:
        blob, meta = export_decode(
            params, cfg, mode=args.mode, batch=args.batch,
            frames=args.frames, max_symbols=args.max_symbols,
            beam=args.beam)
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
