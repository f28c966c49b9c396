"""Checkpoint save/restore via orbax (reference: torch.save per epoch).

Checkpoints are self-describing: `save_checkpoint` writes a `meta.json`
sidecar (model config + optional tokenizer/extra metadata) next to the
orbax step directories, so `recognize.py --ckpt-dir` can reconstruct the
model without the user re-specifying `--config`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

META_FILE = "meta.json"

# One CheckpointManager per directory, kept open for the process lifetime
# (constructing a manager per save/restore call is wasteful at scale).
_managers: dict[str, ocp.CheckpointManager] = {}


def _manager(ckpt_dir: str) -> ocp.CheckpointManager:
    mgr = _managers.get(ckpt_dir)
    if mgr is None:
        mgr = ocp.CheckpointManager(ckpt_dir)
        _managers[ckpt_dir] = mgr
    else:
        mgr.reload()  # pick up steps written by other processes
    return mgr


def save_meta(ckpt_dir: str, model_cfg=None, **extra):
    """Write meta.json: the TransducerConfig (asdict) + extra metadata."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    meta = dict(extra)
    if model_cfg is not None:
        meta["model_config"] = dataclasses.asdict(model_cfg)
    with open(os.path.join(ckpt_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def load_meta(ckpt_dir: str) -> dict | None:
    """Read meta.json if present; returns the raw dict (or None)."""
    path = os.path.join(os.path.abspath(ckpt_dir), META_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_model_config(ckpt_dir: str):
    """Reconstruct the TransducerConfig saved with the checkpoint (or None)."""
    meta = load_meta(ckpt_dir)
    if not meta or "model_config" not in meta:
        return None
    from rnn_transducer_tpu.models.config import TransducerConfig
    d = dict(meta["model_config"])
    # JSON roundtrips tuples as lists; restore tuple fields so config
    # equality checks against freshly-built configs hold
    for k in ("big_blank_durations", "tdt_durations"):
        if k in d:
            d[k] = tuple(d[k])
    return TransducerConfig(**d)


def save_checkpoint(ckpt_dir: str, step: int, state_tree: Any,
                    model_cfg=None, **extra_meta):
    """Save a pytree (params/opt_state/step) under ckpt_dir/step.

    Pass `model_cfg` (TransducerConfig) to make the checkpoint
    self-describing; extra keyword metadata (e.g. tokenizer=...) is stored
    alongside it in meta.json.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(state_tree))
    mgr.wait_until_finished()
    if model_cfg is not None or extra_meta:
        save_meta(ckpt_dir, model_cfg, **extra_meta)


def restore_checkpoint(ckpt_dir: str, target_tree: Any, step: int | None = None):
    """Restore the pytree saved by `save_checkpoint`.

    target_tree provides structure/shape/dtype (e.g. a freshly-initialized
    TrainState's pytree). Returns (restored_tree, step).
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        if hasattr(x, "dtype") else x,
        target_tree,
    )
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    return restored, step


def saved_train_config(meta: dict):
    """Reconstruct the TrainConfig recorded in meta.json (or defaults).

    The restore target's pytree structure depends on TrainConfig fields
    (grad_accum wraps the optimizer in MultiSteps; ema_decay adds the
    TrainState.ema slot), so restoring against TrainConfig() would
    structure-mismatch such checkpoints.
    """
    from rnn_transducer_tpu.models.config import TrainConfig
    tc = meta.get("train_config")
    if not tc:
        return TrainConfig()
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in tc.items() if k in known}
    if "buckets" in kw:
        kw["buckets"] = tuple(tuple(b) for b in kw["buckets"])
    return TrainConfig(**kw)


def load_plain_params(ckpt_dir: str, cfg=None, seed: int = 0,
                      step: int | None = None, prefer_ema: bool = False):
    """Restore a checkpoint's params as a PLAIN single-device pytree.

    Handles both layouts: a plain TrainState checkpoint, and one written
    by a model-parallel run (train.py --model-parallel: live TPParams
    pytree + meta['parallel'] topology) — the weight shards are merged
    back into plain params. Shared by recognize.py, serve.py,
    tools/export_model.py and tools/align.py so every consumer can read
    every checkpoint (ADVICE r2). Returns (params, cfg, step, meta).

    cfg: the TransducerConfig; if None it must be recoverable from
    meta.json (self-describing checkpoint).
    prefer_ema: return the Polyak-averaged params (training ran with
    --ema-decay) instead of the live ones; errors if the checkpoint
    carries no EMA.
    """
    from rnn_transducer_tpu.train.loop import TrainState, init_train_state

    meta = load_meta(ckpt_dir) or {}
    if cfg is None:
        cfg = load_model_config(ckpt_dir)
        if cfg is None:
            raise FileNotFoundError(
                f"{ckpt_dir}/meta.json has no model_config; pass cfg")
    key = jax.random.PRNGKey(seed)
    tcfg = saved_train_config(meta)
    par = meta.get("parallel")
    if par and par.get("mp", 1) > 1:
        from rnn_transducer_tpu.parallel import pipeline as ppx, tp as tpx
        mode, mp_n = par["mode"], int(par["mp"])
        inits = {"tp": lambda: tpx.init_tp_train_state(key, cfg, tcfg, mp_n),
                 "pp": lambda: ppx.init_pp_train_state(key, cfg, tcfg, mp_n),
                 "ep": lambda: tpx.init_ep_train_state(key, cfg, tcfg, mp_n),
                 "sp": lambda: tpx.init_sp_train_state(key, cfg, tcfg)}
        if mode not in inits:
            raise ValueError(f"unknown parallel mode {mode!r} in meta.json")
        state, got = restore_checkpoint(ckpt_dir, inits[mode](), step)
        merges = {"tp": tpx.merge_params_tp, "pp": ppx.merge_params_pp,
                  "ep": tpx.merge_params_ep, "sp": lambda p, c: p}
        tree = state.params
        if prefer_ema:
            if state.ema is None:
                raise ValueError(f"{ckpt_dir} carries no EMA params "
                                 "(train with --ema-decay > 0)")
            tree = state.ema  # same sharded layout as params — merges too
        return merges[mode](tree, cfg), cfg, got, meta
    state0 = init_train_state(key, cfg, tcfg)
    tree, got = restore_checkpoint(ckpt_dir, dataclasses.asdict(state0), step)
    state = TrainState(**tree)
    if prefer_ema:
        if state.ema is None:
            raise ValueError(f"{ckpt_dir} carries no EMA params (train "
                             "with --ema-decay > 0)")
        return state.ema, cfg, got, meta
    return state.params, cfg, got, meta


def latest_step(ckpt_dir: str) -> int | None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    return _manager(ckpt_dir).latest_step()


def all_steps(ckpt_dir: str) -> list[int]:
    """Every saved step under ckpt_dir (empty list if none)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(_manager(ckpt_dir).all_steps())
