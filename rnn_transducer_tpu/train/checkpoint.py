"""Checkpoint save/restore via orbax (reference: torch.save per epoch)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state_tree: Any):
    """Save a pytree (params/opt_state/step) under ckpt_dir/step."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state_tree))
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, target_tree: Any, step: int | None = None):
    """Restore the pytree saved by `save_checkpoint`.

    target_tree provides structure/shape/dtype (e.g. a freshly-initialized
    TrainState's pytree). Returns (restored_tree, step).
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
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


def latest_step(ckpt_dir: str) -> int | None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()
