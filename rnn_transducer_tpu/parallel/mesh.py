"""Device mesh + sharding helpers for data-parallel training.

The reference is a single-device (CPU/GPU) script; scale-out is native to
this rebuild (BASELINE.json configs[4]: data-parallel on v5e-8). The design
is the standard JAX recipe: build a 1-D `Mesh` over the "data" axis,
shard the batch, replicate parameters, and let XLA insert the gradient
all-reduce over ICI during jit.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data if n_data is not None else len(devices)
    return Mesh(np.asarray(devices[:n_data]).reshape(n_data), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading batch dim) on the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
