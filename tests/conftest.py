"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in this environment; sharding
correctness is validated on `xla_force_host_platform_device_count=8` CPU
devices (the driver separately dry-run-compiles the multi-chip path via
`__graft_entry__.dryrun_multichip`). Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize.py (axon TPU plugin) imports jax at interpreter startup, so
# jax has already snapshotted JAX_PLATFORMS=axon from the parent env; the
# os.environ override above is too late for it. Backends initialize lazily,
# so updating the live config here still wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
