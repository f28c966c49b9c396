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

# Persistent compilation cache (round 4, VERDICT r3 item 5): the suite is
# compile-bound (~100 tests >= 20 s, nearly all of it XLA CPU compiles of
# the virtual-mesh programs), and the per-module jax.clear_caches() below
# forces recompiles even within one run. The on-disk cache makes repeat
# suite runs skip every previously-seen program; a cold run pays the same
# compiles as before and warms the cache for the next one. Measured
# cold/warm times live in CLAUDE.md. Override dir with RNNT_TEST_CACHE.
#
# The cache key does NOT include the host's CPU features: XLA:CPU AOT
# results compiled on an AVX-512/AMX host LOADED on a host without them
# (the build machine changes between rounds here) abort the process mid-
# test ("Fatal Python error: Aborted" inside a device_get) or risk wrong
# numerics — diagnosed round 5 when r4's cache hit a feature-poorer
# host. Key a per-host subdirectory on the CPU flags so a different
# machine starts a fresh cache instead of loading foreign code.
import hashlib


def _host_key() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split())).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "RNNT_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", f"jax-{_host_key()}"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# quick/slow lanes (VERDICT r2 item 7). Every test gets exactly one of the
# two markers, assigned by module from the measured full-suite durations
# (r3: 203 tests / ~31 min on the single CPU core). The quick lane is a
# broad smoke pass over every subsystem that finishes in ~3-4 min:
#     python -m pytest tests/ -m quick -q
# The full suite remains the default (`-m ""` or no -m).
# When adding a module, put it in QUICK_MODULES only if its total runtime
# is a few seconds; heavyweight tests (mesh train steps, CLI e2e, big
# kernel parity sweeps) stay in the slow lane.

QUICK_MODULES = {
    "test_align.py",
    "test_augment.py",
    "test_beam.py",
    "test_bpe.py",
    "test_ctc_and_tokenizer.py",
    "test_flops.py",
    "test_greedy.py",
    "test_hostio.py",
    "test_joint_fused.py",
    "test_logmel.py",
    "test_lstm.py",
    "test_model.py",
    "test_native_loader.py",
    "test_pcm_stream.py",
    "test_pipeline_parallel.py",
    "test_prepare_manifest.py",
    "test_rnnt_loss.py",
    "test_schedules_and_averaging.py",
    "test_sortagrad.py",
    "test_streaming.py",
    "test_tensor_parallel.py",
    "test_text_output.py",
    "test_wer_report.py",
    "test_words.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if (item.get_closest_marker("quick") is not None
                or item.get_closest_marker("slow") is not None):
            continue  # explicit per-test lane override wins
        name = os.path.basename(str(item.fspath))
        lane = "quick" if name in QUICK_MODULES else "slow"
        item.add_marker(getattr(pytest.mark, lane))


# The full suite compiles thousands of XLA CPU programs in one process;
# with the r3 test volume the accumulated live executables eventually
# segfault LLVM mid-compile near the end of the run (reproduced at
# ~280/318 tests; any late-suite subset alone is clean). Dropping the
# jit/executable caches at module boundaries bounds the resident JIT
# state; within-module compilation reuse (where it matters) is kept.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import gc
    jax.clear_caches()
    gc.collect()
