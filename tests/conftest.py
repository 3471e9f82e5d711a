"""Test harness configuration.

The unit suite runs on CPU with 8 virtual devices (SURVEY.md §4b: distributed
logic is tested on a forced-host-platform mesh; Pallas kernels run in
interpret mode on CPU). Real-TPU kernel checks live in tests that spawn a
subprocess with the default platform (see test_tpu_smoke.py) so one pytest
process never mixes backends.

Must run before jax is imported anywhere — pytest loads conftest first.
"""

import os
import sys

# Force CPU regardless of the ambient JAX_PLATFORMS (the sandbox pre-sets
# "axon", and a sitecustomize hook re-registers the axon plugin in every
# process, overriding the env var — the programmatic config update below is
# what actually wins). Real-TPU checks run in subprocesses (test_tpu_smoke.py).
os.environ["TPU_ICP_SLAM_AMBIENT_PLATFORM"] = os.environ.get("JAX_PLATFORMS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the CPU-mesh shard_map/Schur tests compile
# 10-60s programs — cache them across suite runs (keyed by backend+config,
# so CPU test artifacts never collide with TPU ones)
try:
    from tpu_icp_slam.obs.compile_cache import enable as _enable_cache

    _enable_cache()
except Exception:
    pass
# x64 for the whole suite: fp64 oracles need it, and enabling it per-module
# leaks into other modules anyway (global config). Library code pins explicit
# f32 dtypes, so it must stay correct under x64 — which is itself a property
# worth testing.
jax.config.update("jax_enable_x64", True)
