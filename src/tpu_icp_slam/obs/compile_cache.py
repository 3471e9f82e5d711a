"""Persistent XLA compilation cache (opt-out via TPU_ICP_SLAM_NO_CACHE=1).

Fused-pipeline compiles cost 60-200 s through the axon tunnel; the
persistent cache cuts repeat compiles to seconds across processes
(measured 11.2 s -> 2.2 s on a cold jit). Called by the CLI, bench.py and
the driver entry points before any jit."""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("TPU_ICP_SLAM_NO_CACHE") == "1":
        return
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "tpu_icp_slam_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
