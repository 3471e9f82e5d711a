"""Device-mesh construction helpers (SURVEY.md §2b N15).

The reference is single-process/single-GPU with no communication backend
(SURVEY.md §2a "Parallelism & communication"; mount empty, §0). The new
framework scales through a `jax.sharding.Mesh`: axis "dp" batches independent
alignments (frame pairs, loop-closure verifications), axis "sp" shards the
source-point dimension of the distance matrix (the spatial/tensor-parallel
analogue), and pose-graph keyframe blocks partition over "dp" in the backend.
All collectives ride XLA (psum/all_gather/reduce_scatter) over ICI/DCN —
never NCCL/MPI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax


def _two_way_factor(n: int) -> tuple[int, int]:
    """Largest divisor pair (a, b), a <= b, a*b = n — balanced 2D mesh."""
    best = (1, n)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (a, n // a)
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("dp", "sp"),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> jax.sharding.Mesh:
    """Build a Mesh over the first n_devices. shape=None auto-factors.

    If the default platform has fewer than n_devices, falls back to the
    host-CPU devices (the virtual mesh from
    --xla_force_host_platform_device_count) and raises if those are still
    too few. Without this, asking for an 8-way mesh in an environment whose
    default backend is a single TPU silently produced a 1-device mesh — a
    "multi-chip" validation that validated nothing.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            default_platform = devices[0].platform if devices else "?"
            n_default = len(devices)
            try:
                devices = jax.devices("cpu")
            except RuntimeError:
                pass
            if len(devices) < n_devices:
                raise ValueError(
                    f"make_mesh: {n_devices} devices requested but only "
                    f"{len(jax.devices())} on the default platform and "
                    f"{len(devices)} on cpu"
                )
            # Never swap platforms silently: on a real pod this turns a
            # "multi-chip TPU" request into host-CPU execution (advisor r3,
            # same no-silent-degradation policy as multihost_init).
            import logging

            logging.getLogger(__name__).warning(
                "make_mesh: default platform %r has %d device(s) < %d "
                "requested; falling back to %d host-CPU devices",
                default_platform, n_default, n_devices, len(devices),
            )
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        elif len(axes) == 2:
            shape = _two_way_factor(n)
        else:
            raise ValueError("pass an explicit shape for >2 mesh axes")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return jax.sharding.Mesh(np.asarray(devices).reshape(shape), tuple(axes))


def multihost_init(coordinator: Optional[str] = None) -> None:
    """Multi-host bootstrap: `jax.distributed.initialize` (config 5).

    Must run BEFORE any jax op touches a backend (initialize raises after
    backend init — and `jax.process_count()` itself initializes backends, so
    we probe `jax.distributed.is_initialized()` instead). On a real pod each
    host calls this first; coordinator defaults from env
    (JAX_COORDINATOR_ADDRESS / TPU metadata auto-detection).

    Failure policy: an *explicitly requested* coordinator that fails to
    connect raises — a misconfigured pod must not silently degrade to
    single-process (that bug class costs hours on real hardware). With no
    coordinator argument and no env configuration this is a no-op (the
    single-process sandbox case), logged at debug level.
    """
    import logging

    log = logging.getLogger(__name__)
    dist_state = getattr(jax.distributed, "global_state", None)
    already = (
        jax.distributed.is_initialized()
        if hasattr(jax.distributed, "is_initialized")
        else (dist_state is not None and dist_state.client is not None)
    )
    if already:
        log.debug("jax.distributed already initialized; multihost_init no-op")
        return
    # Pod indicators beyond the explicit coordinator envs: on a real TPU pod
    # slice `jax.distributed.initialize()` auto-detects the coordinator from
    # the platform metadata, and these markers are what that environment
    # exports — gating ONLY on JAX_COORDINATOR_ADDRESS would leave the
    # auto-detection path unreachable and silently boot single-process
    # (review r2).
    pod_markers = (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
        "TPU_WORKER_ID", "CLOUD_TPU_TASK_ID", "JAX_NUM_PROCESSES",
    )
    env_configured = any(os.environ.get(k) for k in pod_markers)
    if coordinator is None and not env_configured:
        log.debug("no coordinator/pod markers; staying single-process")
        return
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator)
        else:
            jax.distributed.initialize()  # env / platform auto-detection
    except Exception as exc:
        # explicit request → hard failure; silent degradation is the trap
        log.error("jax.distributed.initialize failed: %s", exc)
        raise
