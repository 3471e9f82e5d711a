"""Normal estimation (SURVEY.md §2b N8).

Two paths:
- organized depth maps: cross products of central differences of the vertex
  map (used by projective RGB-D ICP, config 3);
- unorganized clouds: k-NN plane fit via the smallest eigenvector of the
  local covariance (reuses the NN kernels; batched eigh of 3x3 is cheap).

No reference equivalent (the CUDA app was point-to-point only; SURVEY.md §2a).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_icp_slam.kernels.nn_xla import knn_bruteforce_xla


def normals_from_depth(
    vertex_map: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, 3) camera-frame vertex map -> (H, W, 3) unit normals + validity.

    Normals are oriented toward the camera (n_z < 0 for a camera looking
    down +z onto a surface).
    """
    dx = jnp.roll(vertex_map, -1, axis=1) - jnp.roll(vertex_map, 1, axis=1)
    dy = jnp.roll(vertex_map, -1, axis=0) - jnp.roll(vertex_map, 1, axis=0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward camera: flip if pointing away from the origin ray
    flip = jnp.sum(n * vertex_map, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    ok = (
        valid
        & jnp.roll(valid, -1, axis=1)
        & jnp.roll(valid, 1, axis=1)
        & jnp.roll(valid, -1, axis=0)
        & jnp.roll(valid, 1, axis=0)
        & (norm[..., 0] > 1e-12)
    )
    # border rolls wrap around: kill the 1-pixel frame
    ok = ok.at[0, :].set(False).at[-1, :].set(False)
    ok = ok.at[:, 0].set(False).at[:, -1].set(False)
    return jnp.where(ok[..., None], n, 0.0), ok


def normals_knn(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 16,
    viewpoint: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 3) cloud -> (N, 3) unit normals by local plane fit.

    Padded slots (mask False) get zero normals. Normals are oriented toward
    `viewpoint` (default: the origin, i.e. the sensor).
    """
    idx, _ = knn_bruteforce_xla(points, points, k=k)
    nbrs = points[idx]  # (N, k, 3)
    mu = jnp.mean(nbrs, axis=1, keepdims=True)
    x = nbrs - mu
    cov = jnp.einsum("nki,nkj->nij", x, x) / k  # (N, 3, 3)
    # smallest eigenvector of a symmetric 3x3 = plane normal
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]
    vp = jnp.zeros(3, points.dtype) if viewpoint is None else viewpoint
    to_sensor = vp[None, :] - points
    flip = jnp.sum(n * to_sensor, axis=-1, keepdims=True) < 0
    n = jnp.where(flip, -n, n)
    return jnp.where(mask[:, None], n, 0.0)
