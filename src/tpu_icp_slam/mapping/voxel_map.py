"""Fixed-capacity voxel-deduplicated 3D map (SURVEY.md §2b N11).

The scan-to-map model of BASELINE.json config 4. TPU-first design: the map is
a static-shape point store (capacity C) with a validity mask; insertion is a
*sort-based* voxel dedup — concatenate existing + new points, lexsort by
quantized voxel coordinates (stable, existing points first), keep the first
point per voxel, and compact back to capacity. Everything is XLA sorts and
gathers: no hash table, no pointer chasing, no dynamic shapes — the idiomatic
replacement for a mutable voxel-hash map on GPU (SURVEY.md §2c).

Local-model extraction for ICP is a masked `top_k` by distance from the
current pose — a fixed-size nearest-subset query that keeps the downstream
distance-matrix kernel shapes static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpu_icp_slam.core.pointcloud import PAD_COORD

# quantized voxel coordinates live in [-2^19, 2^19); invalid slots sort last
_QMAX = 1 << 19
_QINVALID = _QMAX + 7


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelMap:
    points: jnp.ndarray  # (C, 3) world frame; PAD_COORD sentinel when invalid
    normals: jnp.ndarray  # (C, 3) world frame; zeros when unknown
    mask: jnp.ndarray  # (C,) bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


def create(capacity: int, dtype=jnp.float32) -> VoxelMap:
    return VoxelMap(
        points=jnp.full((capacity, 3), PAD_COORD, dtype=dtype),
        normals=jnp.zeros((capacity, 3), dtype=dtype),
        mask=jnp.zeros((capacity,), bool),
    )


def _quantize(pts: jnp.ndarray, msk: jnp.ndarray, voxel: float):
    q = jnp.floor(pts / voxel).astype(jnp.int32)
    q = jnp.clip(q, -_QMAX, _QMAX - 1)
    return jnp.where(msk[:, None], q, _QINVALID)


def insert(vm: VoxelMap, pts: jnp.ndarray, msk: jnp.ndarray, nrm: jnp.ndarray,
           *, voxel: float, center: jnp.ndarray | None = None) -> VoxelMap:
    """Merge a world-frame scan into the map with voxel dedup.

    Existing map points win ties inside a voxel (stable sort, map first), so
    the map doesn't drift with re-observation. On overflow:
    - with `center` (the current sensor position): SPATIAL eviction — the
      `cap` points nearest the sensor survive (the local-map policy of
      production lidar odometry). FIFO-keep is a trap: once the map fills,
      new terrain would never enter it and the vehicle outruns its own map
      (measured: tracking death exactly at capacity saturation).
    - without `center`: earliest-inserted points win (deterministic).
    """
    cap = vm.capacity
    all_pts = jnp.concatenate([vm.points, pts], axis=0)
    all_nrm = jnp.concatenate([vm.normals, nrm], axis=0)
    all_msk = jnp.concatenate([vm.mask, msk], axis=0)
    n_tot = all_pts.shape[0]

    q = _quantize(all_pts, all_msk, voxel)  # (T, 3)
    order = jnp.lexsort((jnp.arange(n_tot), q[:, 2], q[:, 1], q[:, 0]))
    qs = q[order]
    same_as_prev = jnp.all(qs == jnp.roll(qs, 1, axis=0), axis=1)
    same_as_prev = same_as_prev.at[0].set(False)
    keep = (~same_as_prev) & all_msk[order]

    # compact keepers to the front; `rank` holds positions into the
    # voxel-sorted space (keepers first, then by eviction priority)
    if center is not None:
        diff = all_pts[order] - center[None, :]
        prio = jnp.sum(diff * diff, axis=-1)  # nearest-to-sensor survives
    else:
        prio = order.astype(all_pts.dtype)  # earliest-inserted survives
    rank = jnp.lexsort((prio, ~keep))
    chosen = order[rank[:cap]]
    new_pts = all_pts[chosen]
    new_nrm = all_nrm[chosen]
    new_msk = keep[rank[:cap]]
    new_pts = jnp.where(new_msk[:, None], new_pts, PAD_COORD)
    new_nrm = jnp.where(new_msk[:, None], new_nrm, 0.0)
    return VoxelMap(points=new_pts, normals=new_nrm, mask=new_msk)


def extract_local(vm: VoxelMap, center: jnp.ndarray, size: int,
                  radius: float = 0.0):
    """Nearest `size` map points to `center`: (pts (S,3), nrm (S,3), msk (S,),
    r_cover ()).

    radius > 0 additionally gates by euclidean distance. Fixed output shape
    regardless of map occupancy (invalid slots keep the sentinel coordinate).
    r_cover is the model's coverage radius — the distance to the farthest
    selected point (or `radius` if that gates first). Scan points beyond
    r_cover have no genuine counterpart in the model and must not be matched
    against its boundary (scan_to_map gates on this).
    """
    diff = vm.points - center[None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(vm.mask, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, size)
    msk = jnp.isfinite(neg)
    if radius > 0.0:
        msk = msk & (-neg <= radius * radius)
    # if the map still has free capacity the farthest-point bound is not a
    # coverage limit — everything known is in the model, so don't gate
    full = jnp.sum(vm.mask) > size
    r_sel = jnp.sqrt(jnp.maximum(-jnp.min(neg, initial=0.0, where=msk), 0.0))
    r_cover = jnp.where(full, r_sel, jnp.inf)
    if radius > 0.0:
        r_cover = jnp.minimum(r_cover, radius)
    pts = jnp.where(msk[:, None], vm.points[idx], PAD_COORD)
    nrm = jnp.where(msk[:, None], vm.normals[idx], 0.0)
    return pts, nrm, msk, r_cover


def count(vm: VoxelMap) -> jnp.ndarray:
    return jnp.sum(vm.mask.astype(jnp.int32))


def render_png(vm: VoxelMap, path: str, trajectory=None) -> None:
    """Top-down map render (height-colored) — the headless stand-in for the
    reference's GL point view (SURVEY.md §2c, R2 row), 3D edition."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    pts = np.asarray(vm.points)[np.asarray(vm.mask)]
    fig, ax = plt.subplots(figsize=(10, 10))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 1], c=pts[:, 2], s=0.5, cmap="viridis",
                   rasterized=True)
    if trajectory is not None:
        t = np.asarray(trajectory)
        ax.plot(t[:, 0], t[:, 1], "r-", linewidth=1.2, label="trajectory")
        ax.legend(loc="upper right")
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
