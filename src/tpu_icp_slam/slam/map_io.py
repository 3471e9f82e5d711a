"""Persistent maps: save a SLAM session's map + keyframe database, reload it
later and localize against it (SURVEY.md §5 checkpoint/resume, extended to
the mapping→localization product flow the reference never had — its only
state was the live run).

One .npz holds: the voxel map (points/normals/mask), the keyframe store
(padded scans + masks + world poses), and the scan-context descriptors.
`load_map` rebuilds a LoopDetector over the stored keyframes so
`localize_in_map` (descriptor ranking + multi-yaw ICP verification) answers
the kidnapped-robot query with a world pose.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from tpu_icp_slam.backend.loop_closure import LoopDetector
from tpu_icp_slam.config import BackendConfig
from tpu_icp_slam.mapping.voxel_map import VoxelMap


@dataclasses.dataclass
class SavedMap:
    vmap: Optional[VoxelMap]  # the dense model (None if not stored)
    kf_scans: list  # [(pts (C,D), msk (C,))] per keyframe
    kf_poses: np.ndarray  # (K, D+1, D+1) world poses
    detector: LoopDetector


def save_map(path: str, kf_scans, kf_poses, vmap: Optional[VoxelMap] = None,
             detector: Optional[LoopDetector] = None) -> None:
    arrs = {
        "kf_pts": np.stack([np.asarray(p) for p, _ in kf_scans]),
        "kf_msk": np.stack([np.asarray(m) for _, m in kf_scans]),
        "kf_poses": np.asarray(kf_poses),
    }
    if vmap is not None:
        arrs["map_points"] = np.asarray(vmap.points)
        arrs["map_normals"] = np.asarray(vmap.normals)
        arrs["map_mask"] = np.asarray(vmap.mask)
    if detector is not None and detector._descs:
        arrs["descs"] = np.stack(detector._descs)
    np.savez_compressed(path, **arrs)


def load_map(path: str, cfg: BackendConfig, max_range: float = 60.0) -> SavedMap:
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    kf_pts = data["kf_pts"]
    kf_msk = data["kf_msk"]
    kf_poses = data["kf_poses"]
    vmap = None
    if "map_points" in data:
        vmap = VoxelMap(
            points=jnp.asarray(data["map_points"]),
            normals=jnp.asarray(data["map_normals"]),
            mask=jnp.asarray(data["map_mask"]),
        )
    det = LoopDetector(cfg, max_range=max_range)
    d = kf_poses.shape[-1] - 1
    if "descs" in data:
        det._descs = [np.asarray(x) for x in data["descs"]]
        det._positions = [kf_poses[i][:d, d] for i in range(len(kf_poses))]
    else:
        for i in range(len(kf_pts)):
            det.add_keyframe(kf_pts[i], kf_msk[i], position=kf_poses[i][:d, d])
    scans = [(kf_pts[i], kf_msk[i]) for i in range(len(kf_pts))]
    return SavedMap(vmap=vmap, kf_scans=scans, kf_poses=kf_poses, detector=det)


def localize_in_map(saved: SavedMap, points, mask, topk: int = 3):
    """World pose of an arbitrary scan inside a loaded map, or None."""
    return saved.detector.relocalize(
        points, mask, saved.kf_scans, list(saved.kf_poses), topk=topk
    )
