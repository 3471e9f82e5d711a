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
    # closure-confidence metadata (VERDICT r2 item 9): which accepted loop
    # closures built this map, their PCM cycle scores, and suspect flags —
    # a localize consumer can tell a clean map from one past the measured
    # aliasing wall (DESIGN.md §13)
    closure_info: Optional[list] = None  # [{i, j, cycle_score_m, suspect}]

    @property
    def n_suspect_closures(self) -> int:
        if not self.closure_info:
            return 0
        return sum(1 for c in self.closure_info if c["suspect"])


def save_map(path: str, kf_scans, kf_poses, vmap: Optional[VoxelMap] = None,
             detector: Optional[LoopDetector] = None,
             closure_info: Optional[list] = None) -> None:
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
        # Descriptor geometry MUST travel with the descriptors: a localize
        # session that rebinned queries with different ring/sector extents
        # would silently mis-rank candidates (ADVICE r2, medium — 2D maps
        # are built with sensor_max_range=12 while load_map defaulted to 60,
        # a 5x ring-binning mismatch rescued only by ICP verification).
        arrs["desc_params"] = np.asarray([
            detector.max_range,
            detector.cfg.descriptor_rings,
            detector.cfg.descriptor_sectors,
        ])
    if closure_info:
        arrs["closure_meta"] = np.asarray([
            [c["i"], c["j"],
             np.nan if c.get("cycle_score_m") is None else c["cycle_score_m"],
             float(bool(c["suspect"]))]
            for c in closure_info
        ], np.float64)
    np.savez_compressed(path, **arrs)


def load_map(path: str, cfg: BackendConfig, max_range: float = 60.0) -> SavedMap:
    import dataclasses as _dc
    import logging

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
    if "desc_params" in data:
        # stored geometry wins: query descriptors must be binned exactly like
        # the stored ones or ranking degrades/crashes (ADVICE r2)
        s_range, s_rings, s_sectors = (
            float(data["desc_params"][0]),
            int(data["desc_params"][1]),
            int(data["desc_params"][2]),
        )
        if (s_rings != cfg.descriptor_rings
                or s_sectors != cfg.descriptor_sectors
                or abs(s_range - max_range) > 1e-6):
            logging.getLogger(__name__).warning(
                "map %s was built with descriptor geometry (max_range=%g, "
                "rings=%d, sectors=%d) != requested (%g, %d, %d) — using the "
                "stored geometry", path, s_range, s_rings, s_sectors,
                max_range, cfg.descriptor_rings, cfg.descriptor_sectors,
            )
        cfg = _dc.replace(
            cfg, descriptor_rings=s_rings, descriptor_sectors=s_sectors
        )
        max_range = s_range
    det = LoopDetector(cfg, max_range=max_range)
    d = kf_poses.shape[-1] - 1
    if "descs" in data:
        det._descs = [np.asarray(x) for x in data["descs"]]
        det._positions = [kf_poses[i][:d, d] for i in range(len(kf_poses))]
    else:
        for i in range(len(kf_pts)):
            det.add_keyframe(kf_pts[i], kf_msk[i], position=kf_poses[i][:d, d])
    scans = [(kf_pts[i], kf_msk[i]) for i in range(len(kf_pts))]
    closure_info = None
    if "closure_meta" in data:
        cm = data["closure_meta"]
        closure_info = [
            {
                "i": int(row[0]), "j": int(row[1]),
                "cycle_score_m": None if np.isnan(row[2]) else float(row[2]),
                "suspect": bool(row[3]),
            }
            for row in cm
        ]
        n_sus = sum(1 for c in closure_info if c["suspect"])
        if n_sus:
            logging.getLogger(__name__).warning(
                "map %s contains %d/%d SUSPECT loop closures (PCM cycle "
                "score above the alias threshold) — localization near those "
                "regions may be off by the alias spacing (DESIGN.md §13)",
                path, n_sus, len(closure_info),
            )
    return SavedMap(vmap=vmap, kf_scans=scans, kf_poses=kf_poses,
                    detector=det, closure_info=closure_info)


def localize_in_map(saved: SavedMap, points, mask, topk: int = 3):
    """World pose of an arbitrary scan inside a loaded map, or None."""
    return saved.detector.relocalize(
        points, mask, saved.kf_scans, list(saved.kf_poses), topk=topk
    )
