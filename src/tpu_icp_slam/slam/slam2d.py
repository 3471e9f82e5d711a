"""Full 2D SLAM: scan-to-scan odometry + loop closure + pose-graph optimization.

Completes the 2D capability family (the reference's own domain, SURVEY.md §2a)
with the backend the reference never had: occupancy-count scan-context
descriptors (backend/loop_closure.py, 2D mode), multi-yaw ICP verification,
and SE(3)-embedded pose-graph GN (SE(2) poses/factors lifted via
core.se2.to_se3; planar factors keep the optimum planar, and the result
projects back to SE(2)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from tpu_icp_slam.backend.loop_closure import LoopClosure, LoopDetector
from tpu_icp_slam.backend import pose_graph as pg
from tpu_icp_slam.config import SlamConfig
from tpu_icp_slam.slam.pipeline import OdometryPipeline
from tpu_icp_slam.slam.slam3d import SlamReport


def _to3(T2: np.ndarray) -> np.ndarray:
    T = np.eye(4)
    T[:2, :2] = T2[:2, :2]
    T[:2, 3] = T2[:2, 2]
    return T


def _to2(T3: np.ndarray) -> np.ndarray:
    # project to SE(2): yaw from the rotation's upper-left block
    yaw = np.arctan2(T3[1, 0], T3[0, 0])
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, T3[0, 3]], [s, c, T3[1, 3]], [0, 0, 1]])


class Slam2D:
    """Scan-to-scan 2D front-end + loop-closure backend."""

    def __init__(self, cfg: SlamConfig, sensor_max_range: float = 12.0):
        self.cfg = cfg
        self.pipe = OdometryPipeline(cfg, dim=2)
        self.detector = LoopDetector(cfg.backend, max_range=sensor_max_range)

    def run(self, pts: np.ndarray, msk: np.ndarray):
        """pts (F, C, 2), msk (F, C) -> (poses (F, 3, 3) SE(2), SlamReport).

        pipeline.mode == "scan_to_map" lifts the scans to z = 0 and runs the
        3D voxel-map front-end (slam/scan_to_map.py) — planar clouds keep the
        pose exactly planar, and map-based matching cuts the scan-to-scan
        drift by orders of magnitude (measured 5.0 → 0.02 ATE on the loop
        log). The detector still sees the raw 2D scans (occupancy-count
        descriptors).
        """
        cfg = self.cfg
        p = cfg.pipeline
        if p.mode == "scan_to_map":
            from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

            pts3 = np.concatenate(
                [pts, np.zeros_like(pts[..., :1])], axis=-1
            ).astype(np.float32)
            pipe3 = ScanToMapPipeline(cfg)
            st = pipe3.init_state(pts3[0], msk[0])
            st, infos = pipe3.run_fused(st, pts3[1:], msk[1:])
            poses = np.concatenate(
                [np.eye(3)[None]]
                + [[_to2(T)] for T in np.asarray(infos["pose"], np.float64)]
            )
        else:
            state = self.pipe.init_state(pts[0], msk[0], with_grid=False)
            state, infos = self.pipe.run_fused(state, pts[1:], msk[1:])
            all_poses = np.asarray(infos["pose"], np.float64)
            poses = np.concatenate([np.eye(3)[None], all_poses])

        # host-side keyframe selection (the 2D pipeline has no keyframe flag)
        kf_frames = [0]
        kf_poses2 = [np.eye(3)]
        self.detector.add_keyframe(pts[0], msk[0], position=np.zeros(2))
        anchor_kf = [0]
        closures: list[LoopClosure] = []
        n_cands = 0
        for f in range(1, len(pts)):
            dK = np.linalg.inv(kf_poses2[-1]) @ poses[f]
            trans = np.linalg.norm(dK[:2, 2])
            rot = abs(np.arctan2(dK[1, 0], dK[0, 0]))
            if trans > p.keyframe_trans or rot > p.keyframe_rot:
                kf_idx = self.detector.add_keyframe(
                    pts[f], msk[f], position=poses[f][:2, 2]
                )
                kf_frames.append(f)
                kf_poses2.append(poses[f])
                if cfg.backend.enabled:
                    for cand in self.detector.candidates(kf_idx):
                        n_cands += 1
                        mi = cand.match_idx
                        T_pred = np.linalg.inv(kf_poses2[mi]) @ poses[f]
                        lc = self.detector.verify(
                            cand,
                            pts[f], msk[f],
                            pts[kf_frames[mi]], msk[kf_frames[mi]],
                            T_pred=T_pred,
                        )
                        if lc is not None:
                            closures.append(lc)
            anchor_kf.append(len(kf_frames) - 1)

        report = SlamReport(
            n_frames=len(pts),
            n_keyframes=len(kf_frames),
            n_loop_candidates=n_cands,
            n_loop_closures=len(closures),
        )
        if not (cfg.backend.enabled and closures):
            return poses, report

        # SE(3)-embedded pose graph over keyframes
        import jax.numpy as jnp

        kf3 = np.stack([_to3(T) for T in kf_poses2])
        factors = []
        for k in range(1, len(kf3)):
            rel = np.linalg.inv(kf3[k - 1]) @ kf3[k]
            factors.append((k - 1, k, rel, 1.0))
        for lc in closures:
            factors.append((lc.i, lc.j, _to3(lc.T_ij), 2.0))
        graph = pg.from_arrays(kf3, factors, dtype=jnp.float64)
        graph_opt, chis = pg.optimize(
            graph,
            iters=cfg.backend.pg_iters,
            damping=cfg.backend.pg_damping,
            huber_delta=cfg.backend.huber_delta,
        )
        kf_opt2 = np.stack(
            [_to2(T) for T in np.asarray(graph_opt.poses)[: len(kf3)]]
        )
        report.chi2 = [float(c) for c in np.asarray(chis)]

        out = np.empty_like(poses)
        for f in range(len(poses)):
            a = anchor_kf[f]
            rel = np.linalg.inv(kf_poses2[a]) @ poses[f]
            out[f] = kf_opt2[a] @ rel
        return out, report

    def rebuild_grid(self, poses: np.ndarray, pts: np.ndarray, msk: np.ndarray):
        """Re-raster the occupancy grid from (corrected) poses — the artifact
        stays consistent with the optimized trajectory (one fused scan)."""
        import jax
        import jax.numpy as jnp

        from tpu_icp_slam.mapping import occupancy2d

        m = self.cfg.mapping

        def build(poses_j, pts_j, msk_j):
            grid = occupancy2d.create(m.grid_size, m.grid_resolution)

            def body(g, frame):
                pose, p, mk = frame
                g = occupancy2d.update(
                    g, pose, p, mk,
                    hit=m.logodds_hit, free=m.logodds_free,
                    clip=m.logodds_clip, ray_samples=m.ray_samples,
                )
                return g, None

            grid, _ = jax.lax.scan(body, grid, (poses_j, pts_j, msk_j))
            return grid

        return jax.jit(build)(
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(msk),
        )
