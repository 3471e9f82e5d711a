"""Dataset-to-trajectory runner behind `cli run` / `cli eval` (N12/N22 glue).

Loads a dataset (synthetic generators or real-format files), pads scans to
static shapes, drives the pipeline (fused scan on device, or streaming), and
writes artifacts: trajectory .npz, map render .png, metrics .jsonl — the
headless equivalents of the reference app's window (SURVEY.md §2a R2).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from tpu_icp_slam.config import SlamConfig, config_hash, from_json, override
from tpu_icp_slam.core.pointcloud import PAD_COORD
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.obs import MetricsLogger, Timer


@dataclasses.dataclass
class LoadedDataset:
    scans: list  # list of (N_i, D) float arrays (sensor frame); empty for rgbd
    gt_poses: Optional[np.ndarray]  # (F, D+1, D+1) or None
    dim: int
    name: str
    kind: str = "scan"  # scan | rgbd
    depths: Optional[np.ndarray] = None  # (F, H, W) for rgbd
    intrinsics: Optional[tuple] = None  # (fx, fy, cx, cy, W, H) for rgbd


def load_dataset(spec: str, frames: int, seed: int = 0) -> LoadedDataset:
    if spec == "sim2d":
        log = synthetic.lidar2d_log(n_frames=frames, n_beams=360, seed=seed, noise=0.002)
        scans = [
            synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
            for i in range(len(log.ranges))
        ]
        return LoadedDataset(scans=scans, gt_poses=log.gt_poses, dim=2, name="sim2d")
    if spec == "sim2d_loop":
        log = synthetic.lidar2d_log(
            n_frames=frames, n_beams=360, seed=seed, noise=0.002, loop=True
        )
        scans = [
            synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
            for i in range(len(log.ranges))
        ]
        return LoadedDataset(scans=scans, gt_poses=log.gt_poses, dim=2, name="sim2d_loop")
    if spec in ("sim3d", "sim3d_loop"):
        # pin inter-frame motion to ~1.1 m/frame (the KITTI 10 Hz regime):
        # the generator resamples its fixed route by frame count, so short
        # logs at path_fraction=1.0 move several m/frame — faster than any
        # real sensor and untrackable by design (r2 regime fix). The loop
        # route needs the full circuit to close, so it keeps fraction 1.
        frac = 1.0 if spec.endswith("loop") else min(1.0, frames / 110.0)
        scans, poses = synthetic.velodyne_log(
            n_frames=frames, seed=seed, loop=spec.endswith("loop"),
            path_fraction=frac,
        )
        return LoadedDataset(scans=scans, gt_poses=poses, dim=3, name=spec)
    if spec in ("simrgbd", "simrgbd_fullres"):
        # fullres = TUM fr1's real 640x480 sensor grid (307k px/frame), the
        # BASELINE.json config-3 regime; plain simrgbd keeps the fast
        # 160x120 ladder stand-in (VERDICT r2 item 6)
        K_in = (
            synthetic.Intrinsics.tum_default(640, 480)
            if spec == "simrgbd_fullres" else None
        )
        depths, poses, K = synthetic.rgbd_log(
            n_frames=frames, K=K_in, seed=seed
        )
        return LoadedDataset(
            scans=[],
            gt_poses=poses,
            dim=3,
            name=spec,
            kind="rgbd",
            depths=depths,
            intrinsics=(K.fx, K.fy, K.cx, K.cy, K.width, K.height),
        )
    if os.path.isdir(spec) and os.path.exists(os.path.join(spec, "depth.txt")):
        from tpu_icp_slam.datasets import tum

        seq = tum.load_sequence(spec, max_frames=frames)
        h, w = seq.depths.shape[1:]
        fx, fy, cx, cy = seq.intrinsics
        return LoadedDataset(
            scans=[],
            gt_poses=seq.gt_poses,
            dim=3,
            name=os.path.basename(spec.rstrip("/")),
            kind="rgbd",
            depths=seq.depths,
            intrinsics=(fx, fy, cx, cy, w, h),
        )
    if spec.endswith(".clf") or spec.endswith(".log"):
        from tpu_icp_slam.datasets import carmen

        log = carmen.load_clf(spec)
        n = min(frames, len(log.ranges)) if frames > 0 else len(log.ranges)
        scans = [
            synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
            for i in range(n)
        ]
        return LoadedDataset(scans=scans, gt_poses=None, dim=2, name=os.path.basename(spec))
    if os.path.isdir(spec) and os.path.exists(os.path.join(spec, "velodyne")):
        from tpu_icp_slam.datasets import kitti

        scans, poses = kitti.load_sequence(spec, max_frames=frames)
        return LoadedDataset(scans=scans, gt_poses=poses, dim=3, name=os.path.basename(spec))
    raise ValueError(f"unknown dataset spec: {spec}")


def pad_scans(scans: list, capacity: int):
    """list of (N_i, D) -> (F, C, D) points + (F, C) masks (sentinel padded).

    Oversized scans are subsampled UNIFORMLY, never truncated: scan points
    arrive ordered (by elevation ring for Velodyne, by azimuth for 2D), so
    truncation silently deletes whole regions of the field of view —
    measured to break tracking through narrow passages (BASELINE.md).
    """
    f = len(scans)
    d = scans[0].shape[1]
    pts = np.full((f, capacity, d), PAD_COORD, np.float32)
    msk = np.zeros((f, capacity), bool)
    for i, s in enumerate(scans):
        if len(s) > capacity:
            sel = np.linspace(0, len(s) - 1, capacity).astype(np.int64)
            s = s[sel]
        n = len(s)
        pts[i, :n] = s
        msk[i, :n] = True
    return pts, msk


def run_rgbd(
    cfg: SlamConfig,
    data: LoadedDataset,
    out_dir: Optional[str] = None,
    mode: str = "fused",
):
    """RGB-D odometry (config 3): projective point-to-plane ICP per frame."""
    import dataclasses as dc

    from tpu_icp_slam.icp.projective import CameraIntrinsics
    from tpu_icp_slam.slam.rgbd import RGBDOdometry

    timer = Timer()
    fx, fy, cx, cy, w, h = data.intrinsics
    K = CameraIntrinsics(fx=fx, fy=fy, cx=cx, cy=cy, width=w, height=h)
    if cfg.icp.method != "point_to_plane":
        cfg = dc.replace(cfg, icp=dc.replace(cfg.icp, method="point_to_plane"))
    pipe = RGBDOdometry(cfg, K)
    state = pipe.init_state(data.depths[0])
    poses = [np.eye(4, dtype=np.float32)]
    with timer.span("compile+run"):
        if mode == "fused":
            state, infos = pipe.run_fused(state, data.depths[1:])
            poses.extend(list(np.asarray(infos["pose"])))
        else:
            for i in range(1, len(data.depths)):
                state, info = pipe.step(state, data.depths[i])
                poses.append(np.asarray(info["pose"]))
    poses = np.stack(poses)
    report = {
        "frames": len(poses),
        "dataset": data.name,
        "config_hash": config_hash(cfg),
        "mode": mode,
        "timers": timer.summary(),
    }
    if data.gt_poses is not None:
        from tpu_icp_slam.eval import metrics as em

        gt = data.gt_poses[: len(poses)]
        report["ate_rmse"] = em.ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        t_rpe, r_rpe = em.rpe(poses, gt)
        report["rpe_trans"] = t_rpe
        report["rpe_rot"] = r_rpe
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        np.savez(os.path.join(out_dir, "trajectory.npz"), poses=poses)
        from tpu_icp_slam.eval import trajectory_io as tio

        tio.write_tum(os.path.join(out_dir, "trajectory_tum.txt"), poses)
        tio.write_kitti(os.path.join(out_dir, "trajectory_kitti.txt"), poses)
        with open(os.path.join(out_dir, "report.json"), "w") as fh:
            json.dump(report, fh, indent=2)
    return poses, report



def _make_report(poses, data, cfg, mode: str, timer, extra: dict | None = None):
    """Shared report assembly: identity, timers, and GT accuracy metrics."""
    report = {
        "frames": len(poses),
        "dataset": data.name,
        "config_hash": config_hash(cfg),
        "mode": mode,
        **(extra or {}),
        "timers": timer.summary(),
    }
    if data.gt_poses is not None:
        from tpu_icp_slam.eval import metrics as em

        gt = data.gt_poses[: len(poses)]
        d = data.dim
        report["ate_rmse"] = em.ate_rmse(poses[:, :d, d], gt[:, :d, d])
        t_rpe, r_rpe = em.rpe(poses, gt)
        report["rpe_trans"] = t_rpe
        report["rpe_rot"] = r_rpe
    return report


def _write_artifacts(out_dir, poses, report, render_map=None):
    """trajectory.npz (+ TUM/KITTI text) + map render + report.json."""
    if not out_dir:
        return
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "trajectory.npz"), poses=poses)
    # standard-format exports so external tooling (evo, the KITTI devkit)
    # can score the trajectory directly
    from tpu_icp_slam.eval import trajectory_io as tio

    tio.write_tum(os.path.join(out_dir, "trajectory_tum.txt"), poses)
    tio.write_kitti(os.path.join(out_dir, "trajectory_kitti.txt"), poses)
    if render_map is not None:
        png = os.path.join(out_dir, "map.png")
        render_map(png)
        report["map_png"] = png
    with open(os.path.join(out_dir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)


def _finish(metrics_log, report):
    metrics_log.log(
        "done", **{k: v for k, v in report.items() if not isinstance(v, dict)}
    )
    metrics_log.close()


def run_slam(
    cfg: SlamConfig,
    data: LoadedDataset,
    out_dir: Optional[str] = None,
    mode: str = "fused",
    checkpoint_every: int = 0,
    resume: bool = False,
    save_map_path: Optional[str] = None,
):
    """Returns (poses (F, D+1, D+1) np.ndarray, report dict)."""
    if data.kind == "rgbd":
        return run_rgbd(cfg, data, out_dir=out_dir, mode=mode)
    import jax.numpy as jnp

    from tpu_icp_slam.slam.pipeline import OdometryPipeline

    timer = Timer()
    metrics_log = MetricsLogger(
        os.path.join(out_dir, "metrics.jsonl") if out_dir else None,
        static_fields={"config_hash": config_hash(cfg), "dataset": data.name},
    )
    cap = cfg.pipeline.scan_capacity
    with timer.span("preprocess"):
        scans = data.scans
        if cfg.pipeline.downsample_voxel > 0:
            from tpu_icp_slam.core.pointcloud import voxel_downsample_np

            scans = [voxel_downsample_np(s, cfg.pipeline.downsample_voxel) for s in scans]
        pts, msk = pad_scans(scans, cap)

    ckpt_path = os.path.join(out_dir, "checkpoint.npz") if out_dir else None
    if cfg.pipeline.mode == "scan_to_map" and data.dim == 3:
        if cfg.backend.enabled:
            # full config-4 path: scan-to-map + loop closure + pose graph.
            # checkpoint/resume serializes the FULL slam state (front-end
            # pytree + keyframe DB + closures) — see Slam3D.run
            from tpu_icp_slam.slam.slam3d import Slam3D

            slam = Slam3D(cfg)
            with timer.span("slam3d"):
                poses, srep = slam.run(
                    pts, msk,
                    mode="streaming" if mode == "streaming" else "fused",
                    checkpoint_path=ckpt_path,
                    checkpoint_every=checkpoint_every,
                    resume=resume,
                )
            report = _make_report(poses, data, cfg, "slam3d", timer, extra={
                "n_keyframes": srep.n_keyframes,
                "n_loop_candidates": srep.n_loop_candidates,
                "n_loop_closures": srep.n_loop_closures,
                "n_loops_rejected": srep.n_loops_rejected,
                "n_suspect_closures": srep.n_suspect_closures,
                "closures": srep.closure_table,
            })
            render = None
            if slam.final_state is not None:
                from tpu_icp_slam.mapping import voxel_map as vmr

                render = lambda png: vmr.render_png(
                    slam.final_state.vmap, png, trajectory=poses[:, :3, 3]
                )
            if save_map_path:
                # persistent map (slam/map_io.py): keyframe scans +
                # (loop-corrected) poses + descriptors + voxel model, for
                # later `cli localize` / multi-session work
                from tpu_icp_slam.slam import map_io

                kf_scans = [(pts[f], msk[f]) for f in slam.kf_frames]
                map_io.save_map(
                    save_map_path,
                    kf_scans,
                    np.stack(slam.kf_poses_out),
                    vmap=(
                        slam.final_state.vmap if slam.final_state else None
                    ),
                    detector=slam.detector,
                    closure_info=srep.closure_table,
                )
                report["map_file"] = save_map_path
            _write_artifacts(out_dir, poses, report, render)
            _finish(metrics_log, report)
            return poses, report
        from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

        pipe = ScanToMapPipeline(cfg)
    elif data.dim == 2 and (
        cfg.backend.enabled or cfg.pipeline.mode == "scan_to_map"
    ):
        # 2D family with map-based front-end and/or loop closure + pose graph
        from tpu_icp_slam.slam.slam2d import Slam2D

        slam = Slam2D(cfg)
        with timer.span("slam2d"):
            poses, srep = slam.run(
                pts, msk,
                mode="streaming" if mode == "streaming" else "fused",
                checkpoint_path=ckpt_path,
                checkpoint_every=checkpoint_every,
                resume=resume,
            )
        report = _make_report(poses, data, cfg, "slam2d", timer, extra={
            "n_keyframes": srep.n_keyframes,
            "n_loop_candidates": srep.n_loop_candidates,
            "n_loop_closures": srep.n_loop_closures,
            "n_loops_rejected": srep.n_loops_rejected,
            "n_suspect_closures": srep.n_suspect_closures,
            "closures": srep.closure_table,
        })

        def render(png):
            # grid rebuilt from the (possibly loop-corrected) trajectory
            from tpu_icp_slam.mapping import occupancy2d

            grid = slam.rebuild_grid(poses, pts, msk)
            occupancy2d.render_png(grid, png, trajectory=poses[:, :2, 2])

        if save_map_path:
            # 2D persistent map: keyframe scans + SE(2) poses + descriptors
            # (map_io handles both 3x3 and 4x4 pose conventions)
            from tpu_icp_slam.slam import map_io

            kf_scans = [(pts[f], msk[f]) for f in slam.kf_frames]
            map_io.save_map(
                save_map_path, kf_scans, np.stack(slam.kf_poses_out),
                detector=slam.detector, closure_info=srep.closure_table,
            )
            report["map_file"] = save_map_path
        _write_artifacts(out_dir, poses, report, render)
        _finish(metrics_log, report)
        return poses, report
    else:
        pipe = OdometryPipeline(cfg, dim=data.dim)
    start_idx = 1
    state = None
    if resume and ckpt_path and os.path.exists(ckpt_path):
        from tpu_icp_slam.slam.checkpoint import load_checkpoint

        state, start_idx, prev_poses = load_checkpoint(ckpt_path, cfg)
        metrics_log.log("resume", frame=start_idx)
    if state is None:
        state = pipe.init_state(pts[0], msk[0])
        prev_poses = [np.eye(data.dim + 1, dtype=np.float32)]

    poses = list(prev_poses)
    if mode == "fused" and not resume and checkpoint_every == 0:
        with timer.span("compile+run_fused"):
            state, infos = pipe.run_fused(state, pts[1:], msk[1:])
            run_poses = np.asarray(infos["pose"])
        poses.extend(list(run_poses))
        iters = np.asarray(infos["iters"])
        rmses = np.asarray(infos["rmse"])
        metrics_log.log(
            "fused_run",
            frames=len(poses),
            mean_icp_iters=float(iters.mean()),
            mean_rmse=float(rmses.mean()),
        )
    else:
        with timer.span("run_streaming"):
            for i in range(start_idx, len(pts)):
                # failure detection (SURVEY.md §5): a corrupt frame (NaN/inf
                # input, sensor glitch) must not poison the run — under jit
                # nothing raises, so detect by value: non-finite pose => drop
                # the frame, keep the previous state, log, continue
                prev_state = state
                try:
                    state, info = pipe.step(state, pts[i], msk[i])
                    pose_np = np.asarray(info["pose"])
                except Exception as exc:  # host-side failure: skip the frame
                    metrics_log.log("frame_error", frame=i, error=repr(exc))
                    state = prev_state
                    poses.append(poses[-1])
                    continue
                rmse = float(info["rmse"]) if "rmse" in info else 0.0
                n_inl = int(info["n_inliers"]) if "n_inliers" in info else 1
                bad = (not np.isfinite(pose_np).all()) or (
                    not np.isfinite(rmse)
                ) or n_inl == 0
                if bad:
                    metrics_log.log(
                        "frame_skipped_degenerate", frame=i, n_inliers=n_inl
                    )
                    state = prev_state
                    poses.append(poses[-1])
                    continue
                poses.append(pose_np)
                if checkpoint_every and out_dir and i % checkpoint_every == 0:
                    from tpu_icp_slam.slam.checkpoint import save_checkpoint

                    save_checkpoint(ckpt_path, state, i + 1, poses, cfg=cfg)
                    metrics_log.log("checkpoint", frame=i + 1)

    poses = np.stack(poses)
    report = _make_report(poses, data, cfg, mode, timer)
    render = None
    if getattr(state, "vmap", None) is not None:
        from tpu_icp_slam.mapping import voxel_map as vmr

        render = lambda png: vmr.render_png(
            state.vmap, png, trajectory=poses[:, :3, 3]
        )
    elif getattr(state, "grid", None) is not None:
        from tpu_icp_slam.mapping import occupancy2d

        render = lambda png: occupancy2d.render_png(
            state.grid, png, trajectory=poses[:, :2, 2]
        )
    _write_artifacts(out_dir, poses, report, render)
    _finish(metrics_log, report)
    return poses, report


def _build_cfg(args) -> SlamConfig:
    cfg = SlamConfig()
    if getattr(args, "config", None):
        with open(args.config) as fh:
            cfg = from_json(fh.read())
    if getattr(args, "override_dict", None):
        cfg = override(cfg, args.override_dict)
    return cfg


def run_from_cli(args) -> int:
    cfg = _build_cfg(args)
    from tpu_icp_slam.config import apply_debug

    apply_debug(cfg.debug)
    data = load_dataset(args.dataset, args.frames)
    mode = "streaming" if (args.resume or args.checkpoint_every) else "fused"
    _, report = run_slam(
        cfg,
        data,
        out_dir=args.out,
        mode=mode,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
        save_map_path=getattr(args, "save_map", None),
    )
    print(json.dumps(report, indent=2))
    return 0
