"""2D SLAM with loop closure: mechanism test on an out-and-back route."""

import numpy as np

from tpu_icp_slam.config import (
    BackendConfig, ICPConfig, PipelineConfig, SlamConfig,
)
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.eval import metrics as em
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.slam2d import Slam2D


def test_slam2d_loop_closure_reduces_final_error():
    # drive down the corridor and back: end revisits the start exactly
    f_half = 40
    log = synthetic.lidar2d_log(n_frames=f_half, n_beams=360, seed=0, noise=0.01)
    fwd = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(f_half)
    ]
    scans = fwd + fwd[::-1][1:]
    gt = np.concatenate([log.gt_poses, log.gt_poses[::-1][1:]])
    gt_rel = np.einsum("ij,fjk->fik", np.linalg.inv(gt[0]), gt)

    base = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=30, max_corr_dist=1.0,
                      nn_backend="xla"),
        pipeline=PipelineConfig(scan_capacity=512, keyframe_trans=1.0,
                                keyframe_rot=0.3),
        backend=BackendConfig(enabled=True, min_loop_separation=8,
                              candidate_topk=3, verify_max_rmse=0.25,
                              gating_radius=3.0, verify_max_dev=1.2,
                              descriptor_rings=12, descriptor_sectors=48),
    )
    pts, msk = pad_scans(scans, 512)
    slam = Slam2D(base, sensor_max_range=log.max_range)
    poses, rep = slam.run(pts, msk)
    assert rep.n_loop_closures >= 1, (
        f"no closures on an exact revisit ({rep.n_loop_candidates} candidates)"
    )
    # at 28 frames the odometry drift is tiny: optimization must run and not
    # blow the objective up (approximate Jacobians can tick chi2 up slightly)
    assert rep.chi2 is not None and rep.chi2[-1] < rep.chi2[0] * 1.1

    import dataclasses as dc

    odo_cfg = dc.replace(base, backend=BackendConfig(enabled=False))
    slam_odo = Slam2D(odo_cfg, sensor_max_range=log.max_range)
    p_odo, _ = slam_odo.run(pts, msk)

    err = np.linalg.norm(poses[:, :2, 2] - gt_rel[: len(poses), :2, 2], axis=1)
    err_odo = np.linalg.norm(
        p_odo[:, :2, 2] - gt_rel[: len(p_odo), :2, 2], axis=1
    )
    # the closure must pull the end of the loop back toward the start
    assert err[-1] <= err_odo[-1] + 1e-6
    ate = em.ate_rmse(poses[:, :2, 2], gt_rel[: len(poses), :2, 2])
    ate_odo = em.ate_rmse(p_odo[:, :2, 2], gt_rel[: len(p_odo), :2, 2])
    assert ate <= ate_odo * 1.05, (ate, ate_odo)


def test_slam2d_scan_to_map_mode_tracks_tightly():
    """2D scan-to-map (z=0 lift): drift orders of magnitude under scan-to-scan."""
    import dataclasses as dc

    from tpu_icp_slam.config import MappingConfig

    log = synthetic.lidar2d_log(n_frames=60, n_beams=360, seed=0, noise=0.005,
                                loop=True)
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(60)
    ]
    gt_rel = np.einsum(
        "ij,fjk->fik", np.linalg.inv(log.gt_poses[0]), log.gt_poses
    )
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=25, max_corr_dist=0.7,
                      nn_backend="xla", damping=1e-3, max_step_trans=0.5,
                      max_step_rot=0.3, min_inliers=50, huber_delta=0.3,
                      step_scale=1.4, tol_update=0.002),
        mapping=MappingConfig(map_capacity=16384, local_model_size=2048,
                              map_voxel=0.08),
        pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=512,
                                keyframe_trans=0.8, keyframe_rot=0.2),
        backend=BackendConfig(enabled=False),
    )
    pts, msk = pad_scans(scans, 512)
    slam = Slam2D(cfg, sensor_max_range=log.max_range)
    poses, rep = slam.run(pts, msk)
    ate = em.ate_rmse(poses[:, :2, 2], gt_rel[: len(poses), :2, 2])
    assert ate < 0.25, f"2D scan-to-map ATE {ate}"
