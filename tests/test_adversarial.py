"""Adversarial-world tests (VERDICT r1 item 7).

Round-1 accuracy evidence rode entirely on friendly geometry (ground + walls
+ random clutter) and only TRUE-positive loops were tested. These worlds are
built to break the system the ways real environments do:

- perceptual aliasing: structurally identical bays, where descriptors match
  across physically distant places — the gating/verify machinery must
  REJECT those false closures;
- dynamic objects: geometry that moves between frames violates the
  static-scene assumption of every ICP variant;
- vertical sparsity: few elevation rings starve the 3D pipeline of
  structure.
"""

import numpy as np

from tpu_icp_slam.config import (
    BackendConfig, ICPConfig, MappingConfig, PipelineConfig, SlamConfig,
)
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.eval import metrics as em
from tpu_icp_slam.slam.runner import pad_scans


def _rel_to_first(gt):
    return np.einsum("ij,fjk->fik", np.linalg.inv(gt[0]), gt)


def _make_aliased_log(n_frames=36, seed=0):
    segs = synthetic.aliased_world_segments(n_bays=5, bay_len=8.0)
    # straight drive down the aliased corridor — NO revisit, so every
    # accepted closure is by construction a false positive
    waypoints = np.array([(-18.0, 0.0), (18.0, 0.0)])
    return synthetic.lidar2d_log_custom(
        segs, waypoints, n_frames=n_frames, n_beams=360, seed=seed, noise=0.005
    )


def test_aliased_world_really_aliases():
    """Sanity: descriptors of different bays ARE near-identical (the trap is
    real — otherwise the must-reject test below proves nothing)."""
    from tpu_icp_slam.backend.loop_closure import (
        scan_context, shift_match_scores,
    )
    import jax.numpy as jnp

    log = _make_aliased_log()
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(len(log.ranges))
    ]
    pts, msk = pad_scans(scans, 512)
    # two frames one bay period (8 m) apart, same in-bay phase
    gt = log.gt_poses
    xs = gt[:, 0, 2]
    i = int(np.argmin(np.abs(xs - (-12.0))))
    j = int(np.argmin(np.abs(xs - (-4.0))))
    di = scan_context(jnp.asarray(pts[i]), jnp.asarray(msk[i]),
                      rings=12, sectors=48, max_range=log.max_range)
    dj = scan_context(jnp.asarray(pts[j]), jnp.asarray(msk[j]),
                      rings=12, sectors=48, max_range=log.max_range)
    score, _ = shift_match_scores(di, dj[None])
    assert float(score[0]) > 0.75, (
        f"aliased bays should look alike to the descriptor, score={score}"
    )


def test_aliasing_must_reject_false_closures():
    """Straight (non-revisiting) drive through identical bays: the backend
    must accept ZERO closures — anything accepted is a false positive that
    would fold the map onto itself."""
    from tpu_icp_slam.slam.slam2d import Slam2D

    log = _make_aliased_log()
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(len(log.ranges))
    ]
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=30,
                      max_corr_dist=1.0, nn_backend="xla"),
        pipeline=PipelineConfig(scan_capacity=512, keyframe_trans=1.0,
                                keyframe_rot=0.3),
        # deliberately eager candidate search (small separation, low rmse bar
        # would pass aliases) — the position gate + odometry-consistency gate
        # are what must hold the line
        backend=BackendConfig(enabled=True, min_loop_separation=4,
                              candidate_topk=3, verify_max_rmse=0.3,
                              gating_radius=3.0, verify_max_dev=1.0,
                              descriptor_rings=12, descriptor_sectors=48),
    )
    pts, msk = pad_scans(scans, 512)
    slam = Slam2D(cfg, sensor_max_range=log.max_range)
    poses, rep = slam.run(pts, msk)
    assert rep.n_loop_closures == 0, (
        f"{rep.n_loop_closures} FALSE closures accepted in the aliased world "
        f"(from {rep.n_loop_candidates} candidates)"
    )
    # and the trajectory itself must stay sane (pure odometry quality; the
    # corridor is mostly parallel walls, so a few % drift along the travel
    # axis is the expected degeneracy — collapse means ATE in the many-metre
    # range where a false closure folded the map)
    gt_rel = _rel_to_first(log.gt_poses)
    ate = em.ate_rmse(poses[:, :2, 2], gt_rel[: len(poses), :2, 2])
    assert ate < 2.0, f"odometry collapsed in the aliased world: ATE {ate}"


def test_aliasing_gates_are_load_bearing():
    """Drop the position gate and the odometry-consistency gate: the same
    aliased world now produces accepted (false) closures — proving the gates
    (not luck) are what reject them above."""
    from tpu_icp_slam.backend.loop_closure import LoopDetector

    log = _make_aliased_log()
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(len(log.ranges))
    ]
    pts, msk = pad_scans(scans, 512)
    gt = log.gt_poses
    cfg = BackendConfig(enabled=True, min_loop_separation=4,
                        candidate_topk=3, verify_max_rmse=0.3,
                        gating_radius=0.0,  # position gate OFF
                        verify_max_dev=0.0,  # consistency gate OFF
                        descriptor_rings=12, descriptor_sectors=48)
    det = LoopDetector(cfg, max_range=log.max_range)
    # keyframes every ~2 frames along the straight drive
    kf = list(range(0, len(pts), 2))
    for f in kf:
        det.add_keyframe(pts[f], msk[f], position=gt[f][:2, 2])
    false_hits = 0
    for qi in range(len(kf) - 1, 1, -1):
        cands = det.candidates(qi)
        if not cands:
            continue
        mp = np.stack([pts[kf[c.match_idx]] for c in cands])
        mm = np.stack([msk[kf[c.match_idx]] for c in cands])
        lcs = det.verify_batch(cands, pts[kf[qi]], msk[kf[qi]], mp, mm)
        false_hits += sum(lc is not None for lc in lcs)
        if false_hits:
            break
    assert false_hits > 0, (
        "ungated verification rejected everything — the aliasing pressure "
        "is not real and the must-reject test is vacuous"
    )


def test_dynamic_object_odometry_bounded():
    """A pedestrian-sized box crosses the corridor mid-log; odometry must
    absorb the moving points (Huber + correspondence gates) without losing
    track."""
    segs = synthetic._default_world_segments()
    waypoints = np.array([(-10.0, 0.0), (10.0, 0.0)])
    n = 30
    log = synthetic.lidar2d_log_custom(
        segs, waypoints, n_frames=n, n_beams=360, seed=3, noise=0.005,
        dynamic_fn=synthetic.crossing_pedestrian(n, x=2.0),
    )
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(n)
    ]
    from tpu_icp_slam.slam.runner import LoadedDataset, run_slam

    data = LoadedDataset(scans=scans, gt_poses=_rel_to_first(log.gt_poses),
                         dim=2, name="dynamic2d")
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=30,
                      max_corr_dist=0.8, huber_delta=0.3, nn_backend="xla"),
        pipeline=PipelineConfig(scan_capacity=512),
    )
    poses, report = run_slam(cfg, data)
    assert report["ate_rmse"] < 0.5, (
        f"dynamic object broke tracking: ATE {report['ate_rmse']}"
    )


def test_vertical_sparsity_3d_tracking():
    """4 elevation rings (vs the friendly 16): the 3D scan-to-map pipeline
    must still track — sparse vertical structure is the KITTI-flat-suburb
    failure mode."""
    # path_fraction keeps inter-frame motion ~1 m/frame (KITTI-like); faster
    # hops are untrackable regardless of ring count and test nothing
    scans, gt = synthetic.velodyne_log(
        n_frames=12, n_rings=4, n_azimuth=256, path_fraction=0.1, seed=5
    )
    from tpu_icp_slam.core.pointcloud import voxel_downsample_np
    from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

    scans = [voxel_downsample_np(s, 0.4) for s in scans]
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_plane", max_iters=15,
                      max_corr_dist=1.5, damping=1e-3, huber_delta=0.3,
                      max_step_trans=1.0, max_step_rot=0.3, min_inliers=30,
                      nn_backend="xla"),
        mapping=MappingConfig(map_capacity=16384, local_model_size=4096,
                              map_voxel=0.3),
        pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=2048),
    )
    pts, msk = pad_scans(scans, 2048)
    pipe = ScanToMapPipeline(cfg)
    st = pipe.init_state(pts[0], msk[0])
    st, infos = pipe.run_fused(st, pts[1:], msk[1:])
    poses = np.concatenate(
        [np.eye(4)[None], np.asarray(infos["pose"], np.float64)]
    )
    gt_rel = np.einsum("ij,fjk->fik", np.linalg.inv(gt[0]), gt)
    ate = em.ate_rmse(poses[:, :3, 3], gt_rel[: len(poses), :3, 3])
    assert ate < 0.5, f"sparse-ring tracking lost: ATE {ate}"


def test_route_clearance_keeps_clutter_out_of_the_driving_lane():
    """velodyne_log must not put parked-clutter boxes ON the route (r3 root
    cause of the multisession seed lottery: lanes at y=-4/-2 ran through the
    +/-2.5-5 m clutter band and the sensor drove THROUGH box interiors,
    producing point-blank returns that broke the front-end on some seeds).

    Behavioral check: with the default clearance no return may appear at
    point-blank horizontal range; with clearance disabled the same
    route/seed does produce them (guards against a vacuous test).
    """
    wps = [(-36, -4), (-12, -4), (4, -4), (20, -4)]  # the multisession lane

    def min_horiz(scans):
        return min(
            float(np.min(np.linalg.norm(s[:, :2], axis=1))) for s in scans
        )

    # enough frames (~1.2 m spacing) that some sample lands inside a box
    kw = dict(n_frames=48, n_rings=10, n_azimuth=128, waypoints=wps, seed=4)
    scans_clear, _ = synthetic.velodyne_log(**kw)  # default clearance 1.0
    scans_dirty, _ = synthetic.velodyne_log(**kw, route_clearance=0.0)
    assert min_horiz(scans_dirty) < 0.8, "expected point-blank box returns"
    assert min_horiz(scans_clear) > 0.9, min_horiz(scans_clear)
