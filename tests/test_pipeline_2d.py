import os
import tempfile

import numpy as np

from tpu_icp_slam.config import SlamConfig, override
from tpu_icp_slam.eval import golden
from tpu_icp_slam.eval import metrics as em
from tpu_icp_slam.slam.runner import load_dataset, pad_scans, run_slam


def _cfg2d():
    return override(
        SlamConfig(),
        {
            "icp.max_corr_dist": 0.5,
            "icp.max_iters": 30,
            "icp.nn_backend": "xla",
            "pipeline.scan_capacity": 512,
            "mapping.grid_size": 256,
            "mapping.grid_resolution": 0.1,
            "mapping.ray_samples": 64,
        },
    )


def test_fused_pipeline_on_sim2d():
    cfg = _cfg2d()
    data = load_dataset("sim2d", frames=30)
    poses, report = run_slam(cfg, data, out_dir=None, mode="fused")
    assert poses.shape == (30, 3, 3)
    assert report["ate_rmse"] < 0.3, report["ate_rmse"]


def test_fused_matches_streaming():
    cfg = _cfg2d()
    data = load_dataset("sim2d", frames=10)
    poses_f, _ = run_slam(cfg, data, out_dir=None, mode="fused")
    poses_s, _ = run_slam(cfg, data, out_dir=None, mode="streaming")
    np.testing.assert_allclose(poses_f, poses_s, atol=1e-5)


def test_pipeline_agrees_with_golden_odometry():
    cfg = _cfg2d()
    data = load_dataset("sim2d", frames=20)
    poses, _ = run_slam(cfg, data, out_dir=None, mode="fused")
    gposes = golden.odometry(data.scans, max_iters=30, max_corr_dist=0.5)
    ate = em.ate_rmse(poses[:, :2, 2], gposes[:, :2, 2])
    assert ate < 0.05, ate


def test_artifacts_written():
    cfg = _cfg2d()
    data = load_dataset("sim2d", frames=8)
    with tempfile.TemporaryDirectory() as td:
        _, report = run_slam(cfg, data, out_dir=td, mode="fused")
        assert os.path.exists(os.path.join(td, "trajectory.npz"))
        assert os.path.exists(os.path.join(td, "map.png"))
        assert os.path.exists(os.path.join(td, "report.json"))
        assert os.path.exists(os.path.join(td, "metrics.jsonl"))


def test_checkpoint_resume_matches_straight_run():
    cfg = _cfg2d()
    data = load_dataset("sim2d", frames=12)
    with tempfile.TemporaryDirectory() as td:
        # run with checkpoints every 4 frames
        poses_full, _ = run_slam(
            cfg, data, out_dir=td, mode="streaming", checkpoint_every=4
        )
        # simulate crash: resume from the last checkpoint and rerun the tail
        poses_resumed, _ = run_slam(
            cfg, data, out_dir=td, mode="streaming", resume=True
        )
        np.testing.assert_allclose(poses_resumed[-1], poses_full[-1], atol=1e-5)


def test_carmen_roundtrip(tmp_path):
    from tpu_icp_slam.datasets import carmen, synthetic

    log = synthetic.lidar2d_log(n_frames=5, n_beams=180, seed=1)
    xyt = np.stack(
        [
            log.gt_poses[:, 0, 2],
            log.gt_poses[:, 1, 2],
            np.arctan2(log.gt_poses[:, 1, 0], log.gt_poses[:, 0, 0]),
        ],
        axis=1,
    )
    p = str(tmp_path / "synth.clf")
    carmen.write_clf(p, log.ranges, xyt, max_range=log.max_range)
    parsed = carmen.load_clf(p)
    assert parsed.ranges.shape == (5, 180)
    np.testing.assert_allclose(parsed.ranges, log.ranges, atol=1e-3)
    np.testing.assert_allclose(parsed.odometry, xyt, atol=1e-5)
    assert parsed.max_range == log.max_range


def test_run_clf_file(tmp_path):
    """End-to-end: serialize a synthetic log as .clf, run SLAM on the file."""
    from tpu_icp_slam.datasets import carmen, synthetic

    log = synthetic.lidar2d_log(n_frames=8, n_beams=360, seed=0, noise=0.002)
    xyt = np.zeros((8, 3))
    p = str(tmp_path / "lab.clf")
    carmen.write_clf(p, log.ranges, xyt, max_range=log.max_range)
    data = load_dataset(p, frames=8)
    assert data.dim == 2 and len(data.scans) == 8
    poses, report = run_slam(_cfg2d(), data, out_dir=None, mode="fused")
    assert poses.shape == (8, 3, 3)
