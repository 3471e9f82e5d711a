"""eval.trajectory_io: TUM/KITTI text formats round-trip exactly."""

import numpy as np

from tpu_icp_slam.core import se3
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.eval import trajectory_io as tio


def _random_se3_trajectory(n=17, seed=3):
    rng = np.random.default_rng(seed)
    poses = [np.eye(4)]
    for _ in range(n - 1):
        xi = rng.normal(size=6) * np.r_[0.5, 0.5, 0.1, 0.05, 0.05, 0.2]
        import jax.numpy as jnp

        poses.append(poses[-1] @ np.asarray(se3.exp(jnp.asarray(xi)),
                                            np.float64))
    return np.stack(poses)


def test_tum_roundtrip(tmp_path):
    poses = _random_se3_trajectory()
    p = tmp_path / "traj_tum.txt"
    tio.write_tum(str(p), poses, timestamps=np.arange(len(poses)) * 0.1)
    ts, back = tio.read_tum(str(p))
    np.testing.assert_allclose(ts, np.arange(len(poses)) * 0.1, atol=1e-9)
    np.testing.assert_allclose(back, poses, atol=1e-7)


def test_kitti_roundtrip(tmp_path):
    poses = _random_se3_trajectory(seed=9)
    p = tmp_path / "traj_kitti.txt"
    tio.write_kitti(str(p), poses)
    back = tio.read_kitti(str(p))
    np.testing.assert_allclose(back, poses, atol=1e-9)


def test_se2_lift(tmp_path):
    """2D trajectories export as z=0 / yaw-only SE(3)."""
    th = np.linspace(0, 1.2, 8)
    poses2 = np.tile(np.eye(3), (8, 1, 1))
    poses2[:, 0, 0] = np.cos(th)
    poses2[:, 0, 1] = -np.sin(th)
    poses2[:, 1, 0] = np.sin(th)
    poses2[:, 1, 1] = np.cos(th)
    poses2[:, 0, 2] = np.arange(8) * 0.7
    p = tmp_path / "traj2d.txt"
    tio.write_tum(str(p), poses2)
    _, back = tio.read_tum(str(p))
    np.testing.assert_allclose(back[:, 2, 3], 0.0, atol=1e-9)
    np.testing.assert_allclose(back[:, 0, 3], np.arange(8) * 0.7, atol=1e-7)
    np.testing.assert_allclose(back[:, :2, :2], poses2[:, :2, :2], atol=1e-7)


def test_runner_writes_standard_formats(tmp_path):
    """cli run's artifact writer emits TUM + KITTI next to trajectory.npz."""
    from tpu_icp_slam.config import ICPConfig, PipelineConfig, SlamConfig
    from tpu_icp_slam.slam.runner import LoadedDataset, run_slam

    log = synthetic.lidar2d_log(n_frames=6, n_beams=180, seed=0)
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(6)
    ]
    gt_rel = np.einsum(
        "ij,fjk->fik", np.linalg.inv(log.gt_poses[0]), log.gt_poses
    )
    data = LoadedDataset(scans=scans, gt_poses=gt_rel, dim=2, name="t")
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=15,
                      max_corr_dist=1.0, nn_backend="xla"),
        pipeline=PipelineConfig(scan_capacity=256),
    )
    poses, report = run_slam(cfg, data, out_dir=str(tmp_path))
    ts, back = tio.read_tum(str(tmp_path / "trajectory_tum.txt"))
    assert len(back) == len(poses)
    kb = tio.read_kitti(str(tmp_path / "trajectory_kitti.txt"))
    np.testing.assert_allclose(
        kb[:, :2, 3], np.asarray(poses)[:, :2, 2], atol=1e-6
    )
