"""TUM RGB-D format round-trip + end-to-end through the runner."""

import numpy as np

from tpu_icp_slam.datasets import synthetic, tum


def test_tum_roundtrip(tmp_path):
    depths, poses, K = synthetic.rgbd_log(n_frames=3, K=synthetic.Intrinsics.tum_default(64, 48))
    tum.write_sequence(str(tmp_path), depths, gt_poses=poses)
    seq = tum.load_sequence(str(tmp_path))
    assert seq.depths.shape == depths.shape
    # 16-bit PNG at factor 5000 quantizes to 0.2 mm
    np.testing.assert_allclose(seq.depths, depths, atol=5e-4)
    np.testing.assert_allclose(seq.gt_poses, poses, atol=1e-5)


def test_tum_dir_through_runner(tmp_path):
    from tpu_icp_slam.config import ICPConfig, SlamConfig
    from tpu_icp_slam.slam.runner import load_dataset, run_slam

    depths, poses, K = synthetic.rgbd_log(n_frames=4, K=synthetic.Intrinsics.tum_default(64, 48))
    tum.write_sequence(str(tmp_path), depths, gt_poses=poses)
    data = load_dataset(str(tmp_path), frames=4)
    assert data.kind == "rgbd" and data.depths.shape[0] == 4
    cfg = SlamConfig(icp=ICPConfig(method="point_to_plane", max_iters=10,
                                   max_corr_dist=0.3))
    out, report = run_slam(cfg, data, out_dir=None)
    assert np.isfinite(out).all()
    assert "ate_rmse" in report
