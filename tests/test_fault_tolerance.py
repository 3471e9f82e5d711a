"""Failure detection / recovery (SURVEY.md §5): corrupt frames are skipped."""

import numpy as np

from tpu_icp_slam.config import PipelineConfig, SlamConfig
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.slam.runner import LoadedDataset, run_slam


def test_streaming_skips_nan_frame(tmp_path):
    log = synthetic.lidar2d_log(n_frames=12, n_beams=180, seed=0)
    scans = [
        synthetic.scan_to_points(log.ranges[i], log.angles, log.max_range)
        for i in range(12)
    ]
    # fault injection: frame 5 is garbage (NaN coordinates)
    scans[5] = np.full_like(scans[5], np.nan)
    data = LoadedDataset(scans=scans, gt_poses=None, dim=2, name="faulty")
    cfg = SlamConfig(pipeline=PipelineConfig(scan_capacity=256))
    poses, report = run_slam(
        cfg, data, out_dir=str(tmp_path), mode="streaming", checkpoint_every=0
    )
    assert np.isfinite(poses).all(), "corrupt frame poisoned the trajectory"
    assert len(poses) == 12
    # the corrupt frame was dropped: pose held, event logged, and the frames
    # after it keep tracking (state reverted so frame 6 aligns vs frame 4)
    np.testing.assert_allclose(poses[5], poses[4])
    logged = (tmp_path / "metrics.jsonl").read_text()
    assert "frame_skipped_degenerate" in logged or "frame_error" in logged
    assert not np.allclose(poses[6], poses[5]), "tracking did not resume"


def test_checkpoint_resume_scan_to_map(tmp_path):
    from tpu_icp_slam.slam.checkpoint import load_checkpoint, save_checkpoint
    from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline
    from tpu_icp_slam.slam.runner import pad_scans
    from tpu_icp_slam.core.pointcloud import voxel_downsample_np
    from tpu_icp_slam.config import ICPConfig, MappingConfig

    scans, _ = synthetic.velodyne_log(
        n_frames=5, n_rings=8, n_azimuth=128, path_fraction=0.15
    )
    scans = [voxel_downsample_np(s, 0.6) for s in scans]
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=8, max_corr_dist=2.0,
                      nn_backend="xla"),
        mapping=MappingConfig(map_capacity=4096, local_model_size=1024,
                              map_voxel=0.5),
        pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=512),
    )
    pts, msk = pad_scans(scans, 512)
    pipe = ScanToMapPipeline(cfg)
    st = pipe.init_state(pts[0], msk[0])
    hist = [np.eye(4)]
    for i in range(1, 3):
        st, info = pipe.step(st, pts[i], msk[i])
        hist.append(np.asarray(info["pose"]))
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, st, 3, hist)
    st2, nxt, hist2 = load_checkpoint(ckpt, cfg)
    assert nxt == 3 and len(hist2) == 3
    np.testing.assert_allclose(np.asarray(st2.pose), np.asarray(st.pose))
    np.testing.assert_allclose(
        np.asarray(st2.vmap.points), np.asarray(st.vmap.points)
    )
    # resumed state continues identically
    st_a, info_a = pipe.step(st, pts[3], msk[3])
    st_b, info_b = pipe.step(st2, pts[3], msk[3])
    np.testing.assert_allclose(
        np.asarray(info_a["pose"]), np.asarray(info_b["pose"]), atol=1e-6
    )
