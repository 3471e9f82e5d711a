"""Flagship-length mechanics (VERDICT r2 item 1, CPU-sized versions):

- keyframe-DB / factor-capacity overflow: a log producing MORE keyframes
  and factors than backend.max_keyframes / max_factors must not truncate or
  crash — pg.from_arrays grows capacity to the actual count (the config
  caps are padding minimums, not hard limits) and the detector's device
  store doubles (_ensure_capacity).
- chunked-fused execution (Slam3D chunk_frames): identical trajectory to
  the single-dispatch fused run, with per-chunk wall stats and per-chunk
  checkpoints for mid-log recovery.
"""

import numpy as np

from tpu_icp_slam.config import (
    BackendConfig, ICPConfig, MappingConfig, PipelineConfig, SlamConfig,
)
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.slam3d import Slam3D


def _cfg(**backend_over):
    backend = dict(enabled=True, min_loop_separation=4, candidate_topk=2)
    backend.update(backend_over)
    return SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=8, max_corr_dist=2.0,
                      nn_backend="xla"),
        mapping=MappingConfig(map_capacity=4096, local_model_size=1024,
                              map_voxel=0.5),
        pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=512,
                                keyframe_trans=0.6, keyframe_rot=0.2),
        backend=BackendConfig(**backend),
    )


def _log(n=14):
    scans, _ = synthetic.velodyne_log(
        n_frames=n, n_rings=8, n_azimuth=128, path_fraction=0.15, seed=1
    )
    return pad_scans([voxel_downsample_np(s, 0.6) for s in scans], 512)


def test_keyframe_db_overflow_grows_not_truncates():
    """Caps of 3 keyframes / 2 factors on a log that produces many more:
    every keyframe must still enter the pose graph and the detector store."""
    pts, msk = _log()
    cfg = _cfg(max_keyframes=3, max_factors=2)
    slam = Slam3D(cfg)
    poses, rep = slam.run(pts, msk, mode="fused")
    assert rep.n_keyframes > 3, rep  # the cap was genuinely exceeded
    assert len(slam.kf_poses_out) == rep.n_keyframes  # nothing truncated
    assert np.isfinite(poses).all()
    # detector device store grew past its initial capacity too
    assert len(slam.detector._descs) == rep.n_keyframes
    assert slam.detector._descs_dev.shape[0] >= rep.n_keyframes


def test_chunked_fused_matches_single_dispatch(tmp_path):
    pts, msk = _log()
    cfg = _cfg()
    ref_poses, ref_rep = Slam3D(cfg).run(pts, msk, mode="fused")
    slam = Slam3D(cfg)
    ck = str(tmp_path / "chunk_ck.npz")
    chk_poses, chk_rep = slam.run(
        pts, msk, mode="fused", chunk_frames=5, checkpoint_path=ck
    )
    np.testing.assert_allclose(chk_poses, ref_poses, rtol=1e-5, atol=1e-6)
    assert chk_rep.n_keyframes == ref_rep.n_keyframes
    # per-chunk stats recorded: 13 post-init frames in chunks of 5 -> 5,5,3
    assert [c[1] for c in slam.chunk_stats] == [5, 5, 3]
    assert all(c[2] > 0 for c in slam.chunk_stats)
    import os

    assert os.path.exists(ck)  # mid-log recovery point written per chunk
