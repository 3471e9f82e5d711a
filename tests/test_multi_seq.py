"""DP multi-sequence runner: sharded result == per-sequence sequential run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_icp_slam.config import ICPConfig, MappingConfig, PipelineConfig, SlamConfig
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.dist import make_mesh, make_multi_sequence_runner
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_multi_sequence_matches_sequential():
    cfg = SlamConfig(
        icp=ICPConfig(method="point_to_point", max_iters=8, max_corr_dist=2.0,
                      nn_backend="xla"),
        mapping=MappingConfig(map_capacity=4096, local_model_size=512,
                              map_voxel=0.5),
        pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=256,
                                keyframe_trans=1.5, keyframe_rot=0.3),
    )
    seqs = []
    for s in range(4):
        scans, _ = synthetic.velodyne_log(
            n_frames=4, n_rings=6, n_azimuth=96, seed=s, path_fraction=0.15
        )
        scans = [voxel_downsample_np(sc, 0.8)[:256] for sc in scans]
        seqs.append(pad_scans(scans, 256))
    pts = jnp.asarray(np.stack([p for p, _ in seqs]), jnp.float32)
    msk = jnp.asarray(np.stack([m for _, m in seqs]))

    mesh = make_mesh(4, axes=("dp",))
    runner = make_multi_sequence_runner(mesh, cfg)
    poses = np.asarray(runner(pts, msk))
    assert poses.shape == (4, 4, 4, 4) and np.isfinite(poses).all()

    pipe = ScanToMapPipeline(cfg)
    for s in range(4):
        st = pipe.init_state(pts[s, 0], msk[s, 0])
        st, infos = pipe.run_fused(st, pts[s, 1:], msk[s, 1:])
        want = np.concatenate([np.eye(4)[None], np.asarray(infos["pose"])])
        np.testing.assert_allclose(poses[s], want, rtol=1e-5, atol=1e-5)
