import numpy as np
import jax.numpy as jnp

from tpu_icp_slam.config import SlamConfig, override
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.eval import metrics as em
from tpu_icp_slam.icp.projective import (
    CameraIntrinsics,
    backproject_depth,
    projective_correspondence,
)
from tpu_icp_slam.mapping.normals import normals_from_depth
from tpu_icp_slam.slam.runner import load_dataset, run_slam


def _K(ki: synthetic.Intrinsics) -> CameraIntrinsics:
    return CameraIntrinsics(ki.fx, ki.fy, ki.cx, ki.cy, ki.width, ki.height)


def test_backprojection_roundtrip():
    ki = synthetic.Intrinsics.tum_default(64, 48)
    K = _K(ki)
    depth = np.full((48, 64), 2.0, np.float32)
    depth[0, 0] = 0.0
    vmap, valid = backproject_depth(jnp.asarray(depth), K)
    v = np.asarray(vmap)
    assert not bool(np.asarray(valid)[0, 0])
    # reproject: u = fx*x/z + cx must recover the pixel grid (valid pixels)
    ok = np.asarray(valid)
    z = np.where(ok, v[..., 2], 1.0)
    u = v[..., 0] / z * K.fx + K.cx
    vv = v[..., 1] / z * K.fy + K.cy
    uu, vvv = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(u[ok], uu[ok], atol=1e-3)
    np.testing.assert_allclose(vv[ok], vvv[ok], atol=1e-3)


def test_depth_normals_plane():
    ki = synthetic.Intrinsics.tum_default(64, 48)
    K = _K(ki)
    depth = np.full((48, 64), 1.5, np.float32)  # fronto-parallel plane z=1.5
    vmap, valid = backproject_depth(jnp.asarray(depth), K)
    nmap, ok = normals_from_depth(vmap, valid)
    n = np.asarray(nmap)[np.asarray(ok)]
    # normals should be ±z, oriented toward camera (negative z)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
    assert (n[:, 2] < 0).all()


def test_projective_correspondence_identity():
    ki = synthetic.Intrinsics.tum_default(64, 48)
    K = _K(ki)
    depths, poses, _ = synthetic.rgbd_log(n_frames=1, K=ki)
    vmap, valid = backproject_depth(jnp.asarray(depths[0], jnp.float32), K)
    nmap, nok = normals_from_depth(vmap, valid)
    corr = projective_correspondence(K, vmap, nmap, valid & nok, max_corr_dist=0.1)
    pts = np.asarray(vmap).reshape(-1, 3)
    q, n, gate, d2 = corr(jnp.asarray(pts))
    g = np.asarray(gate) > 0
    assert g.sum() > 0.5 * g.size
    np.testing.assert_allclose(np.asarray(d2)[g], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q)[g], pts[g], atol=1e-5)


def test_rgbd_odometry_on_synthetic_scene():
    cfg = override(
        SlamConfig(),
        {"icp.max_corr_dist": 0.15, "icp.max_iters": 15, "icp.method": "point_to_plane"},
    )
    data = load_dataset("simrgbd", frames=8)
    poses, report = run_slam(cfg, data, out_dir=None, mode="fused")
    assert poses.shape == (8, 4, 4)
    assert report["ate_rmse"] < 0.03, report["ate_rmse"]


def test_rgbd_fullres_with_stride():
    """Config 3 at the REAL sensor grid (VERDICT r2 item 6): 640x480 depth,
    source decimated by stride 2 (76.8k pts >= the 64k organized-cloud
    bound) against full-res target maps — tracking must hold."""
    cfg = override(
        SlamConfig(),
        {
            "icp.max_corr_dist": 0.15, "icp.max_iters": 8,
            "icp.method": "point_to_plane",
            "pipeline.rgbd_src_stride": 2,
        },
    )
    data = load_dataset("simrgbd_fullres", frames=4)
    assert data.depths.shape[1:] == (480, 640)
    poses, report = run_slam(cfg, data, out_dir=None, mode="fused")
    assert poses.shape == (4, 4, 4)
    assert report["ate_rmse"] < 0.03, report["ate_rmse"]


def test_tum_loader_roundtrip(tmp_path):
    from tpu_icp_slam.datasets import tum

    depths, poses, ki = synthetic.rgbd_log(n_frames=4)
    root = str(tmp_path / "seq")
    tum.write_sequence(root, depths, gt_poses=poses)
    seq = tum.load_sequence(root)
    assert seq.depths.shape == depths.shape
    np.testing.assert_allclose(seq.depths, depths, atol=1.0 / 5000 + 1e-6)
    assert seq.gt_poses is not None
    np.testing.assert_allclose(seq.gt_poses, poses, atol=1e-4)
    # runner picks it up as an rgbd dataset
    data = load_dataset(root, frames=4)
    assert data.kind == "rgbd" and data.depths.shape[0] == 4
