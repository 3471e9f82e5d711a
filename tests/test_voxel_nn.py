"""Voxel-bucket NN (N4): equivalence vs brute force within its contract."""

import numpy as np
import jax.numpy as jnp

from tpu_icp_slam.core import pointcloud as pc
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.kernels import voxel_nn
from tpu_icp_slam.kernels.nn_xla import nn_bruteforce_xla


def test_voxel_nn_matches_bruteforce_within_gate():
    rng = np.random.default_rng(0)
    dst = synthetic.surface_cloud(3000, rng)
    src = dst[rng.integers(0, 3000, 1000)] + 0.2 * rng.standard_normal((1000, 3))
    voxel = 1.0
    cl = pc.make(dst, capacity=3072, dtype=jnp.float32)
    grid = voxel_nn.build(cl.points, cl.mask, voxel=voxel, bucket=64)
    idx_v, d2_v = voxel_nn.query(grid, jnp.asarray(src, jnp.float32), voxel=voxel)
    idx_b, d2_b = nn_bruteforce_xla(
        jnp.asarray(src, jnp.float32), cl.points
    )
    d2_v, d2_b = np.asarray(d2_v), np.asarray(d2_b)
    idx_v, idx_b = np.asarray(idx_v), np.asarray(idx_b)
    # contract: exact where the true NN is within the voxel (gate) radius
    in_gate = d2_b <= voxel * voxel
    assert in_gate.mean() > 0.95  # the setup keeps queries near the cloud
    agree = (idx_v == idx_b) | np.isclose(d2_v, d2_b, rtol=1e-5, atol=1e-7)
    # a handful of blob voxels exceed even this bucket size (documented
    # overflow contract) — require near-perfect, not perfect, agreement
    assert agree[in_gate].mean() > 0.995, agree[in_gate].mean()


def test_voxel_nn_no_candidates_is_inf():
    dst = np.zeros((4, 3), np.float32)
    cl = pc.make(dst, capacity=8, dtype=jnp.float32)
    grid = voxel_nn.build(cl.points, cl.mask, voxel=0.5, table_size=256, bucket=4)
    far = jnp.asarray([[100.0, 100.0, 100.0]], jnp.float32)
    idx, d2 = voxel_nn.query(grid, far, voxel=0.5)
    assert np.isinf(np.asarray(d2)[0])


def test_voxel_backend_in_icp():
    import dataclasses as dc

    from tpu_icp_slam.config import ICPConfig
    from tpu_icp_slam.icp import loop as icp_loop

    src, dst, T_gt = synthetic.two_scan_pair(
        n=1500, seed=3, rot_scale=0.05, trans_scale=0.2
    )
    cs = pc.make(src, capacity=1536, dtype=jnp.float32)
    cd = pc.make(dst, capacity=1536, dtype=jnp.float32)
    cfg = ICPConfig(
        method="point_to_point", max_iters=40, max_corr_dist=1.5,
        nn_backend="voxel", voxel_table_size=4096, voxel_bucket=32,
    )
    res = icp_loop.align(cs, cd, cfg=cfg)
    err = np.abs(np.asarray(res.T) - T_gt).max()
    assert err < 5e-3, err


def test_voxel_nn_2d():
    rng = np.random.default_rng(5)
    dst = rng.uniform(-8, 8, (800, 2))
    src = dst[rng.integers(0, 800, 300)] + 0.1 * rng.standard_normal((300, 2))
    cl = pc.make(dst, capacity=1024, dtype=jnp.float32)
    grid = voxel_nn.build(cl.points, cl.mask, voxel=0.8, bucket=32)
    idx_v, d2_v = voxel_nn.query(grid, jnp.asarray(src, jnp.float32), voxel=0.8)
    idx_b, d2_b = nn_bruteforce_xla(jnp.asarray(src, jnp.float32), cl.points)
    in_gate = np.asarray(d2_b) <= 0.8 * 0.8
    agree = (np.asarray(idx_v) == np.asarray(idx_b)) | np.isclose(
        np.asarray(d2_v), np.asarray(d2_b), rtol=1e-5, atol=1e-7
    )
    assert agree[in_gate].mean() > 0.99
