"""Fused Pallas GN accumulation (N6) vs the XLA normal-equation builder."""

import numpy as np
import jax.numpy as jnp

from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.icp.point_to_plane import build_normal_equations
from tpu_icp_slam.kernels.gn_pallas import gn_accum_pallas


def _case(m, seed, with_padding=True):
    rng = np.random.default_rng(seed)
    p = rng.uniform(-20, 20, (m, 3)).astype(np.float32)
    q = (p + 0.1 * rng.standard_normal((m, 3))).astype(np.float32)
    n = rng.standard_normal((m, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    w = rng.uniform(0, 1, m).astype(np.float32)
    if with_padding:
        w[m // 2 :] = 0.0  # padded/gated rows must not contribute
    return map(jnp.asarray, (p, q, n, w))


def test_gn_pallas_matches_xla():
    for m in (128, 1000, 4096):
        p, q, n, w = _case(m, seed=m)
        H_p, g_p = gn_accum_pallas(p, q, n, w, interpret=True)
        H_x, g_x = build_normal_equations(p, q, n, w)
        np.testing.assert_allclose(
            np.asarray(H_p), np.asarray(H_x), rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-4
        )


def test_gn_pallas_multi_tile():
    p, q, n, w = _case(5000, seed=7, with_padding=False)
    H_p, g_p = gn_accum_pallas(p, q, n, w, tile_m=1024, interpret=True)
    H_x, g_x = build_normal_equations(p, q, n, w)
    np.testing.assert_allclose(np.asarray(H_p), np.asarray(H_x), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-5, atol=1e-3)


def test_gn_pallas_in_icp_loop():
    import dataclasses as dc

    from tpu_icp_slam.config import ICPConfig
    from tpu_icp_slam.core import pointcloud as pc
    from tpu_icp_slam.icp import loop as icp_loop
    from tpu_icp_slam.mapping.normals import normals_knn

    rng = np.random.default_rng(1)
    src3 = synthetic.surface_cloud(800, rng)
    T_gt = synthetic.rigid_transform(3, rng, rot_scale=0.05, trans_scale=0.1)
    dst3 = src3 @ T_gt[:3, :3].T + T_gt[:3, 3]
    cs = pc.make(src3, capacity=1024, dtype=jnp.float32)
    cd = pc.make(dst3, capacity=1024, dtype=jnp.float32)
    nrm = normals_knn(cd.points, cd.mask, k=12)
    cd = dc.replace(cd, normals=nrm)
    cfg = ICPConfig(
        method="point_to_plane", max_iters=30, nn_backend="xla",
        gn_backend="pallas", damping=1e-6,
    )
    res = icp_loop.align(cs, cd, cfg=cfg)
    err = np.abs(np.asarray(res.T) - T_gt).max()
    assert err < 5e-3, err
