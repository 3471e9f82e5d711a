"""kernels.icp_fused_pallas: whole-loop fused ICP == unfused reference path.

The fused kernel runs the ENTIRE point-to-plane ICP loop in one pallas_call
(interpret mode on CPU). Equivalence target: icp.loop.align_with_
correspondence with the coverage-gated correspondence of slam.scan_to_map —
same gates, same damped-GN solve, same convergence rules. The fused path
recenters both clouds on the model bbox midpoint (bf16 range fix), which
changes the GN parameterization per-iteration but not the converged pose
(ICP on jointly-shifted clouds is exactly conjugate); tolerances below are
at-convergence, not per-iteration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_icp_slam.config import ICPConfig
from tpu_icp_slam.core import se3
from tpu_icp_slam.core.pointcloud import PointCloud
from tpu_icp_slam.icp.loop import _nn_correspondence, align_with_correspondence
from tpu_icp_slam.kernels.icp_fused_pallas import icp_fused_pallas
from tpu_icp_slam.mapping.normals import normals_knn


def _problem(seed=0, m=512, n=768, offset_scale=0.3, spread=8.0):
    """Model cloud + normals, source scan = inverse-transformed subset."""
    rng = np.random.default_rng(seed)
    # structured model: two walls + floor so point-to-plane is well posed
    k = n // 3
    pts = []
    pts.append(np.c_[rng.uniform(-spread, spread, k),
                     rng.uniform(-spread, spread, k),
                     np.zeros(k)])  # floor z=0
    pts.append(np.c_[np.full(k, spread),
                     rng.uniform(-spread, spread, k),
                     rng.uniform(0, 4, k)])  # wall x=spread
    pts.append(np.c_[rng.uniform(-spread, spread, n - 2 * k),
                     np.full(n - 2 * k, -spread),
                     rng.uniform(0, 4, n - 2 * k)])  # wall y=-spread
    dst = np.concatenate(pts).astype(np.float32)
    nrm = np.asarray(normals_knn(jnp.asarray(dst), jnp.ones(n, bool), k=8))

    xi = rng.normal(size=6) * offset_scale * np.r_[1, 1, 1, 0.3, 0.3, 0.3]
    T_true = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)))
    # src: subset of the model pulled back through T_true^-1 (+ tiny noise)
    sel = rng.permutation(n)[:m]
    Tinv = np.linalg.inv(T_true)
    src = dst[sel] @ Tinv[:3, :3].T + Tinv[:3, 3]
    src += rng.normal(size=src.shape).astype(np.float32) * 0.005
    smask = np.ones(m, bool)
    smask[-m // 8:] = False  # exercise source padding/masking
    return (jnp.asarray(src, jnp.float32), jnp.asarray(smask),
            jnp.asarray(dst), jnp.asarray(nrm), jnp.ones(n, bool), T_true)


_CFG = dict(
    max_iters=12, tol=1e-6, tol_update=0.0, max_corr_dist=1.0,
    huber_delta=0.3, damping=1e-3, step_scale=1.0,
    max_step_trans=1.0, max_step_rot=0.3, min_inliers=10,
)


def _run_unfused(src, smask, dst, nrm, dmask, r_gate, **over):
    kw = {**_CFG, **over}
    cfg = ICPConfig(
        method="point_to_plane", nn_backend="xla", gn_backend="xla",
        **kw,
    )
    dstc = PointCloud(
        points=jnp.where(dmask[:, None], dst, 1.0e6),
        mask=dmask, normals=jnp.where(dmask[:, None], nrm, 0.0),
    )
    nn_corr = _nn_correspondence(cfg, dstc)

    def corr(cur):
        q, n_, gate, d2 = nn_corr(cur)
        in_cov = jnp.sum(cur * cur, axis=-1) <= r_gate * r_gate
        return q, n_, gate * in_cov.astype(gate.dtype), d2

    return align_with_correspondence(
        PointCloud(points=src, mask=smask), corr, None, cfg)


def _run_fused(src, smask, dst, nrm, dmask, r_gate, precision="highest",
               **over):
    kw = {**_CFG, **over}
    return icp_fused_pallas(
        src, smask, dst, nrm, dmask, init_T=None, r_gate=r_gate,
        precision=precision, tile_m=256, tile_n=256, **kw)


def _pose_err(Ta, Tb):
    d = np.linalg.inv(np.asarray(Ta)) @ np.asarray(Tb)
    rot = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    return np.linalg.norm(d[:3, 3]), rot


def test_fused_matches_unfused_highest():
    src, smask, dst, nrm, dmask, T_true = _problem(seed=0)
    res = _run_unfused(src, smask, dst, nrm, dmask, r_gate=1e6)
    T, rmse, iters, n_inl, conv = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6)
    t_err, r_err = _pose_err(res.T, T)
    assert t_err < 2e-3 and r_err < 2e-3, (t_err, r_err)
    assert abs(float(res.rmse) - float(rmse)) < 1e-3
    # both must actually have solved the problem
    t_gt, r_gt = _pose_err(T, T_true)
    assert t_gt < 0.02 and r_gt < 0.01, (t_gt, r_gt)
    assert int(n_inl) > 300
    assert bool(conv) == bool(res.converged)


def test_fused_coverage_gate_in_original_frame():
    # a tight coverage gate must zero the same points in both paths even
    # though the fused kernel works in the recentered frame.
    src, smask, dst, nrm, dmask, _ = _problem(seed=1)
    # 9.0 cuts a substantial fraction of the scene (325/512 survive) while
    # keeping both walls represented, so the problem stays well-posed.  A
    # tighter gate (6.0) leaves mostly floor points: point-to-plane is then
    # degenerate in (x, y, yaw) and the two paths legitimately slide to
    # different points on the null manifold (measured 0.37 m apart with
    # r_err == 0 — pure in-plane translation, the degenerate direction).
    r_gate = 9.0
    # Sharp gate-geometry check: ONE iteration from the same (identity)
    # pose, so both paths evaluate the gate at exactly the same transform.
    # (At convergence the two paths sit at slightly different poses — the
    # fused kernel optimizes in the recentered parameterization — so
    # boundary points flicker and counts may differ by a few.)
    res1 = _run_unfused(src, smask, dst, nrm, dmask, r_gate=r_gate,
                        max_iters=1)
    _, _, _, n_inl1, _ = _run_fused(src, smask, dst, nrm, dmask,
                                    r_gate=r_gate, max_iters=1)
    assert abs(int(n_inl1) - int(res1.n_inliers)) <= 1, (
        int(n_inl1), int(res1.n_inliers))
    # and the converged poses still agree across the shift
    res = _run_unfused(src, smask, dst, nrm, dmask, r_gate=r_gate)
    T, rmse, iters, n_inl, conv = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=r_gate)
    t_err, r_err = _pose_err(res.T, T)
    assert t_err < 5e-3 and r_err < 5e-3, (t_err, r_err)


def test_fused_respects_init_transform():
    src, smask, dst, nrm, dmask, T_true = _problem(seed=2, offset_scale=0.6)
    # from identity this offset may sit at the basin edge; with the true
    # transform as init both paths must hold it (and converge immediately)
    T0 = jnp.asarray(T_true, jnp.float32)
    T, rmse, iters, n_inl, conv = icp_fused_pallas(
        src, smask, dst, nrm, dmask, init_T=T0, r_gate=1e6,
        precision="highest", tile_m=256, tile_n=256, **_CFG)
    t_err, r_err = _pose_err(T, T_true)
    assert t_err < 0.02 and r_err < 0.01, (t_err, r_err)


def test_fused_min_inlier_guard_holds_pose():
    src, smask, dst, nrm, dmask, _ = _problem(seed=3)
    # impossible gate: no correspondences -> pose must stay at init
    T, rmse, iters, n_inl, conv = icp_fused_pallas(
        src, smask, dst, nrm, dmask, init_T=None, r_gate=1e-3,
        precision="highest", tile_m=256, tile_n=256, **_CFG)
    assert int(n_inl) == 0
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-5)


def test_fused_bf16_selection_close():
    src, smask, dst, nrm, dmask, T_true = _problem(seed=4)
    Th, *_ = _run_fused(src, smask, dst, nrm, dmask, r_gate=1e6,
                        precision="highest")
    Tb, rmse_b, iters_b, n_inl_b, conv_b = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6, precision="bf16")
    t_err, r_err = _pose_err(Th, Tb)
    # bf16 affects NN SELECTION only (residuals recomputed in f32);
    # with Dekker hi/lo packing the pose lands within millimeters
    assert t_err < 5e-3 and r_err < 5e-3, (t_err, r_err)


def test_fused_non_tile_multiple_sizes():
    # m, n not multiples of the tile sizes exercise the padding path
    src, smask, dst, nrm, dmask, T_true = _problem(seed=5, m=333, n=517)
    res = _run_unfused(src, smask, dst, nrm, dmask, r_gate=1e6)
    T, rmse, iters, n_inl, conv = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6)
    t_err, r_err = _pose_err(res.T, T)
    assert t_err < 2e-3 and r_err < 2e-3, (t_err, r_err)


def test_fused_motion_prior_matches_unfused():
    """In-kernel motion prior == icp.loop's prior_w/xi_prior path.

    Two checks: (a) a well-posed problem converges to the same pose with a
    light prior on both paths; (b) on the ground-plane-only problem (x, y,
    yaw unobserved) the prior must hold the unobserved translations at the
    anchor while the observed z offset is corrected — same contract as
    tests/test_icp.py::test_motion_prior_holds_unobserved_direction.
    """
    src, smask, dst, nrm, dmask, T_true = _problem(seed=2)
    kw = dict(prior_trans_weight=0.02, prior_rot_weight=0.02)
    res = _run_unfused(src, smask, dst, nrm, dmask, r_gate=1e6, **kw)
    T, rmse, iters, n_inl, conv = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6, **kw)
    t_err, r_err = _pose_err(res.T, T)
    assert t_err < 3e-3 and r_err < 3e-3, (t_err, r_err)
    t_gt, r_gt = _pose_err(T, T_true)
    assert t_gt < 0.03 and r_gt < 0.01, (t_gt, r_gt)

    # (b) plane-only: unobserved directions stay at the anchor
    rng = np.random.default_rng(11)
    n = 640
    xy = rng.uniform(-10, 10, (n, 2))
    dstp = np.concatenate([xy, np.zeros((n, 1))], 1).astype(np.float32)
    srcp = dstp + np.array([0, 0, 0.3], np.float32)
    nrmp = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
    Tp, *_ = icp_fused_pallas(
        jnp.asarray(srcp), jnp.ones(n, bool), jnp.asarray(dstp),
        jnp.asarray(nrmp), jnp.ones(n, bool), init_T=None, r_gate=1e9,
        max_iters=10, tol=1e-8, tol_update=0.0, max_corr_dist=5.0,
        huber_delta=0.0, damping=1e-6, step_scale=1.0, max_step_trans=1.0,
        max_step_rot=0.3, min_inliers=10, precision="highest",
        tile_m=256, tile_n=256, prior_trans_weight=0.05,
        prior_rot_weight=0.05)
    Tp = np.asarray(Tp, np.float64)
    assert abs(Tp[2, 3] + 0.3) < 0.02, Tp[:3, 3]
    assert abs(Tp[0, 3]) < 1e-3 and abs(Tp[1, 3]) < 1e-3, Tp[:3, 3]


def test_fused_trust_region_matches_unfused():
    """r4 parity: the in-kernel total-correction trust region (7b) must
    reproduce the steps path's max_total_trans/rot projection — both when
    the clamp BINDS (offset beyond the ball) and when it doesn't."""
    src, smask, dst, nrm, dmask, T_true = _problem(seed=3, offset_scale=0.5)
    over = dict(max_total_trans=0.25, max_total_rot=0.1, max_iters=8)
    res = _run_unfused(src, smask, dst, nrm, dmask, r_gate=1e6, **over)
    T, rmse, iters, n_inl, conv = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6, **over)
    # the clamp must actually bind on this problem (offset > ball)
    xi = np.asarray(se3.log(jnp.asarray(np.asarray(res.T))))
    assert np.linalg.norm(xi[:3]) <= 0.25 + 1e-3
    t_err, r_err = _pose_err(res.T, T)
    assert t_err < 2e-3 and r_err < 2e-3, (t_err, r_err)
    # non-binding clamp: same answer as no clamp at all
    src, smask, dst, nrm, dmask, T_true = _problem(seed=4, offset_scale=0.1)
    T_free, *_ = _run_fused(src, smask, dst, nrm, dmask, r_gate=1e6)
    T_clamped, *_ = _run_fused(
        src, smask, dst, nrm, dmask, r_gate=1e6,
        max_total_trans=50.0, max_total_rot=3.0)
    t_err, r_err = _pose_err(T_free, T_clamped)
    assert t_err < 1e-4 and r_err < 1e-4, (t_err, r_err)


def test_vmem_shrink_flagship_regime():
    """The compile-OOM class that blocked the fused A/B for two rounds
    (BASELINE.md r4/r5) is governed by fused_tile_shrink's estimate: pin
    it at the regimes the flagship and the A/B arms actually request, so
    a future recalibration can't silently reopen it. Budget = 13 MB of
    the 16 MB VMEM scope (the r5 headroom that finally compiled on-chip,
    scripts/exp_fused_smoke.py)."""
    from tpu_icp_slam.kernels.icp_fused_pallas import fused_tile_shrink

    # flagship: 16,384 x 16,384 with the default (1024, 2048) request.
    # (512, 256) is the decision that COMPILED AND RAN on the chip in the
    # r5b smoke — changing it is a conscious recalibration, not a drive-by.
    tm, tn, est = fused_tile_shrink(16384, 16384, 1024, 2048)
    assert (tm, tn) == (512, 256), (tm, tn, est)
    assert est <= 13_000_000, (tm, tn, est)
    # the fused_tiles A/B arm requests a full-model fold (2048, 8192):
    # the shrink must pull it under budget rather than pass it through
    tm2, tn2, est2 = fused_tile_shrink(16384, 16384, 2048, 8192)
    assert est2 <= 13_000_000, (tm2, tn2, est2)
    # shrink never descends below the 256 lane-tile floor
    tm3, tn3, est3 = fused_tile_shrink(2048, 2048, 1024, 2048)
    assert tm3 >= 256 and tn3 >= 256 and est3 <= 13_000_000, (tm3, tn3, est3)
