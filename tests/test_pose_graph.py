"""Pose-graph GN tests (N14): odometry chain + loop closure reduces error."""

import numpy as np
import jax.numpy as jnp

from tpu_icp_slam.backend import pose_graph as pg
from tpu_icp_slam.core import se3
from tpu_icp_slam.datasets import synthetic


def _chain_with_loop(n=12, drift=0.02, seed=0):
    """Simulated keyframe chain: GT square loop + drifty odometry factors."""
    rng = np.random.default_rng(seed)
    # GT: walk around a square, n poses
    gt = [np.eye(4)]
    for i in range(1, n):
        step = np.eye(4)
        step[:3, 3] = [1.0, 0.0, 0.0]
        if i % (n // 4) == 0:  # turn 90° at corners
            c, s = 0.0, 1.0
            step[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        gt.append(gt[-1] @ step)
    gt = np.stack(gt)
    # odometry measurements = GT relative + noise/drift
    factors = []
    init = [np.eye(4)]
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = synthetic.rigid_transform(3, rng, rot_scale=drift, trans_scale=drift)
        meas = rel @ noise
        factors.append((i - 1, i, meas, 1.0))
        init.append(init[-1] @ meas)
    # loop closure: exact relative pose between last and first keyframe
    rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    factors.append((0, n - 1, rel, 2.0))
    return np.stack(init), gt, factors


def test_pose_graph_reduces_loop_error():
    init, gt, factors = _chain_with_loop(n=12, drift=0.03)
    g = pg.from_arrays(init, factors, dtype=jnp.float64)
    before = np.linalg.norm(np.asarray(g.poses)[: len(gt), :3, 3] - gt[:, :3, 3], axis=1)
    g_opt, chis = pg.optimize(g, iters=10, damping=1e-9)
    after = np.linalg.norm(
        np.asarray(g_opt.poses)[: len(gt), :3, 3] - gt[:, :3, 3], axis=1
    )
    chis = np.asarray(chis)
    assert chis[-1] < chis[0] * 0.5, f"chi2 did not drop: {chis}"
    assert after.max() < before.max(), (before.max(), after.max())
    # end-of-loop keyframe should be pulled near GT by the closure
    assert after[-1] < 0.2, after


def test_pose_graph_exact_measurements_noop():
    # factors consistent with the initial poses -> optimization changes nothing
    rng = np.random.default_rng(1)
    poses = [np.eye(4)]
    for _ in range(5):
        poses.append(poses[-1] @ synthetic.rigid_transform(3, rng, 0.4, 1.0))
    poses = np.stack(poses)
    factors = [
        (i, i + 1, np.linalg.inv(poses[i]) @ poses[i + 1], 1.0) for i in range(5)
    ]
    g = pg.from_arrays(poses, factors, dtype=jnp.float64)
    g_opt, chis = pg.optimize(g, iters=5, damping=1e-9)
    np.testing.assert_allclose(np.asarray(g_opt.poses), poses, atol=1e-8)
    assert np.asarray(chis)[0] < 1e-16


def test_pose_graph_padding_invariant():
    # empty factor slots (weight 0) and inactive poses must not affect result
    init, gt, factors = _chain_with_loop(n=8, drift=0.02)
    g1 = pg.from_arrays(init, factors, dtype=jnp.float64)
    g2 = pg.from_arrays(init, factors, max_keyframes=32, max_factors=64,
                        dtype=jnp.float64)
    o1, _ = pg.optimize(g1, iters=6, damping=1e-9)
    o2, _ = pg.optimize(g2, iters=6, damping=1e-9)
    np.testing.assert_allclose(
        np.asarray(o1.poses)[:8], np.asarray(o2.poses)[:8], atol=1e-9
    )


def test_residual_convention():
    # r = log(T_meas^-1 X_i^-1 X_j): zero iff measurement matches poses
    rng = np.random.default_rng(2)
    Xi = synthetic.rigid_transform(3, rng, 0.5, 2.0)
    Xj = synthetic.rigid_transform(3, rng, 0.5, 2.0)
    T = np.linalg.inv(Xi) @ Xj
    g = pg.from_arrays(np.stack([Xi, Xj]), [(0, 1, T, 1.0)], dtype=jnp.float64)
    r = np.asarray(pg.residuals(g))
    np.testing.assert_allclose(r[0], 0.0, atol=1e-12)


def _drifty_chain(rng, n):
    poses_gt = [np.eye(4)]
    odo = [np.eye(4)]
    factors = []
    for i in range(1, n):
        rel = synthetic.rigid_transform(3, rng, rot_scale=0.1, trans_scale=1.0)
        poses_gt.append(poses_gt[-1] @ rel)
        noise = synthetic.rigid_transform(3, rng, rot_scale=0.02,
                                          trans_scale=0.05)
        odo.append(odo[-1] @ rel @ noise)
        factors.append((i - 1, i, rel @ noise, 1.0))
    return poses_gt, odo, factors


def test_pcm_keeps_true_clique_drops_alias():
    """PCM: three mutually consistent true loops outvote a 5 m alias (the
    r2 racetrack-soak leak — front-end gates alone let aliases through once
    global drift exceeds the alias spacing)."""
    rng = np.random.default_rng(4)
    n = 12
    poses_gt, odo, _ = _drifty_chain(rng, n)
    def rel_gt(i, j):
        return np.linalg.inv(poses_gt[i]) @ poses_gt[j]
    closures = [
        (0, n - 1, rel_gt(0, n - 1)),
        (1, n - 1, rel_gt(1, n - 1)),
        (0, n - 2, rel_gt(0, n - 2)),
    ]
    T_false = rel_gt(1, n - 2).copy()
    T_false[:3, 3] += np.asarray([5.0, 0.0, 0.0])
    closures.append((1, n - 2, T_false))
    keep = pg.pairwise_consistent_closures(np.stack(odo), closures, gamma=0.5)
    assert keep.tolist() == [True, True, True, False], keep


def test_pcm_all_true_kept():
    rng = np.random.default_rng(5)
    n = 10
    poses_gt, odo, _ = _drifty_chain(rng, n)
    closures = [
        (i, j, np.linalg.inv(poses_gt[i]) @ poses_gt[j])
        for i, j in [(0, 9), (1, 9), (0, 8), (2, 7)]
    ]
    keep = pg.pairwise_consistent_closures(np.stack(odo), closures, gamma=0.5)
    assert keep.all(), keep


def test_closure_confidence_flags_alias():
    """The surviving-alias surface (VERDICT r2 item 9): a false closure that
    the FILTERS keep (its drift-aware threshold admits it) must still carry
    a metre-scale cycle score + suspect flag, while true closures score cm.

    This models the measured r2 racetrack wall: 4 closures wrong by 8-16 m
    survived every consistency filter because the front-end itself aliased —
    the report/map must expose them as low-confidence, not hide them."""
    rng = np.random.default_rng(4)
    n = 12
    poses_gt, odo, _ = _drifty_chain(rng, n)

    def rel_gt(i, j):
        return np.linalg.inv(poses_gt[i]) @ poses_gt[j]

    closures = [
        (0, n - 1, rel_gt(0, n - 1)),
        (1, n - 1, rel_gt(1, n - 1)),
        (0, n - 2, rel_gt(0, n - 2)),
    ]
    T_false = rel_gt(1, n - 2).copy()
    T_false[:3, 3] += np.asarray([8.0, 0.0, 0.0])  # one bay over
    closures.append((1, n - 2, T_false))
    score, suspect = pg.closure_confidence(
        np.stack(odo), closures, suspect_cycle=1.0
    )
    assert suspect.tolist() == [False, False, False, True], (score, suspect)
    assert score[3] > 4.0, score  # metre-scale disagreement, not marginal
    assert (score[:3] < 1.0).all(), score


def test_closure_confidence_singleton_unknown():
    rng = np.random.default_rng(5)
    poses_gt, odo, _ = _drifty_chain(rng, 8)
    closures = [(0, 7, np.linalg.inv(poses_gt[0]) @ poses_gt[7])]
    score, suspect = pg.closure_confidence(np.stack(odo), closures)
    assert len(score) == 1 and np.isnan(score[0]) and not suspect[0]
    score0, suspect0 = pg.closure_confidence(np.stack(odo), [])
    assert len(score0) == 0 and len(suspect0) == 0


def test_reject_inconsistent_loops_gross_error():
    """Residual gate (2nd line of defense): a closure wrong by 20 m cannot
    be smeared into the chain — its residual at the optimum stays large."""
    import dataclasses

    rng = np.random.default_rng(4)
    n = 12
    poses_gt, odo, factors = _drifty_chain(rng, n)
    n_odo = len(factors)
    T_true = np.linalg.inv(poses_gt[0]) @ poses_gt[-1]
    factors.append((0, n - 1, T_true, 2.0))
    T_false = (np.linalg.inv(poses_gt[1]) @ poses_gt[-2]).copy()
    T_false[:3, 3] += np.asarray([20.0, 0.0, 0.0])
    factors.append((1, n - 2, T_false, 2.0))

    g = pg.from_arrays(np.stack(odo), factors, dtype=jnp.float64)
    loop_mask = np.zeros(g.factor_capacity, bool)
    loop_mask[n_odo:] = True
    kept, n_rej = pg.reject_inconsistent_loops(
        g, loop_mask, reject_residual=0.75, iters=10, damping=1e-6,
        huber_delta=1.0,
    )
    kept = np.asarray(kept)
    assert n_rej >= 1
    assert kept[n_odo + 1] == 0, "gross false loop survived"
