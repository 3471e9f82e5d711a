"""Kernel-equivalence tests: Pallas NN vs XLA fallback vs NumPy oracle
(SURVEY.md §4b "Kernel equivalence"). Runs in interpret mode on the CPU
suite; the real-TPU compilation check lives in test_tpu_smoke.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_icp_slam.core import pointcloud as pcm
from tpu_icp_slam.kernels.nn_pallas import nn_bruteforce_pallas
from tpu_icp_slam.kernels.nn_xla import nn_bruteforce_xla


def _oracle(src, dst):
    D = ((src[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
    return D.argmin(1), D.min(1)


@pytest.mark.parametrize(
    "m,n,tile_m,tile_n",
    [
        (256, 256, 128, 128),  # exact tiles
        (300, 500, 128, 128),  # ragged both axes
        (64, 1000, 128, 256),  # m smaller than tile
        (1024, 96, 256, 128),  # n smaller than tile
    ],
)
def test_pallas_nn_matches_oracle(m, n, tile_m, tile_n):
    rng = np.random.default_rng(m + n)
    src = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
    dst = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    idx, d2 = nn_bruteforce_pallas(
        jnp.asarray(src), jnp.asarray(dst), tile_m=tile_m, tile_n=tile_n,
        interpret=True,
    )
    oidx, od2 = _oracle(src, dst)
    # ties can differ between argmin orders; compare distances not indices
    np.testing.assert_allclose(np.asarray(d2), od2, rtol=1e-3, atol=1e-3)
    picked = ((src - dst[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(picked, od2, rtol=1e-3, atol=1e-3)


def test_pallas_nn_2d_points():
    rng = np.random.default_rng(0)
    src = rng.uniform(-5, 5, (200, 2)).astype(np.float32)
    dst = rng.uniform(-5, 5, (333, 2)).astype(np.float32)
    idx, d2 = nn_bruteforce_pallas(jnp.asarray(src), jnp.asarray(dst), interpret=True)
    oidx, od2 = _oracle(src, dst)
    picked = ((src - dst[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(picked, od2, rtol=1e-3, atol=1e-3)


def test_pallas_nn_sentinel_padding_never_wins():
    rng = np.random.default_rng(1)
    real = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    pc = pcm.make(real, capacity=256)  # 156 sentinel rows
    src = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    idx, _ = nn_bruteforce_pallas(jnp.asarray(src), pc.points, interpret=True)
    assert np.all(np.asarray(idx) < 100)


def test_pallas_bf16_recentered_selection_quality():
    """bf16 single-pass mode: correspondence selection must be near-exact
    even with a large world-frame offset (the recentering's whole job).
    Selection may legitimately differ on near-ties, so assert the PICKED
    distance is within a small absolute margin of the true nearest."""
    rng = np.random.default_rng(3)
    offset = np.asarray([500.0, -300.0, 40.0], np.float32)  # world offset
    src = (rng.uniform(-30, 30, (800, 3)) + offset).astype(np.float32)
    dst = (rng.uniform(-30, 30, (2000, 3)) + offset).astype(np.float32)
    idx, d2 = nn_bruteforce_pallas(
        jnp.asarray(src), jnp.asarray(dst), interpret=True, precision="bf16"
    )
    _, od2 = _oracle(src.astype(np.float64), dst.astype(np.float64))
    picked = ((src.astype(np.float64) - dst[np.asarray(idx)].astype(np.float64)) ** 2).sum(-1)
    # picked neighbor within 5 cm (in distance) of the true nearest
    excess = np.sqrt(picked) - np.sqrt(od2)
    assert float(excess.max()) < 0.05, float(excess.max())
    # the returned d2 (factored form) tracks the true picked distance
    np.testing.assert_allclose(np.asarray(d2), picked, rtol=5e-2, atol=5e-2)


def test_pallas_bf16_icp_recovers_transform():
    """End-to-end: ICP with the bf16 NN converges to the same transform."""
    from tpu_icp_slam.config import ICPConfig
    from tpu_icp_slam.datasets import synthetic
    from tpu_icp_slam.eval import metrics
    from tpu_icp_slam.icp import align

    s, d, T_gt = synthetic.two_scan_pair(n=512, seed=4, rot_scale=0.2,
                                         trans_scale=0.3)
    res = align(
        pcm.make(s, 512), pcm.make(d, 512),
        cfg=ICPConfig(max_iters=25, tol=1e-6, nn_backend="pallas",
                      nn_precision="bf16"),
    )
    rot_err, trans_err = metrics.transform_error(
        np.asarray(res.T, np.float64), T_gt
    )
    assert rot_err < 2e-3 and trans_err < 2e-3, (rot_err, trans_err)


@pytest.mark.parametrize(
    "m,n,tile_m,tile_n",
    [
        (256, 256, 128, 128),   # exact tiles
        (300, 1500, 128, 256),  # ragged both axes, several target tiles
        (64, 96, 128, 128),     # single tile covering everything
    ],
)
def test_pallas_rescore_matches_oracle(m, n, tile_m, tile_n):
    """Rescore mode: exact selection — picked distance must MATCH the
    oracle (not just approach it), and the returned d2 is difference-form
    exact rather than the factored form's cancellation-limited value."""
    rng = np.random.default_rng(10 * m + n)
    src = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
    dst = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    idx, d2 = nn_bruteforce_pallas(
        jnp.asarray(src), jnp.asarray(dst), tile_m=tile_m, tile_n=tile_n,
        interpret=True, precision="rescore",
    )
    _, od2 = _oracle(src, dst)
    picked = ((src - dst[np.asarray(idx)]) ** 2).sum(-1)
    # "exact at f32 resolution": the kernel rescores RECENTERED coords, so
    # rounding can differ from the unshifted oracle by a few ulp on
    # effective ties — orders tighter than the other modes' 1e-3 bound
    np.testing.assert_allclose(picked, od2, rtol=1e-5, atol=1e-5)
    # d2 is the f32 difference-form distance of the picked point
    np.testing.assert_allclose(np.asarray(d2), picked, rtol=1e-5, atol=1e-5)


def test_pallas_rescore_resolves_near_ties_in_f32():
    """The lap-divergence mechanism (BASELINE.md r4): bf16 selection jitter
    on near-equal distances. Rescore must pick the true nearest even when
    the runner-up is within 1e-3 m AND the whole scene sits on a large
    world offset (where bf16 scores cannot tell the pair apart)."""
    rng = np.random.default_rng(7)
    offset = np.asarray([500.0, -300.0, 40.0], np.float32)
    m = 64
    src = (rng.uniform(-30, 30, (m, 3)) + offset).astype(np.float32)
    # two targets per source: true NN at r, rival at r + 1e-3 (same tile —
    # adjacent indices — the hardest case for a shortlist design), plus
    # background clutter
    r = 0.3
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs2 = rng.normal(size=(m, 3)).astype(np.float32)
    dirs2 /= np.linalg.norm(dirs2, axis=1, keepdims=True)
    true_nn = src + r * dirs
    rival = src + (r + 1e-3) * dirs2
    clutter = (rng.uniform(-30, 30, (512, 3)) + offset).astype(np.float32)
    # interleave true/rival so each pair is index-adjacent (same tile)
    pairs = np.stack([true_nn, rival], axis=1).reshape(-1, 3)
    dst = np.concatenate([pairs, clutter]).astype(np.float32)
    idx, d2 = nn_bruteforce_pallas(
        jnp.asarray(src), jnp.asarray(dst), tile_m=128, tile_n=256,
        interpret=True, precision="rescore",
    )
    # compare to the fp64 oracle, not the planted slots: a clutter point
    # can legitimately land closer than the planted pair (seed 7, row 12)
    D = ((src[:, None, :].astype(np.float64)
          - dst[None, :, :].astype(np.float64)) ** 2).sum(-1)
    expected = D.argmin(1)
    assert np.array_equal(np.asarray(idx), expected), (
        np.asarray(idx)[:8], expected[:8]
    )
    np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4)


def test_pallas_rescore_sentinel_padding_never_wins():
    rng = np.random.default_rng(11)
    real = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    pc = pcm.make(real, capacity=256)
    src = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    idx, _ = nn_bruteforce_pallas(
        jnp.asarray(src), pc.points, interpret=True, precision="rescore"
    )
    assert np.all(np.asarray(idx) < 100)


def test_pallas_rescore_icp_recovers_transform():
    from tpu_icp_slam.config import ICPConfig
    from tpu_icp_slam.datasets import synthetic
    from tpu_icp_slam.eval import metrics
    from tpu_icp_slam.icp import align

    s, d, T_gt = synthetic.two_scan_pair(n=512, seed=5, rot_scale=0.2,
                                         trans_scale=0.3)
    res = align(
        pcm.make(s, 512), pcm.make(d, 512),
        cfg=ICPConfig(max_iters=25, tol=1e-6, nn_backend="pallas",
                      nn_precision="rescore"),
    )
    rot_err, trans_err = metrics.transform_error(
        np.asarray(res.T, np.float64), T_gt
    )
    assert rot_err < 2e-3 and trans_err < 2e-3, (rot_err, trans_err)


def test_pallas_matches_xla_fallback():
    rng = np.random.default_rng(2)
    src = rng.uniform(-20, 20, (777, 3)).astype(np.float32)
    dst = rng.uniform(-20, 20, (555, 3)).astype(np.float32)
    pi, pd = nn_bruteforce_pallas(jnp.asarray(src), jnp.asarray(dst), interpret=True)
    xi, xd = nn_bruteforce_xla(jnp.asarray(src), jnp.asarray(dst), chunk=256)
    picked_p = ((src - dst[np.asarray(pi)]) ** 2).sum(-1)
    picked_x = ((src - dst[np.asarray(xi)]) ** 2).sum(-1)
    np.testing.assert_allclose(picked_p, picked_x, rtol=1e-3, atol=1e-3)
