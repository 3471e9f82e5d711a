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


def test_pallas_matches_xla_fallback():
    rng = np.random.default_rng(2)
    src = rng.uniform(-20, 20, (777, 3)).astype(np.float32)
    dst = rng.uniform(-20, 20, (555, 3)).astype(np.float32)
    pi, pd = nn_bruteforce_pallas(jnp.asarray(src), jnp.asarray(dst), interpret=True)
    xi, xd = nn_bruteforce_xla(jnp.asarray(src), jnp.asarray(dst), chunk=256)
    picked_p = ((src - dst[np.asarray(pi)]) ** 2).sum(-1)
    picked_x = ((src - dst[np.asarray(xi)]) ** 2).sum(-1)
    np.testing.assert_allclose(picked_p, picked_x, rtol=1e-3, atol=1e-3)
