import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_icp_slam.core import se3



def random_xi(rng, scale=1.0, n=()):
    return jnp.asarray(rng.uniform(-scale, scale, size=n + (6,)))


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = random_xi(rng, scale=1.5, n=(64,))
    T = se3.exp(xi)
    xi2 = se3.log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-9)


def test_exp_log_small_angle():
    rng = np.random.default_rng(1)
    xi = random_xi(rng, scale=1e-7, n=(8,))
    T = se3.exp(xi)
    np.testing.assert_allclose(np.asarray(se3.log(T)), np.asarray(xi), atol=1e-12)


def test_log_near_pi():
    rng = np.random.default_rng(2)
    for _ in range(20):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        theta = np.pi - 10 ** rng.uniform(-6, -2)
        phi = jnp.asarray(theta * axis)
        R = se3.so3_exp(phi)
        phi2 = se3.so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=1e-5)


def test_compose_inverse_identity():
    rng = np.random.default_rng(3)
    T = se3.exp(random_xi(rng, n=(16,)))
    I = se3.compose(T, se3.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-12)


def test_apply_matches_matmul():
    rng = np.random.default_rng(4)
    T = se3.exp(random_xi(rng))
    pts = jnp.asarray(rng.standard_normal((100, 3)))
    out = se3.apply(T, pts)
    Tn = np.asarray(T)
    expected = np.asarray(pts) @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)


def test_rotation_orthonormal():
    rng = np.random.default_rng(5)
    R = se3.rotation(se3.exp(random_xi(rng, scale=2.0, n=(32,))))
    RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-12)


def test_left_jacobian_finite_difference():
    # d/deps exp((phi + eps e_i)) vs V: check exp(phi+dphi) ≈ exp(J_l dphi) exp(phi)
    rng = np.random.default_rng(6)
    phi = jnp.asarray(rng.uniform(-1, 1, 3))
    V = se3.so3_left_jacobian(phi)
    eps = 1e-7
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        R1 = np.asarray(se3.so3_exp(phi + jnp.asarray(d)))
        R0 = np.asarray(se3.so3_exp(phi))
        dR = R1 @ R0.T  # left increment
        w = np.asarray(se3.so3_log(jnp.asarray(dR))) / eps
        np.testing.assert_allclose(w, np.asarray(V)[:, i], atol=1e-5)


@pytest.mark.parametrize("batch", [(), (4,), (2, 3)])
def test_batch_shapes(batch):
    rng = np.random.default_rng(7)
    xi = random_xi(rng, n=batch)
    T = se3.exp(xi)
    assert T.shape == batch + (4, 4)
    assert se3.log(T).shape == batch + (6,)
    assert se3.inverse(T).shape == batch + (4, 4)
