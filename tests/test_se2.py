import jax
import jax.numpy as jnp
import numpy as np

from tpu_icp_slam.core import se2



def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.uniform(-2, 2, size=(64, 3)))
    T = se2.exp(xi)
    np.testing.assert_allclose(np.asarray(se2.log(T)), np.asarray(xi), atol=1e-10)


def test_small_angle():
    xi = jnp.asarray([[0.3, -0.2, 1e-9], [0.0, 0.0, 0.0]])
    T = se2.exp(xi)
    np.testing.assert_allclose(np.asarray(se2.log(T)), np.asarray(xi), atol=1e-12)


def test_compose_inverse():
    rng = np.random.default_rng(1)
    T = se2.exp(jnp.asarray(rng.uniform(-2, 2, size=(8, 3))))
    I = se2.compose(T, se2.inverse(T))
    np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-12)


def test_apply():
    T = se2.from_xytheta(1.0, 2.0, np.pi / 2)
    pts = jnp.asarray([[1.0, 0.0]])
    out = np.asarray(se2.apply(T, pts))
    np.testing.assert_allclose(out, [[1.0, 3.0]], atol=1e-6)


def test_to_se3_embedding():
    rng = np.random.default_rng(2)
    T2 = se2.exp(jnp.asarray(rng.uniform(-1, 1, size=(5, 3))))
    T3 = se2.to_se3(T2)
    assert T3.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(T3[:, :2, :2]), np.asarray(T2[:, :2, :2]))
    np.testing.assert_allclose(np.asarray(T3[:, :2, 3]), np.asarray(T2[:, :2, 2]))
    np.testing.assert_allclose(np.asarray(T3[:, 2:, 2:]), np.broadcast_to(np.eye(2), (5, 2, 2)))
