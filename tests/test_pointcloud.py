import jax.numpy as jnp
import numpy as np

from tpu_icp_slam.core import pointcloud as pcm
from tpu_icp_slam.core import se3


def test_make_pads_and_masks():
    pts = np.random.default_rng(0).standard_normal((10, 3))
    pc = pcm.make(pts, capacity=16)
    assert pc.points.shape == (16, 3)
    assert int(pcm.count(pc)) == 10
    np.testing.assert_allclose(np.asarray(pc.points[:10]), pts, atol=1e-6)
    assert np.all(np.asarray(pc.points[10:]) == pcm.PAD_COORD)


def test_make_truncates():
    pts = np.zeros((10, 3))
    pc = pcm.make(pts, capacity=4)
    assert pc.points.shape == (4, 3)
    assert int(pcm.count(pc)) == 4


def test_transform_keeps_sentinels():
    pts = np.random.default_rng(1).standard_normal((5, 3))
    pc = pcm.make(pts, capacity=8)
    T = se3.exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, 0.1, -0.1], dtype=jnp.float32))
    out = pcm.transform(T, pc)
    assert np.all(np.asarray(out.points[5:]) == pcm.PAD_COORD)
    Tn = np.asarray(T, dtype=np.float64)
    expected = pts @ Tn[:3, :3].T + Tn[:3, 3]
    np.testing.assert_allclose(np.asarray(out.points[:5]), expected, atol=1e-5)


def test_voxel_downsample():
    pts = np.array([[0.0, 0.0, 0.0], [0.01, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = pcm.voxel_downsample_np(pts, voxel=0.1)
    assert out.shape == (2, 3)


def test_pytree_roundtrip():
    import jax

    pc = pcm.make(np.ones((3, 3)), capacity=4)
    leaves, treedef = jax.tree_util.tree_flatten(pc)
    pc2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(pc2.points), np.asarray(pc.points))
