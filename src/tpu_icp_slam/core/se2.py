"""SE(2) rigid-transform algebra, batched, jit-friendly.

Transforms are homogeneous (..., 3, 3) matrices; tangents are (..., 3)
[rho_x, rho_y, phi]. Used by the 2D lidar pipeline (occupancy-grid SLAM), the
capability class of the reference app (SURVEY.md §2a R3/R9; mount empty, §0).
"""

from __future__ import annotations

import jax.numpy as jnp


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [rho, phi] -> (..., 3, 3)."""
    rho, phi = xi[..., :2], xi[..., 2]
    c, s = jnp.cos(phi), jnp.sin(phi)
    small = jnp.abs(phi) < 1e-5
    phi_safe = jnp.where(small, 1.0, phi)
    # V = [[sin/phi, -(1-cos)/phi], [(1-cos)/phi, sin/phi]]
    a = jnp.where(small, 1.0 - phi * phi / 6.0, s / phi_safe)
    b = jnp.where(small, phi / 2.0, (1.0 - c) / phi_safe)
    tx = a * rho[..., 0] - b * rho[..., 1]
    ty = b * rho[..., 0] + a * rho[..., 1]
    return from_rt_theta(c, s, jnp.stack([tx, ty], axis=-1))


def log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) [rho, phi]."""
    phi = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    t = T[..., :2, 2]
    c, s = jnp.cos(phi), jnp.sin(phi)
    small = jnp.abs(phi) < 1e-5
    phi_safe = jnp.where(small, 1.0, phi)
    a = jnp.where(small, 1.0 - phi * phi / 6.0, s / phi_safe)
    b = jnp.where(small, phi / 2.0, (1.0 - c) / phi_safe)
    det = a * a + b * b
    # V^{-1} = 1/det [[a, b], [-b, a]]
    rx = (a * t[..., 0] + b * t[..., 1]) / det
    ry = (-b * t[..., 0] + a * t[..., 1]) / det
    return jnp.stack([rx, ry, phi], axis=-1)


def from_rt_theta(c: jnp.ndarray, s: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(c.shape, t.shape[:-1])
    z = jnp.zeros(batch, dtype=t.dtype)
    one = jnp.ones(batch, dtype=t.dtype)
    c = jnp.broadcast_to(c, batch)
    s = jnp.broadcast_to(s, batch)
    t = jnp.broadcast_to(t, batch + (2,))
    row0 = jnp.stack([c, -s, t[..., 0]], axis=-1)
    row1 = jnp.stack([s, c, t[..., 1]], axis=-1)
    row2 = jnp.stack([z, z, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_xytheta(x, y, theta) -> jnp.ndarray:
    x, y, theta = (jnp.asarray(v, dtype=jnp.float32) for v in (x, y, theta))
    return from_rt_theta(jnp.cos(theta), jnp.sin(theta), jnp.stack([x, y], axis=-1))


def to_xytheta(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [T[..., 0, 2], T[..., 1, 2], jnp.arctan2(T[..., 1, 0], T[..., 0, 0])], axis=-1
    )


def identity(dtype=jnp.float32, batch: tuple = ()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :2, :2]
    t = T[..., :2, 2]
    Rt = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rt, t)
    c = Rt[..., 0, 0]
    s = Rt[..., 1, 0]
    return from_rt_theta(c, s, tinv)


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) x (..., N, 2) -> (..., N, 2)."""
    R = T[..., :2, :2]
    t = T[..., :2, 2]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def to_se3(T2: jnp.ndarray) -> jnp.ndarray:
    """Embed SE(2) into SE(3) (z = 0, rotation about z)."""
    batch = T2.shape[:-2]
    T3 = jnp.broadcast_to(jnp.eye(4, dtype=T2.dtype), batch + (4, 4))
    T3 = T3.at[..., :2, :2].set(T2[..., :2, :2])
    T3 = T3.at[..., :2, 3].set(T2[..., :2, 2])
    return T3
