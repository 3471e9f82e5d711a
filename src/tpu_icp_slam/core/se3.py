"""SE(3) rigid-transform algebra, batched, jit-friendly.

Transforms are homogeneous (..., 4, 4) float matrices. Tangent vectors are
(..., 6) arranged [rho (translation part), phi (rotation part)] — the "left"
(world-frame) convention: exp(xi) = [[exp(phi^), V(phi) rho], [0, 1]].

Replaces the implicit pose math spread through the reference's CUDA/C++ ICP
solvers (SURVEY.md §2a R4–R8; the reference mount is empty — no file:line
citations are possible, see SURVEY.md §0). Everything here is pure jax.numpy:
batched via leading dims, differentiable, and safe under jit (Taylor fallbacks
for small angles instead of data-dependent branches).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _so3_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) with Taylor fallbacks, where
    exp(W) = I + A W + B W^2,  V = I + B W + C W^2 (left Jacobian of SO(3)).
    A = sin t / t, B = (1 - cos t)/t^2, C = (t - sin t)/t^3.
    """
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)  # guarded; exact value unused in small branch
    small = theta_sq < 1e-8
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta))
    return A, B, C


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vector -> (..., 3, 3) rotation matrix (Rodrigues)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _so3_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): exp translation coupling; (...,3)->(...,3,3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    _, B, C = _so3_coeffs(theta_sq)
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Robust for theta in [0, pi); near pi uses the diagonal-based branch.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic branch: theta / (2 sin theta) * vee(R - R^T)
    sin_theta = jnp.sin(theta)
    vec = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis
    small = theta < 1e-4
    # near 0: R - R^T ≈ 2 W, so vec/2 ≈ phi; include 2nd-order factor
    factor_generic = theta / jnp.where(sin_theta < 1e-12, 1.0, 2.0 * sin_theta)
    factor_small = 0.5 + theta * theta / 12.0
    factor = jnp.where(small, factor_small, factor_generic)
    phi_generic = factor[..., None] * vec

    # near pi: S := (R + R^T)/2 = cos I + (1-cos) a a^T, so row k of
    # (S - cos I) equals (1-cos) a_k * a. Pick the dominant diagonal entry k,
    # read the axis off that row, and orient it so a . vee(R - R^T) >= 0.
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    M = S - cos_theta[..., None, None] * jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    row = jnp.take_along_axis(M, k[..., None, None].repeat(3, axis=-1), axis=-2)[..., 0, :]
    axis_pi = row / jnp.clip(jnp.linalg.norm(row, axis=-1, keepdims=True), 1e-12, None)
    dot = jnp.sum(axis_pi * vec, axis=-1, keepdims=True)
    axis_pi = jnp.where(dot < 0.0, -axis_pi, axis_pi)
    phi_pi = theta[..., None] * axis_pi

    near_pi = theta > (jnp.pi - 1e-3)
    return jnp.where(near_pi[..., None], phi_pi, phi_generic)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (..., 6) [rho, phi] -> (..., 4, 4) transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return from_rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) [rho, phi]."""
    R, t = rotation(T), translation(T)
    phi = so3_log(R)
    # V^{-1} = I - W/2 + D W^2, D = (1/t^2) - (1 + cos)/(2 t sin)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)
    small = theta_sq < 1e-8
    D = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / jnp.where(small, 1.0, theta_sq))
        - (1.0 + jnp.cos(theta)) / jnp.where(small, 1.0, 2.0 * theta * jnp.sin(theta)),
    )
    W = hat(phi)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = I - 0.5 * W + D[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def identity(dtype=jnp.float32, batch: tuple = ()) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rotation_geodesic(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between rotations."""
    M = jnp.swapaxes(Ra, -1, -2) @ Rb
    trace = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6, 6) adjoint for the [rho, phi] tangent order:
    Ad(T) = [[R, [t]x R], [0, R]], so T exp(xi) T^-1 = exp(Ad(T) xi)."""
    R, t = rotation(T), translation(T)
    tx = hat(t)
    top = jnp.concatenate([R, tx @ R], axis=-1)
    zeros = jnp.zeros_like(R)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def ad(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) little adjoint: ad(xi) = [[phi^, rho^], [0, phi^]] (..., 6, 6)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    px, rx = hat(phi), hat(rho)
    zeros = jnp.zeros_like(px)
    top = jnp.concatenate([px, rx], axis=-1)
    bottom = jnp.concatenate([zeros, px], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def right_jacobian_inv(xi: jnp.ndarray) -> jnp.ndarray:
    """Second-order approximation Jr^-1(xi) ≈ I + ad(xi)/2 + ad(xi)^2/12.

    Exact enough for pose-graph Gauss-Newton where residuals are small; the
    fixed point (r -> 0) is unaffected by the truncation.
    """
    A = ad(xi)
    I6 = jnp.broadcast_to(jnp.eye(6, dtype=xi.dtype), A.shape)
    return I6 + 0.5 * A + (A @ A) / 12.0
