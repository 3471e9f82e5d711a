"""Point-to-point rigid solve: masked/weighted Umeyama via SVD (N5).

The TPU-native replacement for the reference's reduction kernels + vendored
3x3 SVD device code (SURVEY.md §2a R7/R8; mount empty, §0): centroids and the
DxD cross-covariance are masked matmul reductions (MXU/VPU native), and the
tiny DxD SVD runs once per ICP iteration in fp32 via jnp.linalg.svd — batched
over leading dims when solving many pairs at once (backend verification uses
this with vmap).
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama_masked(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted rigid least-squares: returns T (D+1, D+1) with dst ≈ R src + t.

    src, dst: (..., M, D) paired points; weights: (..., M) >= 0 (zeros = padding
    or gated correspondences). Accumulation is fp32; the SVD is DxD (2 or 3).
    """
    d = src.shape[-1]
    w = weights[..., None]  # (..., M, 1)
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)  # (..., 1, 1)
    mu_s = jnp.sum(w * src, axis=-2, keepdims=True) / wsum  # (..., 1, D)
    mu_d = jnp.sum(w * dst, axis=-2, keepdims=True) / wsum
    xs = (src - mu_s) * w
    xd = dst - mu_d
    # cross-covariance (..., D, D) = xdᵀ @ xs — a small matmul reduction
    cov = jnp.swapaxes(xd, -1, -2) @ xs / wsum
    U, _, Vt = jnp.linalg.svd(cov)
    # reflection correction: scale the last left-singular column by sign(det)
    sign = jnp.sign(jnp.linalg.det(U @ Vt))
    d_vec = jnp.ones(sign.shape + (d,), dtype=src.dtype).at[..., -1].multiply(sign)
    R = (U * d_vec[..., None, :]) @ Vt
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_s[..., 0, :])
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (d + 1, d + 1), dtype=src.dtype)
    T = T.at[..., :d, :d].set(R)
    T = T.at[..., :d, d].set(t)
    T = T.at[..., d, d].set(1.0)
    return T
