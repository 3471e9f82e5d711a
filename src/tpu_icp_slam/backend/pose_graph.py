"""Pose-graph Gauss-Newton optimizer (SURVEY.md §2b N14; BASELINE.json 4–5).

SE(3) relative-pose factors r = log(T_meas⁻¹ · X_i⁻¹ · X_j) minimized by
damped Gauss-Newton with right-perturbation updates X ← X·exp(ξ) and Huber
robust weights. TPU-first shape discipline: the graph is fixed-capacity —
(K, 4, 4) poses with a validity mask and (F,) factor slots with weight 0 for
empty slots — so the whole optimization jits as one `lax.fori_loop` whose
body builds the (K·6, K·6) normal equations with scatter-adds of 6×6 blocks
(dense MXU-friendly assembly; K ≤ ~1k keeps H < 150 MB) and solves one damped
Cholesky. Gauge freedom is fixed by a strong diagonal prior on pose 0.

The distributed Schur-complement variant lives in backend/schur.py; this
module is its single-device oracle (SURVEY.md §7 "Distributed Schur
correctness").

Jacobians (right perturbation, translation-first tangent [rho, phi]):
  E = T_meas⁻¹ A, A = X_i⁻¹ X_j
  ∂r/∂ξ_j =  Jr⁻¹(r)
  ∂r/∂ξ_i = -Jr⁻¹(r) · Ad(A⁻¹)
with Jr⁻¹ the (2nd-order) inverse right Jacobian (core/se3.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from tpu_icp_slam.core import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Fixed-capacity pose graph. weight == 0 marks an empty factor slot."""

    poses: jnp.ndarray  # (K, 4, 4) world <- keyframe
    pose_mask: jnp.ndarray  # (K,) bool
    fi: jnp.ndarray  # (F,) int32 factor tail (from)
    fj: jnp.ndarray  # (F,) int32 factor head (to)
    T_meas: jnp.ndarray  # (F, 4, 4) measured X_i⁻¹ X_j
    weight: jnp.ndarray  # (F,) >= 0; 0 = empty slot

    @property
    def capacity(self) -> int:
        return self.poses.shape[0]

    @property
    def factor_capacity(self) -> int:
        return self.fi.shape[0]


def create(max_keyframes: int, max_factors: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(
            jnp.eye(4, dtype=dtype), (max_keyframes, 4, 4)
        ),
        pose_mask=jnp.zeros((max_keyframes,), bool),
        fi=jnp.zeros((max_factors,), jnp.int32),
        fj=jnp.zeros((max_factors,), jnp.int32),
        T_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (max_factors, 4, 4)),
        weight=jnp.zeros((max_factors,), dtype),
    )


def from_arrays(poses, factors, max_keyframes=0, max_factors=0, dtype=jnp.float32):
    """Host-side builder: poses (K,4,4); factors list of (i, j, T_meas, w)."""
    import numpy as np

    k = len(poses)
    f = len(factors)
    kk = max(max_keyframes, k)
    ff = max(max_factors, f)
    g = create(kk, ff, dtype=dtype)
    pz = np.tile(np.eye(4), (kk, 1, 1))
    pz[:k] = np.asarray(poses)
    fi = np.zeros(ff, np.int32)
    fj = np.zeros(ff, np.int32)
    tm = np.tile(np.eye(4), (ff, 1, 1))
    w = np.zeros(ff, np.float64)
    for n, (i, j, T, wt) in enumerate(factors):
        fi[n], fj[n], tm[n], w[n] = i, j, np.asarray(T), wt
    mask = np.zeros(kk, bool)
    mask[:k] = True
    return dataclasses.replace(
        g,
        poses=jnp.asarray(pz, dtype),
        pose_mask=jnp.asarray(mask),
        fi=jnp.asarray(fi),
        fj=jnp.asarray(fj),
        T_meas=jnp.asarray(tm, dtype),
        weight=jnp.asarray(w, dtype),
    )


def residuals(g: PoseGraph) -> jnp.ndarray:
    """(F, 6) factor residuals log(T_meas⁻¹ X_i⁻¹ X_j)."""
    Xi = g.poses[g.fi]
    Xj = g.poses[g.fj]
    A = se3.inverse(Xi) @ Xj
    E = se3.inverse(g.T_meas) @ A
    return se3.log(E)


def linearize(g: PoseGraph, huber_delta: float = 0.0):
    """Build factor blocks: (r (F,6), Ji (F,6,6), Jj (F,6,6), w (F,))."""
    Xi = g.poses[g.fi]
    Xj = g.poses[g.fj]
    A = se3.inverse(Xi) @ Xj
    E = se3.inverse(g.T_meas) @ A
    r = se3.log(E)
    Jr_inv = se3.right_jacobian_inv(r)
    Jj = Jr_inv
    Ji = -(Jr_inv @ se3.adjoint(se3.inverse(A)))
    w = g.weight
    if huber_delta > 0.0:
        rn = jnp.linalg.norm(r, axis=-1)
        w = w * jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12))
    return r, Ji, Jj, w


def assemble(g: PoseGraph, r, Ji, Jj, w, damping: float, anchor_weight: float):
    """Dense normal equations H (K,6,K,6), g-vec (K,6) via block scatter-add."""
    k = g.capacity
    dtype = r.dtype
    wJi = Ji * w[:, None, None]
    wJj = Jj * w[:, None, None]
    Hii = jnp.einsum("fab,fac->fbc", Ji, wJi)
    Hjj = jnp.einsum("fab,fac->fbc", Jj, wJj)
    Hij = jnp.einsum("fab,fac->fbc", Ji, wJj)
    gi = jnp.einsum("fab,fa->fb", wJi, r)
    gj = jnp.einsum("fab,fa->fb", wJj, r)

    H = jnp.zeros((k, k, 6, 6), dtype)
    H = H.at[g.fi, g.fi].add(Hii)
    H = H.at[g.fj, g.fj].add(Hjj)
    H = H.at[g.fi, g.fj].add(Hij)
    H = H.at[g.fj, g.fi].add(jnp.swapaxes(Hij, -1, -2))
    gv = jnp.zeros((k, 6), dtype)
    gv = gv.at[g.fi].add(gi)
    gv = gv.at[g.fj].add(gj)

    eye = jnp.eye(6, dtype=dtype)
    diag_boost = damping * eye
    # gauge anchor: pin pose 0; inactive poses get identity blocks so H stays SPD
    anchor = jnp.zeros((k,), dtype).at[0].set(anchor_weight)
    inactive = (~g.pose_mask).astype(dtype)
    boost = anchor + inactive
    H = H.at[jnp.arange(k), jnp.arange(k)].add(
        diag_boost[None] + boost[:, None, None] * eye[None]
    )
    return H, gv


def solve_dense(H, gv):
    """(K,6,K,6)-blocked H to a dense solve; returns dx (K, 6)."""
    k = H.shape[0]
    Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(k * 6, k * 6)
    b = -gv.reshape(k * 6)
    L = jnp.linalg.cholesky(Hd)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    return x.reshape(k, 6)


def apply_update(g: PoseGraph, dx: jnp.ndarray) -> PoseGraph:
    """Right-perturbation X ← X exp(ξ) on active poses (pose 0 anchored)."""
    act = g.pose_mask & (jnp.arange(g.capacity) != 0)
    dx = jnp.where(act[:, None], dx, 0.0)
    new_poses = g.poses @ se3.exp(dx)
    return dataclasses.replace(g, poses=new_poses)


def optimize(
    g: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float = 0.0,
    anchor_weight: float = 1e6,
) -> tuple[PoseGraph, jnp.ndarray]:
    """Damped GN loop (jittable): returns (graph, per-iter total chi2 (iters,))."""

    def body(_, carry):
        gr, chis, it = carry
        r, Ji, Jj, w = linearize(gr, huber_delta)
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        H, gv = assemble(gr, r, Ji, Jj, w, damping, anchor_weight)
        dx = solve_dense(H, gv)
        gr = apply_update(gr, dx)
        return gr, chis.at[it].set(chi2), it + 1

    chis0 = jnp.zeros((iters,), g.poses.dtype)
    g_out, chis, _ = lax.fori_loop(
        0, iters, body, (g, chis0, jnp.asarray(0, jnp.int32))
    )
    return g_out, chis
