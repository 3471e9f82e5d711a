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


def closure_cycle_matrix(odo_poses, closures):
    """(m, m) PCM cycle norms between all closure pairs.

    cyc[a, b] = ‖log(Ta⁻¹ · odo(i_a→i_b) · Tb · odo(j_b→j_a))‖ — the twist
    norm of the loop formed by two closures and the odometry between their
    endpoints. Near zero when both closures agree with the local odometry;
    metre-scale when one of them is a perceptual alias.
    """
    import numpy as np

    odo = jnp.asarray(np.stack([np.asarray(p) for p in odo_poses]))
    ii = np.asarray([c[0] for c in closures])
    jj = np.asarray([c[1] for c in closures])
    T = jnp.asarray(np.stack([np.asarray(c[2]) for c in closures]))

    @jax.jit
    def cycle_norms(odo_, T_):
        Xi = odo_[ii]
        Xj = odo_[jj]
        Tinv = se3.inverse(T_)
        # odo(i_a -> i_b) = Xi_a⁻¹ Xi_b ; odo(j_b -> j_a) = Xj_b⁻¹ Xj_a
        A = jnp.einsum("aij,bjk->abik", se3.inverse(Xi), Xi)  # (m, m, 4, 4)
        B = jnp.einsum("bij,ajk->abik", se3.inverse(Xj), Xj)
        E = jnp.einsum(
            "aij,abjk,bkl,ablm->abim", Tinv, A, T_, B
        )
        return jnp.linalg.norm(
            jax.vmap(jax.vmap(se3.log))(E), axis=-1
        )  # (m, m)

    return np.asarray(cycle_norms(odo, T))


def closure_confidence(odo_poses, closures, suspect_cycle: float = 1.0):
    """Per-closure consistency score + suspect flag (VERDICT r2 item 9).

    score[a] = median over b≠a of the PCM cycle norm cyc[a, b] — how well
    closure a agrees with the REST of the accepted closure set through local
    odometry. True closures sit at centimetre scores; a front-end-captured
    alias (the measured r2 racetrack wall: closures wrong by 8–16 m that
    survive every consistency FILTER because the drift-aware thresholds must
    admit them) still carries a metre-scale score — the filters can't reject
    it, but consumers of the map deserve to see it. `suspect` flags scores
    above `suspect_cycle` (metres-equivalent twist norm).

    Returns (score (m,) float, suspect (m,) bool). m==1 → score nan,
    suspect False (no peers to check against — unknown, not bad).
    """
    import numpy as np

    m = len(closures)
    if m == 0:
        return np.zeros(0), np.zeros(0, bool)
    if m == 1:
        return np.full(1, np.nan), np.zeros(1, bool)
    cyc = closure_cycle_matrix(odo_poses, closures)
    off = cyc + np.diag(np.full(m, np.nan))
    score = np.nanmedian(off, axis=1)
    return score, score > suspect_cycle


def pairwise_consistent_closures(
    odo_poses,
    closures,  # list of (i, j, T_ij (4,4))
    gamma: float = 0.5,
):
    """Simplified PCM (Mangelson et al. 2018): largest mutually-consistent
    closure set.

    Two closures (i1,j1,T1), (i2,j2,T2) are consistent when the cycle
      T1⁻¹ · odo(i1→i2) · T2 · odo(j2→j1)
    is near identity — it uses odometry only BETWEEN the closure endpoints
    (where drift is small), unlike a measured-vs-prediction gate around the
    whole loop (which leaks once global drift exceeds the alias spacing —
    the r2 racetrack-soak failure). True closures form one big mutually-
    consistent clique; each alias is consistent with almost nothing. Greedy
    max-clique over the consistency graph; singleton ties broken toward the
    closure closest to its odometry prediction.

    Returns a boolean keep-mask over `closures`.
    """
    import numpy as np

    m = len(closures)
    if m <= 1:
        return np.ones(m, bool)
    odo = jnp.asarray(np.stack([np.asarray(p) for p in odo_poses]))
    ii = np.asarray([c[0] for c in closures])
    jj = np.asarray([c[1] for c in closures])
    T = jnp.asarray(np.stack([np.asarray(c[2]) for c in closures]))

    cyc = closure_cycle_matrix(odo_poses, closures)
    # drift-aware threshold: the cycle's odometry legs span |i_a−i_b| and
    # |j_a−j_b| keyframes, and odometry error grows ~√steps (random-walk
    # model — full PCM uses the propagated covariance; this is its scalar
    # shadow). A constant gamma either rejects true far pairs or admits
    # near aliases; measured on the racetrack soak: constant 0.5 dropped
    # 54/86 closures including most true ones.
    span = np.abs(ii[:, None] - ii[None, :]) + np.abs(jj[:, None] - jj[None, :])
    thresh = gamma * np.sqrt(1.0 + span)
    ok = cyc < thresh
    ok = ok & ok.T
    np.fill_diagonal(ok, True)
    # greedy clique: seed at the highest-degree node, grow by degree
    keep = np.zeros(m, bool)
    cand = np.ones(m, bool)
    deg = ok.sum(1)
    order = np.argsort(-deg)
    clique: list = []
    for seed in order:
        if not cand[seed]:
            continue
        clique = [seed]
        inset = ok[seed].copy()
        inset[seed] = False
        while inset.any():
            nxt = np.argmax(np.where(inset, deg, -1))
            clique.append(int(nxt))
            inset &= ok[nxt]
            inset[nxt] = False
        break
    if len(clique) <= 1 and m > 1:
        # all-singleton graph: no mutual support — fall back to the closure
        # most consistent with its own odometry prediction
        pred = np.asarray(
            jax.vmap(se3.log)(
                se3.inverse(T) @ (se3.inverse(odo[ii]) @ odo[jj])
            )
        )
        clique = [int(np.argmin(np.linalg.norm(pred, axis=-1)))]
    keep[np.asarray(clique, int)] = True
    return keep


def reject_inconsistent_loops(
    g: PoseGraph,
    loop_mask,
    reject_residual: float,
    iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float = 0.0,
    rounds: int = 2,
):
    """Residual-gated loop-factor rejection (lightweight switchable
    constraints, Sünderhauf-style without the switch variables).

    Optimize, then zero the weight of LOOP factors (loop_mask True) whose
    residual norm AT THE OPTIMUM exceeds `reject_residual`, and re-optimize.
    The consistent majority (odometry chain + true loops, which agree with
    each other) anchors the optimum; a false closure — e.g. a perceptual
    alias one bay over, wrong by the whole bay spacing — cannot pull the
    solution far enough to hide its own residual, so it stands out by
    metres while true loops sit at centimetres (measured: the r2 aliased
    racetrack soak accepted 8 false / 78 true closures through the
    front-end gates; this pass removes the 8). Odometry factors are never
    dropped.

    Returns (kept_weight (F,), n_dropped) — host-side orchestration; the
    caller re-runs its solver of choice (dense GN or distributed Schur) on
    the cleaned graph.
    """
    import numpy as np

    loop_mask = jnp.asarray(loop_mask)
    weight = g.weight
    n_dropped = 0
    for _ in range(rounds):
        g_cur = dataclasses.replace(g, weight=weight)
        g_opt, _ = optimize(
            g_cur, iters=iters, damping=damping, huber_delta=huber_delta
        )
        rn = jnp.linalg.norm(
            residuals(dataclasses.replace(g_opt, weight=weight)), axis=-1
        )
        drop = loop_mask & (rn > reject_residual) & (weight > 0)
        n_new = int(np.asarray(jnp.sum(drop)))
        if n_new == 0:
            break
        n_dropped += n_new
        weight = jnp.where(drop, 0.0, weight)
    return weight, n_dropped
