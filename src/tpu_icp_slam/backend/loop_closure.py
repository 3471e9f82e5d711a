"""Loop-closure detection (SURVEY.md §2b N13; BASELINE.json config 4).

Scan-context-style descriptors: each keyframe scan becomes a (rings × sectors)
polar image whose cells hold the max point height in that (range, azimuth)
bin — rotation about z shifts the sector axis, so matching scans under yaw
becomes a max over circular shifts of a cosine similarity. On TPU the whole
candidate search is one einsum: (K, R·S) keyframe descriptors × (S, R·S)
shifted queries → (K, S) scores, max over shifts — no tree, no loop.

Candidates are gated by keyframe separation, then verified geometrically by
full ICP (icp/loop.py) with the descriptor's best-shift yaw as the initial
rotation; accepted closures become pose-graph factors (backend/pose_graph.py).
The reference has no backend at all (SURVEY.md §2a) — this is the
driver-mandated extension.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_icp_slam.config import BackendConfig, ICPConfig
from tpu_icp_slam.core import se3
from tpu_icp_slam.core.pointcloud import PointCloud
from tpu_icp_slam.icp.loop import align


@partial(jax.jit, static_argnames=("rings", "sectors"))
def scan_context(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    rings: int = 20,
    sectors: int = 60,
    max_range: float = 60.0,
) -> jnp.ndarray:
    """Sensor-frame scan -> (rings, sectors) polar descriptor.

    3D scans (N, 3): max point height per (range, azimuth) bin (classic scan
    context). 2D scans (N, 2): occupancy count per bin (the grid
    cross-correlation analogue, SURVEY.md §2b N13) — there is no height axis.
    """
    x, y = points[:, 0], points[:, 1]
    r = jnp.sqrt(x * x + y * y)
    ring = jnp.clip((r / max_range * rings).astype(jnp.int32), 0, rings - 1)
    theta = jnp.arctan2(y, x)  # [-pi, pi)
    sector = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * sectors).astype(jnp.int32), 0, sectors - 1
    )
    flat = ring * sectors + sector
    if points.shape[1] >= 3:
        # max-height per bin; invalid points write -inf (then floored to 0)
        zval = jnp.where(mask, points[:, 2], -jnp.inf)
        desc = jnp.full((rings * sectors,), -jnp.inf, points.dtype)
        desc = desc.at[flat].max(zval)
        desc = jnp.where(jnp.isfinite(desc), desc, 0.0)
    else:
        ones = jnp.where(mask, 1.0, 0.0).astype(points.dtype)
        desc = jnp.zeros((rings * sectors,), points.dtype).at[flat].add(ones)
    return desc.reshape(rings, sectors)


@jax.jit
def shift_score_matrix(query: jnp.ndarray, descs: jnp.ndarray) -> jnp.ndarray:
    """(K, S) column-cosine score of `query` (R, S) vs descs (K, R, S) at
    every circular sector shift."""
    s = query.shape[-1]
    shifts = jnp.arange(s)
    shifted = jax.vmap(lambda k: jnp.roll(query, k, axis=-1))(shifts)  # (S, R, S)
    qcol = jnp.linalg.norm(shifted, axis=-2)  # (S, S) column norms
    dcol = jnp.linalg.norm(descs, axis=-2)  # (K, S)
    dots = jnp.einsum("krs,mrs->kms", descs, shifted)
    denom = dcol[:, None, :] * qcol[None, :, :]
    both = denom > 1e-9
    cos = jnp.where(both, dots / jnp.maximum(denom, 1e-9), 0.0)
    n_both = jnp.maximum(jnp.sum(both, axis=-1), 1)
    return jnp.sum(cos, axis=-1) / n_both  # (K, S)


@jax.jit
def shift_match_scores(query: jnp.ndarray, descs: jnp.ndarray):
    """Yaw-invariant similarity of `query` (R, S) against descs (K, R, S).

    Scan-context column scoring: at each circular shift, the score is the
    mean cosine between per-sector *columns* (ring profiles), averaged over
    sectors where both columns are non-empty — much more discriminative than
    a whole-image cosine when bins are sparse. Returns (scores (K,),
    best_shift (K,)); shift s means the candidate is rotated by s·2π/S
    relative to the query.
    """
    scores = shift_score_matrix(query, descs)  # (K, S)
    best_shift = jnp.argmax(scores, axis=-1)
    return jnp.max(scores, axis=-1), best_shift.astype(jnp.int32)


@dataclasses.dataclass
class LoopCandidate:
    query_idx: int
    match_idx: int
    score: float
    yaw: float  # descriptor-estimated relative yaw (radians)


@dataclasses.dataclass
class LoopClosure:
    i: int  # earlier keyframe
    j: int  # later keyframe
    T_ij: np.ndarray  # (4, 4) measured X_i⁻¹ X_j
    rmse: float
    n_inliers: int


class LoopDetector:
    """Keyframe descriptor store + candidate search + ICP verification.

    Host-orchestrated (runs once per keyframe, not per frame); all heavy math
    (descriptors, score matrix, verification ICP) is jitted on device.
    """

    def __init__(self, cfg: BackendConfig, icp_cfg: Optional[ICPConfig] = None,
                 max_range: float = 60.0):
        self.cfg = cfg
        # coarse-to-fine: descriptors give yaw but no translation, and loop
        # revisits can be metres off laterally — a single tight gate has too
        # small a basin. Stage 1 locks on with a wide gate, stage 2 refines.
        self.icp_coarse = icp_cfg or ICPConfig(
            method="point_to_point",
            max_iters=50,
            max_corr_dist=6.0,
            nn_backend="auto",
            huber_delta=1.5,
            max_step_trans=3.0,
            max_step_rot=0.5,
            min_inliers=30,
            tol=1e-5,
        )
        self.icp_fine = dataclasses.replace(
            self.icp_coarse, max_corr_dist=1.5, huber_delta=0.5, max_iters=30
        )
        self.max_range = max_range
        self._descs: list[np.ndarray] = []
        self._positions: list = []

    def add_keyframe(self, points, mask, position=None) -> int:
        d = scan_context(
            jnp.asarray(points, jnp.float32),
            jnp.asarray(mask),
            rings=self.cfg.descriptor_rings,
            sectors=self.cfg.descriptor_sectors,
            max_range=self.max_range,
        )
        self._descs.append(np.asarray(d))
        self._positions.append(
            None if position is None else np.asarray(position, np.float64)
        )
        return len(self._descs) - 1

    def candidates(self, query_idx: int) -> list[LoopCandidate]:
        """Descriptor matches against old-enough keyframes, gated by the
        odometry-estimate distance (cfg.gating_radius) when positions are
        known — the covariance gate that defeats perceptual aliasing in
        self-similar worlds (SURVEY.md §2b N13)."""
        lo = query_idx - self.cfg.min_loop_separation
        if lo <= 0:
            return []
        descs = jnp.asarray(np.stack(self._descs[:lo]))
        scores, shifts = shift_match_scores(
            jnp.asarray(self._descs[query_idx]), descs
        )
        scores = np.asarray(scores).astype(np.float64)
        shifts = np.asarray(shifts)
        qpos = self._positions[query_idx]
        if qpos is not None and self.cfg.gating_radius > 0:
            for m in range(lo):
                mpos = self._positions[m]
                if mpos is not None and (
                    np.linalg.norm(mpos - qpos) > self.cfg.gating_radius
                ):
                    scores[m] = -np.inf
        top = np.argsort(-scores)[: self.cfg.candidate_topk]
        top = top[np.isfinite(scores[top])]
        out = []
        for m in top:
            yaw = shifts[m] * 2 * np.pi / self.cfg.descriptor_sectors
            if yaw > np.pi:
                yaw -= 2 * np.pi
            out.append(
                LoopCandidate(
                    query_idx=query_idx,
                    match_idx=int(m),
                    score=float(scores[m]),
                    yaw=float(yaw),
                )
            )
        return out

    def verify(
        self,
        cand: LoopCandidate,
        query_points,
        query_mask,
        match_points,
        match_mask,
        T_pred=None,
    ) -> Optional[LoopClosure]:
        """ICP the query scan onto the match scan; accept on tight residual.

        T_pred (optional 4×4): odometry-predicted relative pose X_i⁻¹ X_j.
        In self-similar worlds a *wrong* lock can have low rmse (structure
        repeats every grid period); requiring the measurement to sit within
        the drift bound of the prediction rejects those aliases while true
        loops (drift ≪ gating_radius) pass.

        Returns T_ij with i = match (earlier), j = query (later): the relative
        pose factor X_i⁻¹ X_j for the pose graph.
        """
        # multi-hypothesis yaw: sparse descriptors give an unreliable single
        # shift, so seed the coarse ICP from the top descriptor shifts plus
        # the cardinal yaws and keep the best-rmse lock (one vmapped align)
        s_sec = self.cfg.descriptor_sectors
        row = np.asarray(
            shift_score_matrix(
                jnp.asarray(self._descs[cand.query_idx]),
                jnp.asarray(self._descs[cand.match_idx])[None],
            )
        )[0]
        shifts = list(np.argsort(-row)[:4])
        yaws = [sh * 2 * np.pi / s_sec for sh in shifts]
        yaws += [0.0, np.pi / 2, np.pi, -np.pi / 2]
        d = int(np.asarray(query_points).shape[1])
        inits = []
        for y in yaws:
            c, s = np.cos(y), np.sin(y)
            T0 = np.eye(d + 1, dtype=np.float32)
            T0[:2, :2] = [[c, -s], [s, c]]
            inits.append(T0)
        inits = jnp.asarray(np.stack(inits))
        src = PointCloud(
            points=jnp.asarray(query_points, jnp.float32),
            mask=jnp.asarray(query_mask),
        )
        dst = PointCloud(
            points=jnp.asarray(match_points, jnp.float32),
            mask=jnp.asarray(match_mask),
        )
        coarse = jax.vmap(lambda T0: align(src, dst, T0, self.icp_coarse))(inits)
        fine = jax.vmap(lambda T0: align(src, dst, T0, self.icp_fine))(coarse.T)
        rmses = np.asarray(fine.rmse, np.float64)
        inls = np.asarray(fine.n_inliers)
        Ts = np.asarray(fine.T, np.float64)
        n_valid = int(np.asarray(query_mask).sum())
        ok = (rmses <= self.cfg.verify_max_rmse) & (inls >= 0.3 * max(n_valid, 1))
        if T_pred is not None and self.cfg.verify_max_dev > 0:
            t_dev = np.linalg.norm(
                Ts[:, :d, d] - np.asarray(T_pred)[None, :d, d], axis=1
            )
            ok &= t_dev <= self.cfg.verify_max_dev
        if not ok.any():
            return None
        best = int(np.argmin(np.where(ok, rmses, np.inf)))
        return LoopClosure(
            i=cand.match_idx,
            j=cand.query_idx,
            T_ij=Ts[best],
            rmse=float(rmses[best]),
            n_inliers=int(inls[best]),
        )

    def relocalize(
        self,
        query_points,
        query_mask,
        kf_scans,
        kf_poses,
        topk: int = 3,
    ):
        """Global relocalization: place a scan in the existing keyframe map.

        No odometry prior exists (kidnapped-robot case), so no separation or
        position gating — pure descriptor ranking over ALL keyframes, then
        multi-yaw geometric verification of the top candidates. Returns
        (pose (4,4) or (3,3), match_idx, rmse) or None. A capability the
        reference never had (its only state was the live run).
        """
        if not self._descs:
            return None
        d = scan_context(
            jnp.asarray(query_points, jnp.float32),
            jnp.asarray(query_mask),
            rings=self.cfg.descriptor_rings,
            sectors=self.cfg.descriptor_sectors,
            max_range=self.max_range,
        )
        descs = jnp.asarray(np.stack(self._descs))
        scores, shifts = shift_match_scores(d, descs)
        scores = np.asarray(scores)
        shifts = np.asarray(shifts)
        n_q = len(self._descs)
        # verify() reads descriptors by index: stage the query at the end
        self._descs.append(np.asarray(d))
        self._positions.append(None)
        try:
            for m in np.argsort(-scores)[:topk]:
                yaw = shifts[m] * 2 * np.pi / self.cfg.descriptor_sectors
                if yaw > np.pi:
                    yaw -= 2 * np.pi
                cand = LoopCandidate(
                    query_idx=n_q, match_idx=int(m),
                    score=float(scores[m]), yaw=float(yaw),
                )
                lc = self.verify(
                    cand,
                    query_points, query_mask,
                    kf_scans[m][0], kf_scans[m][1],
                )
                if lc is not None:
                    pose = np.asarray(kf_poses[m]) @ lc.T_ij
                    return pose, int(m), lc.rmse
        finally:
            self._descs.pop()
            self._positions.pop()
        return None
