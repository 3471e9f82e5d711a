"""RGB-D odometry pipeline (config 3): depth backprojection + point-to-plane
ICP with projective correspondence, frame-to-frame (SURVEY.md §3b).

One jitted step: backproject the new depth image, build vertex/normal maps,
run the projective point-to-plane ICP while_loop against the previous frame's
maps, compose the pose. Fused mode scans the whole depth stack in one
dispatch, like the 2D pipeline.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tpu_icp_slam.config import SlamConfig
from tpu_icp_slam.core.pointcloud import PointCloud
from tpu_icp_slam.icp.loop import align_with_correspondence
from tpu_icp_slam.icp.projective import (
    CameraIntrinsics,
    backproject_depth,
    projective_correspondence,
)
from tpu_icp_slam.mapping.normals import normals_from_depth


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RGBDState:
    pose: jnp.ndarray  # (4, 4) world <- camera
    T_rel: jnp.ndarray  # (4, 4) last inter-frame motion
    prev_vertex: jnp.ndarray  # (H, W, 3)
    prev_normal: jnp.ndarray  # (H, W, 3)
    prev_valid: jnp.ndarray  # (H, W)
    frame: jnp.ndarray


class RGBDOdometry:
    def __init__(self, cfg: SlamConfig, K: CameraIntrinsics):
        self.cfg = cfg
        self.K = K
        self._step = jax.jit(functools.partial(_step, cfg=cfg, K=K))
        self._fused = jax.jit(functools.partial(_fused, cfg=cfg, K=K))

    def init_state(self, first_depth) -> RGBDState:
        vmap_, valid = backproject_depth(jnp.asarray(first_depth, jnp.float32), self.K)
        nmap, nvalid = normals_from_depth(vmap_, valid)
        return RGBDState(
            pose=jnp.eye(4, dtype=jnp.float32),
            T_rel=jnp.eye(4, dtype=jnp.float32),
            prev_vertex=vmap_,
            prev_normal=nmap,
            prev_valid=valid & nvalid,
            frame=jnp.asarray(0, jnp.int32),
        )

    def step(self, state: RGBDState, depth):
        return self._step(state, jnp.asarray(depth, jnp.float32))

    def run_fused(self, state: RGBDState, depths):
        return self._fused(state, jnp.asarray(depths, jnp.float32))


def _step(state: RGBDState, depth, *, cfg: SlamConfig, K: CameraIntrinsics):
    icp_cfg = cfg.icp
    vmap_, valid = backproject_depth(depth, K)
    nmap, nvalid = normals_from_depth(vmap_, valid)
    valid_all = valid & nvalid

    # source cloud: the new frame's valid vertices, flattened (static shape).
    # rgbd_src_stride > 1 decimates the source grid (coarse pyramid level)
    # while the TARGET maps stay full-res — the projective lookup still
    # lands on exact pixels, only the residual set shrinks.
    s = max(int(cfg.pipeline.rgbd_src_stride), 1)
    vsrc = vmap_[::s, ::s] if s > 1 else vmap_
    msrc = valid_all[::s, ::s] if s > 1 else valid_all
    pts = vsrc.reshape(-1, 3)
    mask = msrc.reshape(-1)
    src = PointCloud(points=jnp.where(mask[:, None], pts, 1.0e6), mask=mask)

    corr = projective_correspondence(
        K,
        state.prev_vertex,
        state.prev_normal,
        state.prev_valid,
        max_corr_dist=icp_cfg.max_corr_dist,
        normal_gate_cos=icp_cfg.normal_gate_cos,
    )
    init = (
        state.T_rel
        if cfg.pipeline.motion_model == "constant_velocity"
        else jnp.eye(4, dtype=jnp.float32)
    )
    res = align_with_correspondence(src, corr, init, icp_cfg)
    pose = state.pose @ res.T
    new_state = RGBDState(
        pose=pose,
        T_rel=res.T,
        prev_vertex=vmap_,
        prev_normal=nmap,
        prev_valid=valid_all,
        frame=state.frame + 1,
    )
    info = {
        "pose": pose,
        "rmse": res.rmse,
        "iters": res.iters,
        "n_inliers": res.n_inliers,
        "converged": res.converged,
    }
    return new_state, info


def _fused(state: RGBDState, depths, *, cfg: SlamConfig, K: CameraIntrinsics):
    def body(st, depth):
        return _step(st, depth, cfg=cfg, K=K)

    return jax.lax.scan(body, state, depths)
