"""Checkpoint / resume (SURVEY.md §5 "Checkpoint/resume").

The reference had none (crash = restart the app). Here the full pipeline
state pytree — scan-to-scan (pose, motion model, previous scan, occupancy
grid) or scan-to-map (pose, motion model, voxel map) — the frame index, and
the trajectory-so-far are serialized to one .npz; `run --resume` continues a
log mid-stream. This is also the failure-recovery story: restart from the
last checkpoint.
"""

from __future__ import annotations

import numpy as np


def _kind_of(state) -> str:
    from tpu_icp_slam.slam.scan_to_map import MapOdomState

    return "scan_to_map" if isinstance(state, MapOdomState) else "odom"


def save_checkpoint(path: str, state, next_frame: int, poses: list,
                    cfg=None) -> None:
    import jax

    leaves, _ = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    extra = {}
    if cfg is not None:
        from tpu_icp_slam.config import config_hash

        extra["config_hash"] = config_hash(cfg)
    np.savez(
        path,
        kind=_kind_of(state),
        next_frame=next_frame,
        poses=np.stack([np.asarray(p) for p in poses]),
        n_leaves=len(leaves),
        **extra,
        **arrs,
    )


def load_checkpoint(path: str, cfg):
    """Returns (state, next_frame, poses list). The treedef is reconstructed
    from a template state with the same config, so checkpoints are portable
    across processes (no pickled treedefs)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    kind = str(data["kind"]) if "kind" in data else "odom"
    if cfg is not None and "config_hash" in data:
        from tpu_icp_slam.config import config_hash

        if str(data["config_hash"]) != config_hash(cfg):
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint %s was written under a different config "
                "(hash %s != %s) — resuming anyway",
                path, data["config_hash"], config_hash(cfg),
            )

    if kind == "scan_to_map":
        from tpu_icp_slam.mapping.voxel_map import VoxelMap
        from tpu_icp_slam.slam.scan_to_map import MapOdomState

        template = MapOdomState(
            pose=jnp.eye(4),
            T_rel=jnp.eye(4),
            last_kf_pose=jnp.eye(4),
            vmap=VoxelMap(
                points=jnp.zeros((1, 3)),
                normals=jnp.zeros((1, 3)),
                mask=jnp.zeros((1,), bool),
            ),
            frame=jnp.asarray(0),
            n_keyframes=jnp.asarray(0),
        )
    else:
        from tpu_icp_slam.mapping.occupancy2d import OccupancyGrid2D
        from tpu_icp_slam.slam.pipeline import OdomState

        # grid present iff the leaf count says so (grid adds 3 leaves)
        has_grid = n == 8
        dim = leaves[0].shape[0] - 1
        grid = (
            OccupancyGrid2D(
                logodds=jnp.zeros((1, 1)),
                origin=jnp.zeros(2),
                resolution=jnp.ones(()),
            )
            if has_grid
            else None
        )
        template = OdomState(
            pose=jnp.eye(dim + 1),
            T_rel=jnp.eye(dim + 1),
            prev_points=jnp.zeros((1, dim)),
            prev_mask=jnp.zeros((1,), bool),
            grid=grid,
            frame=jnp.asarray(0),
        )
    treedef = jax.tree_util.tree_structure(template)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    poses = [p for p in data["poses"]]
    return state, int(data["next_frame"]), poses
