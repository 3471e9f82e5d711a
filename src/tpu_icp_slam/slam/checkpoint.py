"""Checkpoint / resume (SURVEY.md §5 "Checkpoint/resume").

The reference had none (crash = restart the app). Here the full pipeline
state pytree (pose, motion model, previous scan, occupancy grid), the frame
index, and the trajectory-so-far are serialized to one .npz; `run --resume`
continues a log mid-stream. This is also the failure-recovery story: restart
from the last checkpoint.
"""

from __future__ import annotations

import numpy as np


def save_checkpoint(path: str, state, next_frame: int, poses: list) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez(
        path,
        next_frame=next_frame,
        poses=np.stack([np.asarray(p) for p in poses]),
        n_leaves=len(leaves),
        **arrs,
    )


def load_checkpoint(path: str, cfg):
    """Returns (state, next_frame, poses list). The treedef is reconstructed
    from a template state with the same config, so checkpoints are portable
    across processes (no pickled treedefs)."""
    import jax
    import jax.numpy as jnp

    from tpu_icp_slam.slam.pipeline import OdomState
    from tpu_icp_slam.mapping.occupancy2d import OccupancyGrid2D

    data = np.load(path, allow_pickle=False)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    # template treedef: grid present iff the leaf count says so (grid adds 3)
    has_grid = n == 8
    dim = leaves[0].shape[0] - 1
    grid = (
        OccupancyGrid2D(
            logodds=jnp.zeros((1, 1)), origin=jnp.zeros(2), resolution=jnp.ones(())
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
