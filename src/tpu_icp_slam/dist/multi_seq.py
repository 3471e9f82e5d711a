"""Data-parallel multi-sequence SLAM (BASELINE.json config 5: "KITTI 00–10").

Each device (host) owns whole sequences: the padded logs shard over the
"dp" mesh axis with `shard_map`, every device runs the SAME fused
scan-to-map pipeline (one `lax.scan` per sequence, `lax.map` over its local
sequences), and the only cross-device traffic is the final trajectory
gather. This is the embarrassingly-parallel outer level of the config-5
ladder; the inner levels (point-sharded ICP, Schur-reduced pose graph) live
in dist/sharded_icp.py and backend/schur.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_icp_slam.config import SlamConfig
from tpu_icp_slam.slam.scan_to_map import _fused_run, init_state as _init_state


def make_multi_sequence_runner(mesh: jax.sharding.Mesh, cfg: SlamConfig,
                               axis: str = "dp"):
    """Compile fn(pts (S,F,C,3), msk (S,F,C)) -> poses (S,F,4,4).

    S must be divisible by mesh[axis]. Every sequence runs the full fused
    scan-to-map pipeline on its owning device.
    """

    def one_seq(args):
        pts, msk = args  # (F, C, 3), (F, C)
        state = _init_state(pts[0], msk[0], cfg)
        _, infos = _fused_run(state, pts[1:], msk[1:], cfg=cfg)
        first = jnp.eye(4, dtype=infos["pose"].dtype)[None]
        return jnp.concatenate([first, infos["pose"]], axis=0)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def run(pts, msk):
        return jax.lax.map(one_seq, (pts, msk))

    return jax.jit(run)
