"""Distributed layer: mesh construction + sharded ICP/backend collectives (N15)."""

from tpu_icp_slam.dist.failure import WorkerFailure, with_timeout
from tpu_icp_slam.dist.mesh import make_mesh, multihost_init
from tpu_icp_slam.dist.multi_seq import make_multi_sequence_runner
from tpu_icp_slam.dist.sharded_icp import ShardedAligner, make_sharded_align

__all__ = [
    "make_mesh",
    "multihost_init",
    "ShardedAligner",
    "make_sharded_align",
    "make_multi_sequence_runner",
    "WorkerFailure",
    "with_timeout",
]
