"""A/B: NN precision (HIGHEST vs bf16) and iteration budget, end-to-end.

KITTI-regime fused scan-to-map, honestly fenced (obs.realize). Reports
frames/s AND accuracy (ATE vs ground truth) per variant — the r2 decision
record for flipping the default NN precision (VERDICT r1 item 3).

Usage: PYTHONPATH=src python scripts/exp_precision_ab.py
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np

from tpu_icp_slam.obs.compile_cache import enable

enable()

import jax.numpy as jnp  # noqa: F401

import json as _json_stamp
from tpu_icp_slam.obs.bench import measurement_stamp as _mstamp
print(_json_stamp.dumps(_mstamp()), flush=True)

from tpu_icp_slam.config import SlamConfig, ICPConfig, MappingConfig, PipelineConfig
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.eval import metrics as em
from tpu_icp_slam.obs import realize
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

N_FRAMES = int(os.environ.get("AB_FRAMES", "30"))
# ~1.1 m/frame (real KITTI speed); the full-route default is 4x too fast
scans, gt = synthetic.velodyne_log(
    n_frames=N_FRAMES, n_rings=48, n_azimuth=1024,
    path_fraction=min(1.0, N_FRAMES / 110.0),
)
scans = [voxel_downsample_np(s, 0.15) for s in scans]
gt_rel = np.einsum("ij,fjk->fik", np.linalg.inv(gt[0]), gt)

base = SlamConfig(
    icp=ICPConfig(method="point_to_plane", max_iters=20, max_corr_dist=1.0,
                  damping=1e-3, max_step_trans=1.0, max_step_rot=0.3,
                  min_inliers=100, huber_delta=0.3, tol=1e-5,
                  step_scale=1.4, tol_update=0.01),
    mapping=MappingConfig(map_capacity=131072, local_model_size=16384,
                          map_voxel=0.2),
    pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=16384,
                            keyframe_trans=1.5, keyframe_rot=0.2),
)

VARIANTS = [
    ("highest_it20", {}),
    ("bf16_it20", {"nn_precision": "bf16"}),
    ("bf16_it10", {"nn_precision": "bf16", "max_iters": 10}),
    ("bf16_it8", {"nn_precision": "bf16", "max_iters": 8}),
    ("highest_it10", {"max_iters": 10}),
]

pts, msk = pad_scans(scans, base.pipeline.scan_capacity)
for tag, icp_over in VARIANTS:
    cfg = dataclasses.replace(base, icp=dataclasses.replace(base.icp, **icp_over))
    pipe = ScanToMapPipeline(cfg)
    st0 = pipe.init_state(pts[0], msk[0])
    t0 = time.perf_counter()
    st, infos = pipe.run_fused(st0, pts[1:], msk[1:])
    realize(infos["pose"])
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        st, infos = pipe.run_fused(st0, pts[1:], msk[1:])
        poses_dev = realize(infos["pose"])
        best = min(best, time.perf_counter() - t0)
    poses = np.concatenate([np.eye(4)[None], np.asarray(poses_dev, np.float64)])
    ate = em.ate_rmse(poses[:, :3, 3], gt_rel[: len(poses), :3, 3])
    iters = float(np.asarray(infos["iters"]).mean())
    fps = (len(scans) - 1) / best
    print(
        f"{tag:14s} fps={fps:7.2f}  ms/frame={best/(len(scans)-1)*1e3:6.1f}  "
        f"ate={ate:.4f} m  mean_iters={iters:5.2f}  compile={compile_s:.0f}s",
        flush=True,
    )
