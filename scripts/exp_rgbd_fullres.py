"""Full-resolution RGB-D odometry (BASELINE.json config 3 at TUM fr1's real
640x480; VERDICT r2 item 6 — the 120x160 ladder row was a 1/16-scale
stand-in).

Measures the fused projective point-to-plane pipeline at:
  - 640x480, source stride 1 (307,200-px organized cloud)
  - 640x480, source stride 2 (76,800 source points >= the 64k bound;
    target maps stay full-res)
  - 160x120 ladder row for continuity

Each row: fps (obs.realize-fenced), ms/frame, ATE vs the synthetic GT sweep.
Summarize into BASELINE.md's config ladder.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np  # noqa: E402

from tpu_icp_slam.obs.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402

from tpu_icp_slam.obs import realize  # noqa: E402

FRAMES = int(os.environ.get("RGBD_FRAMES", "20"))
REPEATS = int(os.environ.get("RGBD_REPEATS", "3"))


def run_variant(name, width, height, stride):
    from tpu_icp_slam.config import ICPConfig, PipelineConfig, SlamConfig
    from tpu_icp_slam.datasets import synthetic
    from tpu_icp_slam.eval import metrics as em
    from tpu_icp_slam.icp.projective import CameraIntrinsics
    from tpu_icp_slam.slam.rgbd import RGBDOdometry

    K = synthetic.Intrinsics.tum_default(width, height)
    depths, gt, _ = synthetic.rgbd_log(n_frames=FRAMES, K=K, seed=0)
    cfg = SlamConfig(
        icp=ICPConfig(
            method="point_to_plane", max_iters=20, max_corr_dist=0.3,
            normal_gate_cos=0.5, tol=1e-6,
        ),
        pipeline=PipelineConfig(rgbd_src_stride=stride),
    )
    pipe = RGBDOdometry(
        cfg,
        CameraIntrinsics(fx=K.fx, fy=K.fy, cx=K.cx, cy=K.cy,
                         width=K.width, height=K.height),
    )
    state = pipe.init_state(depths[0])
    t0 = time.perf_counter()
    st, infos = pipe.run_fused(state, depths[1:])
    realize(infos["pose"])
    compile_s = time.perf_counter() - t0
    poses = np.concatenate(
        [np.eye(4)[None], np.asarray(infos["pose"], np.float64)]
    )
    gt_rel = np.einsum("ij,fjk->fik", np.linalg.inv(gt[0]), gt)
    ate = em.ate_rmse(poses[:, :3, 3], gt_rel[: len(poses), :3, 3])
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        st, infos = pipe.run_fused(state, depths[1:])
        realize(infos["pose"])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "variant": name,
        "resolution": f"{width}x{height}",
        "src_points": (height // stride) * (width // stride),
        "fps": round((FRAMES - 1) / best, 1),
        "ms_per_frame": round(1e3 * best / (FRAMES - 1), 2),
        "ate_m": round(float(ate), 4),
        "mean_iters": round(float(np.asarray(infos["iters"]).mean()), 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    from tpu_icp_slam.obs.bench import measurement_stamp
    print(json.dumps(measurement_stamp()), flush=True)
    print(json.dumps({"platform": jax.default_backend(), "frames": FRAMES}),
          flush=True)
    run_variant("fullres_stride1", 640, 480, 1)
    run_variant("fullres_stride2", 640, 480, 2)
    run_variant("ladder_160x120", 160, 120, 1)
