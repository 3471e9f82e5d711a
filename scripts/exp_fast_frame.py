"""Frame-time levers from the r3 SOL decomposition, measured with ATE.

The decomposition (scripts/exp_sol_decomp.py, BASELINE.md r3) located the
11.4-12.7 ms KITTI-regime frame in: ICP iterations (~1.18 ms x 3.4),
amortized keyframe work (normals + insert under the cond), per-frame
extract_local top_k (~1.4 ms), and the 0.8 ms scan-step floor. This script
A/Bs the levers that attack each, WITH accuracy reported — a lever that
moves fps but breaks ATE is a regression, not a win:

  base        bench.py kitti config (while_loop ICP, extract every frame)
  hyst        extract_hysteresis=4.0 (reuse local model between keyframes)
  hyst_it3    + max_iters=3 (cap; damped-CV prediction converges in ~3.4)
  hyst_k4     + normal_k=4 (halve the k-NN plane-fit cost at keyframes)
  all         hyst + it3 + k4

Writes one JSON line per variant; summarize into BASELINE.md and flip the
bench/preset defaults only for levers that hold ATE.
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

FRAMES = int(os.environ.get("FF_FRAMES", "30"))
REPEATS = int(os.environ.get("FF_REPEATS", "3"))


def _scans():
    from tpu_icp_slam.core.pointcloud import voxel_downsample_np
    from tpu_icp_slam.datasets import synthetic

    scans, gt = synthetic.velodyne_log(
        n_frames=FRAMES, n_rings=48, n_azimuth=1024,
        path_fraction=min(1.0, FRAMES / 110.0),
    )
    return [voxel_downsample_np(s, 0.15) for s in scans], gt


def _cfg(hyst=0.0, max_iters=20, normal_k=8):
    from tpu_icp_slam.config import (
        ICPConfig, MappingConfig, PipelineConfig, SlamConfig,
    )

    return SlamConfig(
        icp=ICPConfig(
            method="point_to_plane", max_iters=max_iters, max_corr_dist=1.0,
            damping=1e-3, max_step_trans=1.0, max_step_rot=0.3,
            min_inliers=100, huber_delta=0.3, tol=1e-5,
            step_scale=1.4, tol_update=0.01, nn_precision="bf16",
        ),
        mapping=MappingConfig(
            map_capacity=131072, local_model_size=16384, map_voxel=0.2,
            extract_hysteresis=hyst,
        ),
        pipeline=PipelineConfig(
            mode="scan_to_map", scan_capacity=16384,
            keyframe_trans=1.5, keyframe_rot=0.2, normal_k=normal_k,
        ),
    )


def run_variant(name, cfg, scans, gt):
    from tpu_icp_slam.eval import metrics as em
    from tpu_icp_slam.slam.runner import pad_scans
    from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

    pts, msk = pad_scans(scans, cfg.pipeline.scan_capacity)
    pipe = ScanToMapPipeline(cfg)
    st0 = pipe.init_state(pts[0], msk[0])
    t0 = time.perf_counter()
    st, infos = pipe.run_fused(st0, pts[1:], msk[1:])
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
        st, infos = pipe.run_fused(st0, pts[1:], msk[1:])
        realize(infos["pose"])
        best = min(best, time.perf_counter() - t0)
    fps = (len(scans) - 1) / best
    print(json.dumps({
        "variant": name,
        "fps": round(fps, 1),
        "ms_per_frame": round(1e3 * best / (len(scans) - 1), 2),
        "ate_m": round(float(ate), 4),
        "mean_iters": round(float(np.asarray(infos["iters"]).mean()), 2),
        "keyframes": int(np.asarray(infos["is_keyframe"]).sum()),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    scans, gt = _scans()
    from tpu_icp_slam.obs.bench import measurement_stamp
    print(json.dumps(measurement_stamp()), flush=True)
    print(json.dumps({"platform": jax.default_backend(), "frames": FRAMES}),
          flush=True)
    variants = {
        "base": _cfg(),
        "hyst": _cfg(hyst=4.0),
        "hyst_it3": _cfg(hyst=4.0, max_iters=3),
        "hyst_k4": _cfg(hyst=4.0, normal_k=4),
        "all": _cfg(hyst=4.0, max_iters=3, normal_k=4),
    }
    for name, cfg in variants.items():
        run_variant(name, cfg, scans, gt)
