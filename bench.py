"""Headline benchmark: frames/s/chip of the flagship SLAM pipeline.

Runs the fused (single-dispatch `lax.scan`) 3D scan-to-scan odometry on a
synthetic Velodyne-style log — the stand-in for KITTI seq 00 until real data
is mounted (SURVEY.md §7 "No real datasets") — and compares against the golden
fp64 CPU ICP (scipy cKDTree), which plays the reference pipeline's role
(SURVEY.md §0.4). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
vs_baseline = TPU frames/s ÷ golden-CPU frames/s on the identical workload.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

import numpy as np  # noqa: E402

FRAMES = int(os.environ.get("BENCH_FRAMES", "40"))
CAPACITY = int(os.environ.get("BENCH_CAPACITY", "4096"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
CPU_FRAMES = int(os.environ.get("BENCH_CPU_FRAMES", "6"))


def _load_scans():
    from tpu_icp_slam.core.pointcloud import voxel_downsample_np
    from tpu_icp_slam.datasets import synthetic

    scans, _ = synthetic.velodyne_log(n_frames=FRAMES, n_rings=16, n_azimuth=512)
    return [voxel_downsample_np(s, 0.3) for s in scans]


def bench_tpu(scans) -> float:
    import jax

    from tpu_icp_slam.config import SlamConfig
    from tpu_icp_slam.slam.pipeline import OdometryPipeline
    from tpu_icp_slam.slam.runner import pad_scans

    cfg = SlamConfig()
    pts, msk = pad_scans(scans, CAPACITY)
    pipe = OdometryPipeline(cfg, dim=3)
    state0 = pipe.init_state(pts[0], msk[0])
    # warmup: compile + one full pass
    st, infos = pipe.run_fused(state0, pts[1:], msk[1:])
    jax.block_until_ready(infos["pose"])
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        st, infos = pipe.run_fused(state0, pts[1:], msk[1:])
        jax.block_until_ready(infos["pose"])
        best = min(best, time.perf_counter() - t0)
    return (len(scans) - 1) / best


def bench_cpu_golden(scans) -> float:
    from tpu_icp_slam.eval import golden

    sub = scans[: CPU_FRAMES + 1]
    t0 = time.perf_counter()
    golden.odometry(sub, max_iters=30)
    dt = time.perf_counter() - t0
    return len(sub) / dt


def main() -> int:
    scans = _load_scans()
    fps = bench_tpu(scans)
    cpu_fps = bench_cpu_golden(scans)
    import jax

    print(
        json.dumps(
            {
                "metric": "odometry_frames_per_s_per_chip_sim3d",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / cpu_fps, 3),
                "baseline": "golden fp64 CPU ICP (scipy cKDTree), same scans",
                "baseline_fps": round(cpu_fps, 3),
                "frames": FRAMES,
                "points_per_scan": CAPACITY,
                "platform": jax.default_backend(),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
