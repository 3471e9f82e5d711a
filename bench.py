"""Headline benchmark: frames/s/chip of the flagship KITTI-config pipeline.

Runs the fused (single-dispatch `lax.scan`) 3D scan-to-map odometry —
point-to-plane ICP against the voxel map with keyframe inserts, the
BASELINE.json config-4 regime — on a synthetic Velodyne-style log (stand-in
for KITTI seq 00 until real data is mounted, SURVEY.md §7). The baseline is
the golden fp64 CPU ICP (scipy cKDTree), playing the reference pipeline's
role (SURVEY.md §0.4). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
vs_baseline = TPU frames/s ÷ golden-CPU frames/s on the same scans.
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
MODE = os.environ.get("BENCH_MODE", "scan_to_map")  # scan_to_map | scan_to_scan
TRACE_DIR = os.environ.get("BENCH_TRACE_DIR", "")  # capture a profiler trace


def _load_scans():
    from tpu_icp_slam.core.pointcloud import voxel_downsample_np
    from tpu_icp_slam.datasets import synthetic

    scans, _ = synthetic.velodyne_log(n_frames=FRAMES, n_rings=16, n_azimuth=512)
    return [voxel_downsample_np(s, 0.3) for s in scans]


def _cfg():
    from tpu_icp_slam.config import (
        ICPConfig, MappingConfig, PipelineConfig, SlamConfig,
    )

    return SlamConfig(
        icp=ICPConfig(
            method="point_to_plane", max_iters=20, max_corr_dist=1.5,
            damping=1e-3, max_step_trans=1.0, max_step_rot=0.3,
            min_inliers=50, huber_delta=0.3, tol=1e-5,
            step_scale=1.4, tol_update=0.01,  # over-relaxed ICP: ~2.2x fewer
            # iterations at equal ATE (BASELINE.md)
        ),
        mapping=MappingConfig(
            map_capacity=65536, local_model_size=8192, map_voxel=0.3
        ),
        pipeline=PipelineConfig(
            mode="scan_to_map", scan_capacity=CAPACITY,
            keyframe_trans=2.0, keyframe_rot=0.2,
        ),
    )


def bench_tpu(scans) -> tuple[float, float]:
    """Returns (frames/s steady, compile_s)."""
    import jax

    from tpu_icp_slam.slam.runner import pad_scans

    cfg = _cfg()
    pts, msk = pad_scans(scans, CAPACITY)
    if MODE == "scan_to_map":
        from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

        pipe = ScanToMapPipeline(cfg)
    else:
        from tpu_icp_slam.slam.pipeline import OdometryPipeline

        pipe = OdometryPipeline(cfg, dim=3)
    state0 = pipe.init_state(pts[0], msk[0])
    t0 = time.perf_counter()
    st, infos = pipe.run_fused(state0, pts[1:], msk[1:])
    jax.block_until_ready(infos["pose"])
    compile_s = time.perf_counter() - t0
    best = np.inf
    import contextlib

    from tpu_icp_slam.obs import profile as prof

    tracer = prof.trace(TRACE_DIR) if TRACE_DIR else contextlib.nullcontext()
    with tracer:
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            st, infos = pipe.run_fused(state0, pts[1:], msk[1:])
            jax.block_until_ready(infos["pose"])
            best = min(best, time.perf_counter() - t0)
    return (len(scans) - 1) / best, compile_s


def bench_cpu_golden(scans) -> float:
    from tpu_icp_slam.eval import golden

    sub = scans[: CPU_FRAMES + 1]
    t0 = time.perf_counter()
    golden.odometry(sub, max_iters=30)
    dt = time.perf_counter() - t0
    return len(sub) / dt


def main() -> int:
    from tpu_icp_slam.obs.compile_cache import enable as _enable_cache

    _enable_cache()
    scans = _load_scans()
    fps, compile_s = bench_tpu(scans)
    cpu_fps = bench_cpu_golden(scans)
    import jax

    report = {
        "metric": f"{MODE}_frames_per_s_per_chip_sim3d",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / cpu_fps, 3),
        "baseline": "golden fp64 CPU ICP (scipy cKDTree), same scans",
        "baseline_fps": round(cpu_fps, 3),
        "frames": FRAMES,
        "points_per_scan": CAPACITY,
        "compile_s": round(compile_s, 1),
        "platform": jax.default_backend(),
    }
    # perf-regression band (SURVEY.md §4b): bench_band.json holds the last
    # accepted range; flag (don't fail) when outside — the shared tunnel
    # hardware has ±30% run-to-run variance, so a band, not a point
    band_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_band.json")
    if os.path.exists(band_file):
        try:
            with open(band_file) as fh:
                band = json.load(fh).get(report["metric"])
            if band:
                report["band"] = band
                report["within_band"] = bool(band[0] <= fps <= band[1])
        except Exception:
            pass
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
