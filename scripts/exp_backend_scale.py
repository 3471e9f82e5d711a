"""Backend cost at 500+ keyframes (VERDICT r1 item 6 'done' condition).

Measures the per-keyframe loop-closure backend cost — descriptor insert +
candidate search over the whole store + batched ICP verification — as the
keyframe database grows to KITTI-00-length scale (hundreds of keyframes).
Round 1 orchestrated this host-side per candidate; round 2 keeps descriptors
on device and verifies all candidates of a keyframe in one nested-vmap
dispatch (backend/loop_closure.py), so the cost should stay ~flat in DB size
(the candidate einsum over the fixed-capacity store is O(cap) with a tiny
constant).

Usage: PYTHONPATH=src python scripts/exp_backend_scale.py [n_keyframes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np

import json as _json_stamp
from tpu_icp_slam.obs.bench import measurement_stamp as _mstamp
print(_json_stamp.dumps(_mstamp()), flush=True)

from tpu_icp_slam.obs.compile_cache import enable

enable()

from tpu_icp_slam.config import BackendConfig
from tpu_icp_slam.backend.loop_closure import LoopDetector
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.slam.runner import pad_scans

N_KF = int(sys.argv[1]) if len(sys.argv) > 1 else 520
CAP = 1024

# a pool of distinct scans reused around a long loop route: structure-rich,
# with genuine revisits every len(pool) keyframes
scans, gt = synthetic.velodyne_log(n_frames=60, n_rings=16, n_azimuth=512,
                                   loop=True, seed=0)
scans = [voxel_downsample_np(s, 0.4) for s in scans]
pts, msk = pad_scans(scans, CAP)
pool = len(scans)

cfg = BackendConfig(
    enabled=True, min_loop_separation=20, candidate_topk=4,
    gating_radius=25.0, verify_max_rmse=0.5, verify_max_dev=5.0,
    max_keyframes=max(512, N_KF),
)
det = LoopDetector(cfg)

rng = np.random.default_rng(0)
times = []
n_closures = 0
n_cands = 0
t_wall0 = time.perf_counter()
for k in range(N_KF):
    f = k % pool
    # positions walk the loop route (scaled so revisits pass the gate)
    position = gt[f][:3, 3] + 0.1 * rng.standard_normal(3)
    t0 = time.perf_counter()
    qi = det.add_keyframe(pts[f], msk[f], position=position)
    cands = det.candidates(qi)
    if cands:
        n_cands += len(cands)
        mp = np.stack([pts[c.match_idx % pool] for c in cands])
        mm = np.stack([msk[c.match_idx % pool] for c in cands])
        lcs = det.verify_batch(cands, pts[f], msk[f], mp, mm)
        n_closures += sum(lc is not None for lc in lcs)
    times.append(time.perf_counter() - t0)
    if (k + 1) in (100, 250, N_KF) or (k + 1) % 250 == 0:
        arr = np.asarray(times[max(0, k - 49):])  # trailing 50-kf window
        print(
            f"kf={k+1:4d}  backend ms/kf (trailing50): "
            f"mean={arr.mean()*1e3:7.1f}  p50={np.median(arr)*1e3:7.1f}  "
            f"max={arr.max()*1e3:7.1f}  cands={n_cands}  closures={n_closures}",
            flush=True,
        )

total = time.perf_counter() - t_wall0
arr = np.asarray(times)
# steady-state = after compile warmup (first few keyframes pay jit)
steady = arr[20:]
print(
    f"\nTOTAL {N_KF} keyframes in {total:.1f}s — steady-state "
    f"{steady.mean()*1e3:.1f} ms/kf (p50 {np.median(steady)*1e3:.1f}, "
    f"p95 {np.percentile(steady, 95)*1e3:.1f}); "
    f"{n_cands} candidates, {n_closures} closures"
)
