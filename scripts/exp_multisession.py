"""Multi-session joint mapping (config-5 flavor): N sequences through the
same world, each SLAM'd independently in its own frame, glued by
cross-session relocalization factors, jointly optimized with the
distributed Schur pose-graph solver over a device mesh.

CPU-mesh runnable (8 virtual devices); the same code paths scale to a pod.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

FORCE_CPU = os.environ.get("MS_CPU", "1") == "1"
if FORCE_CPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax

if FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import numpy.linalg as la

from tpu_icp_slam.backend import pose_graph as pg
from tpu_icp_slam.backend import schur
from tpu_icp_slam.backend.loop_closure import LoopDetector
from tpu_icp_slam.config import (
    BackendConfig, ICPConfig, MappingConfig, PipelineConfig, SlamConfig,
)
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.dist import make_mesh
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.scan_to_map import ScanToMapPipeline

# three overlapping passes through the lower corridor: W->E, E->W (opposite
# heading), and a center-lane pass — every pair shares territory, so the
# relocalization glue and the joint BA get exercised on real revisits
ROUTES = [
    [(-36, -4), (-12, -4), (4, -4), (20, -4)],   # W->E, south lane
    [(24, -4), (8, -4), (-6, -4), (-20, -4)],    # E->W, south lane (reversed)
    [(-28, -2), (-8, -2), (8, -2), (24, -2)],    # W->E, center lane
]
F = 30
CAP = 1536
SEED = int(os.environ.get("MS_SEED", "0"))  # sensor-noise draw; the r3
# seed sweep (scripts/exp_multisession_sweep.sh style loop, BASELINE.md 5b)
# reports median/max over 5 seeds — single-draw numbers were seed-lottery
# (r1 0.30 m vs r2 1.28 m on different draws, VERDICT r2 weak 6)

cfg = SlamConfig(
    icp=ICPConfig(method="point_to_plane", max_iters=20, max_corr_dist=2.0,
                  nn_backend="xla", damping=1e-3, max_step_trans=1.0,
                  max_step_rot=0.3, min_inliers=50, huber_delta=0.4,
                  tol=1e-5, step_scale=1.4, tol_update=0.005),
    mapping=MappingConfig(map_capacity=32768, local_model_size=4096,
                          map_voxel=0.35),
    pipeline=PipelineConfig(mode="scan_to_map", scan_capacity=CAP,
                            keyframe_trans=2.0, keyframe_rot=0.2),
    backend=BackendConfig(verify_max_rmse=0.6, verify_max_dev=0.0,
                          descriptor_rings=16, descriptor_sectors=48),
)

# ---- per-session SLAM in each session's own frame --------------------------
sessions = []
t0 = time.time()
for si, wps in enumerate(ROUTES):
    scans, gt = synthetic.velodyne_log(
        n_frames=F, n_rings=14, n_azimuth=288, waypoints=wps, seed=SEED
    )
    scans = [voxel_downsample_np(s, 0.45) for s in scans]
    pts, msk = pad_scans(scans, CAP)
    pipe = ScanToMapPipeline(cfg)
    st = pipe.init_state(pts[0], msk[0])
    st, infos = pipe.run_fused(st, pts[1:], msk[1:])
    poses_local = np.concatenate(
        [np.eye(4)[None], np.asarray(infos["pose"], np.float64)]
    )
    kf_flags = np.concatenate([[True], np.asarray(infos["is_keyframe"])])
    kf_ids = [f for f in range(F) if kf_flags[f]]
    sessions.append(dict(
        pts=pts, msk=msk, gt=gt, poses=poses_local, kf_ids=kf_ids,
    ))
    print(f"session {si}: {len(kf_ids)} keyframes, "
          f"local drift {la.norm(poses_local[-1][:3,3] - (la.inv(gt[0])@gt[-1])[:3,3]):.2f} m",
          flush=True)
print("front-ends", round(time.time() - t0, 1), "s", flush=True)

# ---- cross-session gluing: relocalize session k keyframes in session 0+ ----
# global keyframe index: (session, kf) -> node id; session 0 defines the frame
nodes = []  # (session, frame)
node_of = {}
for si, S in enumerate(sessions):
    for f in S["kf_ids"]:
        node_of[(si, f)] = len(nodes)
        nodes.append((si, f))

det0 = LoopDetector(cfg.backend)  # database over ALL earlier sessions
db_scans, db_poses, db_node = [], [], []
factors = []
init_poses = [None] * len(nodes)
T_world = [None] * len(ROUTES)  # session frame -> world (session-0) frame
T_world[0] = np.eye(4)

t0 = time.time()
n_glue = 0
for si, S in enumerate(sessions):
    glue = []
    if si > 0:
        # relocalize every other keyframe in the existing database
        for f in S["kf_ids"][::2]:
            qp, qm = S["pts"][f], S["msk"][f]
            out = det0.relocalize(qp, qm, db_scans, db_poses, topk=2)
            if out is not None:
                pose_w, db_idx, rmse = out
                glue.append((f, pose_w, db_idx, rmse))
        if not glue:
            print(f"session {si}: NO cross-session matches — dropped", flush=True)
            continue
        # consensus clustering on the implied session->world transforms:
        # corridor worlds alias heavily and a single bad relocalization
        # would hijack the whole session — keep the largest agreeing set
        T_cands = [g[1] @ la.inv(S["poses"][g[0]]) for g in glue]
        best_inliers = []
        for Tc in T_cands:
            inl = [k for k, Tk in enumerate(T_cands)
                   if la.norm(Tk[:3, 3] - Tc[:3, 3]) < 2.5]
            if len(inl) > len(best_inliers):
                best_inliers = inl
        glue = [glue[k] for k in best_inliers]
        if len(glue) < 2:
            print(f"session {si}: no consensus glue — dropped", flush=True)
            continue
        f0, pose_w, _, _ = min(glue, key=lambda g: g[3])
        T_world[si] = pose_w @ la.inv(S["poses"][f0])
        n_glue += len(glue)
    # initialize this session's nodes in the world frame; odometry factors
    prev = None
    for f in S["kf_ids"]:
        nid = node_of[(si, f)]
        init_poses[nid] = T_world[si] @ S["poses"][f]
        if prev is not None:
            rel = la.inv(S["poses"][prev]) @ S["poses"][f]
            factors.append((node_of[(si, prev)], nid, rel, 1.0))
        prev = f
    # cross-session factors: glue measurement vs the database node
    if si > 0:
        for f, pose_w, db_idx, rmse in glue:
            i_node = db_node[db_idx]
            # measured relative pose: X_i⁻¹ X_j from the verified alignment
            rel = la.inv(init_poses[i_node]) @ pose_w
            factors.append((i_node, node_of[(si, f)], rel, 2.0))
    # add this session's keyframes to the database (world-frame poses)
    for f in S["kf_ids"]:
        det0.add_keyframe(S["pts"][f], S["msk"][f])
        db_scans.append((S["pts"][f], S["msk"][f]))
        db_poses.append(init_poses[node_of[(si, f)]])
        db_node.append(node_of[(si, f)])
print(f"gluing: {n_glue} cross-session matches, {round(time.time()-t0,1)} s",
      flush=True)

# ---- joint BA with the distributed Schur solver ----------------------------
import jax.numpy as jnp

keep = [i for i, p in enumerate(init_poses) if p is not None]
remap = {old: new for new, old in enumerate(keep)}
poses_in = np.stack([init_poses[i] for i in keep])
factors_in = [
    (remap[i], remap[j], T, w) for (i, j, T, w) in factors
    if i in remap and j in remap
]
graph = pg.from_arrays(poses_in, factors_in, dtype=jnp.float64)
mesh = make_mesh(min(4, len(jax.devices())), axes=("graph",))
t0 = time.time()
g_opt, chis = schur.optimize_distributed(
    graph, mesh, iters=8, damping=1e-6, huber_delta=1.0
)
print(f"joint BA over {mesh.shape['graph']} devices: chi2 "
      f"{chis[0]:.3f} -> {chis[-1]:.3f}, {round(time.time()-t0,1)} s", flush=True)

# ---- evaluate: keyframe positions vs GT in the common (session-0) frame ----
opt = np.asarray(g_opt.poses)
errs = []
for old in keep:
    si, f = nodes[old]
    gt = sessions[si]["gt"]
    gt_world = la.inv(sessions[0]["gt"][0]) @ gt[f]  # all sessions share the world
    errs.append(la.norm(opt[remap[old]][:3, 3] - gt_world[:3, 3]))
errs = np.asarray(errs)
sess_of = np.asarray([nodes[old][0] for old in keep])
per = {int(si): float(errs[sess_of == si].mean())
       for si in sorted(set(sess_of.tolist()))}
print(f"multi-session map: {len(keep)} keyframes, position err "
      f"mean {errs.mean():.3f} m, max {errs.max():.3f} m, per-session {per}",
      flush=True)
import json

print(json.dumps({
    "seed": SEED, "keyframes": len(keep), "n_glue": n_glue,
    "err_mean_m": round(float(errs.mean()), 3),
    "err_median_m": round(float(np.median(errs)), 3),
    "err_max_m": round(float(errs.max()), 3),
    "chi2_first": round(float(chis[0]), 2),
    "chi2_last": round(float(chis[-1]), 2),
}), flush=True)
