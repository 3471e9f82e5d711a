"""Flagship-scale fused-kernel compile smoke (r4 VMEM auto-shrink fix).

The r4 fused A/B failed to compile all fused arms at the 16,384x16,384
regime (remote_compile HTTP 500; VMEM accounting in BASELINE.md r4).
This smoke proves the auto-shrunk tiles compile AND recover a known
transform at exactly that regime, for both NN precisions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))

from tpu_icp_slam.obs.compile_cache import enable  # noqa: E402

enable()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_icp_slam.datasets import synthetic  # noqa: E402
from tpu_icp_slam.kernels.icp_fused_pallas import icp_fused_pallas  # noqa: E402
from tpu_icp_slam.mapping.normals import normals_knn  # noqa: E402

rng = np.random.default_rng(0)
src3 = synthetic.surface_cloud(16000, rng)
T_gt = synthetic.rigid_transform(3, rng, rot_scale=0.05, trans_scale=0.3)
dst3 = src3 @ T_gt[:3, :3].T + T_gt[:3, 3]
M = N = 16384
src = np.zeros((M, 3), np.float32)
src[: len(src3)] = src3
smask = np.zeros(M, bool)
smask[: len(src3)] = True
dst = np.full((N, 3), 1e6, np.float32)
dst[: len(dst3)] = dst3
dmask = np.zeros(N, bool)
dmask[: len(dst3)] = True
nrm = np.asarray(normals_knn(jnp.asarray(dst), jnp.asarray(dmask), k=8))
for prec in ("bf16", "highest"):
    t0 = time.time()
    T, rmse, iters, n_inl, conv = icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(smask), jnp.asarray(dst),
        jnp.asarray(nrm), jnp.asarray(dmask), init_T=None, r_gate=1e9,
        max_iters=8, tol=1e-6, tol_update=0.0, max_corr_dist=1.0,
        huber_delta=0.3, damping=1e-3, step_scale=1.0, max_step_trans=1.0,
        max_step_rot=0.3, min_inliers=50, precision=prec,
        tile_m=1024, tile_n=2048)
    err = float(np.abs(np.asarray(T) - T_gt).max())
    print({"prec": prec, "compile_run_s": round(time.time() - t0, 1),
           "err_vs_gt": round(err, 5), "iters": int(iters),
           "conv": bool(conv)}, flush=True)
