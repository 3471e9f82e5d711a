"""Experiment: full Slam3D (front-end + closures + pose graph) on a compact loop."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))
import numpy as np, numpy.linalg as la
from tpu_icp_slam.config import SlamConfig, ICPConfig, MappingConfig, PipelineConfig, BackendConfig
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.slam.runner import pad_scans
from tpu_icp_slam.slam.slam3d import Slam3D
from tpu_icp_slam.eval import metrics as em

wps = [(-36,-4),(-12,-4),(-4,-4),(-2,2),(-4,13),(-20,13),(-34,12),(-38,4),(-35,-3.6),(-28,-4)]
scans, gt = synthetic.velodyne_log(n_frames=90, n_rings=14, n_azimuth=288, waypoints=wps)
scans=[voxel_downsample_np(s,0.45) for s in scans]
gt_rel = np.einsum('ij,fjk->fik', la.inv(gt[0]), gt)
step = la.norm(np.diff(gt_rel[:,:3,3],axis=0),axis=1)
print('end-start', round(la.norm(gt_rel[-1][:3,3]-gt_rel[0][:3,3]),2),
      'mean step', step.mean().round(2), 'max', step.max().round(2), flush=True)
cfg = SlamConfig(
    icp=ICPConfig(method='point_to_plane', max_iters=25, max_corr_dist=2.5, nn_backend='xla',
                  damping=1e-3, max_step_trans=1.0, max_step_rot=0.3, min_inliers=50,
                  huber_delta=0.5, tol=1e-5, step_scale=1.4, tol_update=0.005),
    mapping=MappingConfig(map_capacity=65536, local_model_size=6144, map_voxel=0.35),
    pipeline=PipelineConfig(mode='scan_to_map', scan_capacity=2048, keyframe_trans=1.5, keyframe_rot=0.12),
    backend=BackendConfig(enabled=True, min_loop_separation=15, verify_max_rmse=0.6, candidate_topk=2, gating_radius=10.0),
)
pts, msk = pad_scans(scans, cfg.pipeline.scan_capacity)
t0=time.time()
slam = Slam3D(cfg)
poses, rep = slam.run(pts, msk, mode='fused')
print('run', round(time.time()-t0,1), 's; kfs', rep.n_keyframes, 'cands', rep.n_loop_candidates,
      'closures', rep.n_loop_closures, flush=True)
if np.isfinite(poses).all():
    err = np.linalg.norm(poses[:,:3,3]-gt_rel[:len(poses),:3,3],axis=1)
    print('ATE', round(em.ate_rmse(poses[:,:3,3], gt_rel[:len(poses),:3,3]),3),
          'final', err[-1].round(2), 'max', err.max().round(2), flush=True)
    print('err@every10', err[::10].round(2), flush=True)
    if rep.chi2: print('chi2', [round(c,3) for c in rep.chi2[:4]], flush=True)
else:
    print('NONFINITE POSES', flush=True)
