"""Persistent map save/load + localize-in-saved-map (mapping -> localization)."""

import numpy as np
import jax.numpy as jnp

from tpu_icp_slam.config import BackendConfig
from tpu_icp_slam.core.pointcloud import voxel_downsample_np
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.mapping import voxel_map
from tpu_icp_slam.slam import map_io


def _pad(s, cap):
    pts = np.full((cap, 3), 1.0e6, np.float32)
    msk = np.zeros(cap, bool)
    pts[: len(s)] = s[:cap]
    msk[: min(len(s), cap)] = True
    return pts, msk


def test_save_load_localize(tmp_path):
    scans, gt = synthetic.velodyne_log(
        n_frames=16, n_rings=12, n_azimuth=256, path_fraction=0.4
    )
    cap = 1536
    cfg = BackendConfig(verify_max_rmse=0.6, verify_max_dev=0.0)

    # mapping session: keyframes at GT poses (front-end covered elsewhere)
    det = map_io.LoopDetector(cfg)
    kf_scans, kf_poses = [], []
    vm = voxel_map.create(16384)
    for i in range(0, 16, 2):
        pts, msk = _pad(voxel_downsample_np(scans[i], 0.5), cap)
        det.add_keyframe(pts, msk, position=gt[i][:3, 3])
        kf_scans.append((pts, msk))
        kf_poses.append(gt[i])
        world = pts @ gt[i][:3, :3].T + gt[i][:3, 3]
        world = np.where(msk[:, None], world, 1.0e6).astype(np.float32)
        vm = voxel_map.insert(
            vm, jnp.asarray(world), jnp.asarray(msk),
            jnp.zeros((cap, 3), jnp.float32), voxel=0.4,
        )

    path = str(tmp_path / "site.npz")
    map_io.save_map(path, kf_scans, np.stack(kf_poses), vmap=vm, detector=det)

    # localization session: fresh process state, load + place a novel scan
    saved = map_io.load_map(path, cfg)
    assert saved.vmap is not None
    assert int(voxel_map.count(saved.vmap)) == int(voxel_map.count(vm))
    q, qm = _pad(voxel_downsample_np(scans[5], 0.5), cap)  # non-keyframe
    out = map_io.localize_in_map(saved, q, qm)
    assert out is not None, "localization failed in the loaded map"
    pose, match_idx, rmse = out
    t_err = np.linalg.norm(pose[:3, 3] - gt[5][:3, 3])
    assert t_err < 1.0, t_err


def test_closure_metadata_roundtrip(tmp_path):
    """Suspect-closure metadata must survive save/load so a localize
    consumer can tell a clean map from one past the aliasing wall."""
    scans, gt = synthetic.velodyne_log(
        n_frames=6, n_rings=8, n_azimuth=128, path_fraction=0.2
    )
    cap = 512
    cfg = BackendConfig()
    det = map_io.LoopDetector(cfg)
    kf_scans, kf_poses = [], []
    for i in range(0, 6, 2):
        pts, msk = _pad(voxel_downsample_np(scans[i], 0.5), cap)
        det.add_keyframe(pts, msk, position=gt[i][:3, 3])
        kf_scans.append((pts, msk))
        kf_poses.append(gt[i])
    info = [
        {"i": 0, "j": 2, "cycle_score_m": 0.04, "suspect": False},
        {"i": 1, "j": 2, "cycle_score_m": 9.3, "suspect": True},
        {"i": 0, "j": 1, "cycle_score_m": None, "suspect": False},
    ]
    path = str(tmp_path / "meta.npz")
    map_io.save_map(path, kf_scans, np.stack(kf_poses), detector=det,
                    closure_info=info)
    saved = map_io.load_map(path, cfg)
    assert saved.closure_info == info
    assert saved.n_suspect_closures == 1


def test_descriptor_geometry_persists(tmp_path):
    """A map built with non-default descriptor geometry must localize with
    the STORED geometry, not the caller's (ADVICE r2 medium: 2D maps built at
    sensor_max_range=12 were queried with the load_map default of 60 — 5x
    coarser ring binning, silently degraded candidate ranking)."""
    scans, gt = synthetic.velodyne_log(
        n_frames=8, n_rings=12, n_azimuth=256, path_fraction=0.3
    )
    cap = 1536
    cfg = BackendConfig(descriptor_rings=16, descriptor_sectors=48,
                        verify_max_rmse=0.6, verify_max_dev=0.0)
    det = map_io.LoopDetector(cfg, max_range=25.0)
    kf_scans, kf_poses = [], []
    for i in range(0, 8, 2):
        pts, msk = _pad(voxel_downsample_np(scans[i], 0.5), cap)
        det.add_keyframe(pts, msk, position=gt[i][:3, 3])
        kf_scans.append((pts, msk))
        kf_poses.append(gt[i])
    path = str(tmp_path / "geo.npz")
    map_io.save_map(path, kf_scans, np.stack(kf_poses), detector=det)

    # load with a MISMATCHED cfg/max_range: stored geometry must win
    wrong_cfg = BackendConfig()  # 20 rings x 60 sectors
    saved = map_io.load_map(path, wrong_cfg, max_range=60.0)
    assert saved.detector.cfg.descriptor_rings == 16
    assert saved.detector.cfg.descriptor_sectors == 48
    assert saved.detector.max_range == 25.0
    # stored descriptors and a rebuilt-from-scratch query must be congruent:
    # descriptor shapes agree and localization still verifies
    assert saved.detector._descs[0].shape == (16, 48)
    q, qm = _pad(voxel_downsample_np(scans[1], 0.5), cap)
    out = map_io.localize_in_map(saved, q, qm)
    assert out is not None
    pose, _, _ = out
    assert np.linalg.norm(pose[:3, 3] - gt[1][:3, 3]) < 1.0
