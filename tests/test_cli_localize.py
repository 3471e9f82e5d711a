"""CLI persistent-map flow: `run --save-map` then `localize` (r2).

Exercises the full surface a reference user would touch for the
kidnapped-robot story: build a map through the config-4 path, export it,
then globally relocalize a scan from the same world in a fresh process
state (no odometry prior).
"""

import json

import numpy as np

from tpu_icp_slam import cli


def test_run_save_map_then_localize(tmp_path, capsys):
    out = tmp_path / "run_out"
    map_file = tmp_path / "map.npz"
    rc = cli.main([
        "run", "--dataset", "sim3d", "--frames", "14",
        "--out", str(out), "--save-map", str(map_file),
        "pipeline.mode=scan_to_map", "pipeline.scan_capacity=512",
        "pipeline.downsample_voxel=0.5", "pipeline.keyframe_trans=1.0",
        "mapping.map_capacity=4096", "mapping.local_model_size=1024",
        "mapping.map_voxel=0.5",
        "icp.method=point_to_point", "icp.max_iters=8",
        "icp.max_corr_dist=2.0", "icp.nn_backend=xla",
        "backend.enabled=true", "backend.min_loop_separation=4",
    ])
    capsys.readouterr()
    assert rc == 0
    assert map_file.exists()

    rc = cli.main([
        "localize", "--map", str(map_file), "--dataset", "sim3d",
        "--frame", "6", "--frames", "14",
        "pipeline.downsample_voxel=0.5",
    ])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0 and rep["localized"], rep
    # sim3d frame 6 sits on the mapped route: the recovered world pose must
    # land near the ground-truth position (generous bound — coarse map)
    assert rep["error_vs_gt_m"] < 3.0, rep


def test_run_save_map_then_localize_2d(tmp_path, capsys):
    """Same persistent-map flow on the 2D family (SE(2) poses in the map)."""
    out = tmp_path / "run2d"
    map_file = tmp_path / "map2d.npz"
    rc = cli.main([
        "run", "--dataset", "sim2d", "--frames", "30",
        "--out", str(out), "--save-map", str(map_file),
        "pipeline.scan_capacity=256", "pipeline.keyframe_trans=0.8",
        "icp.max_iters=20", "icp.max_corr_dist=1.0", "icp.nn_backend=xla",
        "backend.enabled=true", "backend.min_loop_separation=6",
    ])
    capsys.readouterr()
    assert rc == 0 and map_file.exists()
    rc = cli.main([
        "localize", "--map", str(map_file), "--dataset", "sim2d",
        "--frame", "15", "--frames", "30",
    ])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0 and rep["localized"], rep
    assert rep["error_vs_gt_m"] < 2.0, rep
