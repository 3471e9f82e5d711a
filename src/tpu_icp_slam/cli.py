"""Command-line interface (SURVEY.md §2b N22) — run / align / bench / eval.

The reference's entry point was a GLFW app `main(argc, argv)` (SURVEY.md §2a
R2; mount empty, §0). Headless TPU equivalent: subcommands over the same
capabilities, with map renders written as PNG artifacts instead of a window.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"override must be key=value, got: {p}")
        k, v = p.split("=", 1)
        out[k.lstrip("-")] = v
    return out


def cmd_align(args) -> int:
    import numpy as np

    from tpu_icp_slam.config import ICPConfig
    from tpu_icp_slam.core import pointcloud as pcm
    from tpu_icp_slam.datasets import synthetic
    from tpu_icp_slam.eval import metrics
    from tpu_icp_slam.icp import align

    src, dst, T_gt = synthetic.two_scan_pair(
        n=args.n, seed=args.seed, noise=args.noise
    )
    cfg = ICPConfig(
        max_iters=args.max_iters, nn_backend=args.nn_backend, tol=1e-6
    )
    # realize (host readback), not block_until_ready: the axon tunnel's
    # buffers report ready while execution is still queued (obs/timers.py)
    from tpu_icp_slam.obs import realize

    t0 = time.perf_counter()
    res = align(pcm.make(src, args.n), pcm.make(dst, args.n), cfg=cfg)
    realize(res.T)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = align(pcm.make(src, args.n), pcm.make(dst, args.n), cfg=cfg)
    realize(res.T)
    t_steady = time.perf_counter() - t0
    rot_err, trans_err = metrics.transform_error(
        np.asarray(res.T, np.float64), T_gt
    )
    report = {
        "n_points": args.n,
        "iters": int(res.iters),
        "rmse": float(res.rmse),
        "n_inliers": int(res.n_inliers),
        "converged": bool(res.converged),
        "rot_err_rad": rot_err,
        "trans_err_m": trans_err,
        "recovered_under_1e-3": bool(rot_err < 1e-3 and trans_err < 1e-3),
        "time_first_call_s": round(t_first, 4),
        "time_steady_s": round(t_steady, 4),
    }
    if args.repeat > 1:
        # engine rate, not tunnel rate: one ~27 ms dispatch per solve makes
        # the single-solve number measure the transport (VERDICT r2 weak 4)
        # — vmap `repeat` independent problems into ONE dispatch and
        # amortize it away
        import jax
        import jax.numpy as jnp

        srcs, dsts = [], []
        for r in range(args.repeat):
            s_r, d_r, _ = synthetic.two_scan_pair(
                n=args.n, seed=args.seed + r, noise=args.noise
            )
            srcs.append(pcm.make(s_r, args.n).points)
            dsts.append(pcm.make(d_r, args.n).points)
        sb, db = jnp.stack(srcs), jnp.stack(dsts)
        mb = jnp.ones((args.repeat, args.n), bool)

        @jax.jit
        def batched(sb, mb, db):
            return jax.vmap(
                lambda s, m, d: align(
                    pcm.PointCloud(points=s, mask=m),
                    pcm.PointCloud(points=d, mask=jnp.ones(d.shape[0], bool)),
                    cfg=cfg,
                ).T
            )(sb, mb, db)

        realize(batched(sb, mb, db))  # compile
        t0 = time.perf_counter()
        realize(batched(sb, mb, db))
        dt = time.perf_counter() - t0
        report["batched_repeat"] = args.repeat
        report["batched_solves_per_s"] = round(args.repeat / dt, 1)
    print(json.dumps(report, indent=2))
    return 0 if report["recovered_under_1e-3"] else 1


def cmd_run(args) -> int:
    from tpu_icp_slam.slam.runner import run_from_cli

    return run_from_cli(args)


def cmd_bench(args) -> int:
    from tpu_icp_slam.obs.bench import bench_from_cli

    return bench_from_cli(args)


def cmd_eval(args) -> int:
    from tpu_icp_slam.eval.runner import eval_from_cli

    return eval_from_cli(args)


def cmd_localize(args) -> int:
    """Global relocalization in a saved map (kidnapped-robot query)."""
    import json

    import numpy as np

    from tpu_icp_slam.config import SlamConfig, from_json
    from tpu_icp_slam.slam import map_io
    from tpu_icp_slam.slam.runner import load_dataset, pad_scans

    cfg = SlamConfig()
    if args.config:
        with open(args.config) as fh:
            cfg = from_json(fh.read())
    if getattr(args, "override_dict", None):
        from tpu_icp_slam.config import override

        cfg = override(cfg, args.override_dict)
    saved = map_io.load_map(args.map, cfg.backend)
    # query preprocessing must match what built the map: same log length
    # (synthetic generators resample the route by frame count), same
    # downsample voxel, same padded capacity
    n_frames = args.frames if args.frames > 0 else max(args.frame + 1, 2)
    data = load_dataset(args.dataset, n_frames)
    scans = data.scans
    if cfg.pipeline.downsample_voxel > 0:
        from tpu_icp_slam.core.pointcloud import voxel_downsample_np

        scans = [
            voxel_downsample_np(s, cfg.pipeline.downsample_voxel)
            for s in scans
        ]
    cap = saved.kf_scans[0][0].shape[0]
    pts, msk = pad_scans(scans, cap)
    out = map_io.localize_in_map(
        saved, pts[args.frame], msk[args.frame], topk=args.topk
    )
    report = {"map": args.map, "dataset": args.dataset, "frame": args.frame}
    if out is None:
        report["localized"] = False
    else:
        pose, match_idx, rmse = out
        report.update(
            localized=True,
            match_keyframe=int(match_idx),
            rmse=float(rmse),
            pose=np.asarray(pose).tolist(),
        )
        if data.gt_poses is not None:
            gt = data.gt_poses[args.frame]
            gt_rel = np.linalg.inv(data.gt_poses[0]) @ gt
            d = gt.shape[0] - 1
            report["error_vs_gt_m"] = float(
                np.linalg.norm(np.asarray(pose)[:d, d] - gt_rel[:d, d])
            )
    print(json.dumps(report, indent=2))
    return 0 if report.get("localized") else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tpu-icp-slam")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("align", help="two-cloud ICP alignment demo (config 1)")
    a.add_argument("--n", type=int, default=4096)
    a.add_argument("--seed", type=int, default=0)
    a.add_argument("--noise", type=float, default=0.0)
    a.add_argument("--max-iters", type=int, default=60)
    a.add_argument("--nn-backend", default="auto", choices=["auto", "pallas", "xla"])
    a.add_argument("--repeat", type=int, default=1,
                   help="also report the engine rate: vmap this many "
                        "independent solves into ONE dispatch")
    a.set_defaults(fn=cmd_align)

    r = sub.add_parser("run", help="full SLAM over a dataset/log")
    r.add_argument("--dataset", default="sim2d", help="sim2d | sim3d | simrgbd | path to a real log (.clf / TUM dir / KITTI dir)")
    r.add_argument("--frames", type=int, default=60)
    r.add_argument("--config", default=None, help="JSON config file")
    r.add_argument("--out", default="out", help="artifact directory")
    r.add_argument("--resume", action="store_true")
    r.add_argument("--checkpoint-every", type=int, default=0)
    r.add_argument("--save-map", default=None, help="export the keyframe map "
                   "(.npz) for later `localize` / multi-session use "
                   "(3D backend path)")
    r.add_argument("overrides", nargs="*", help="dotted config overrides k=v")
    r.set_defaults(fn=cmd_run)

    l = sub.add_parser(
        "localize", help="globally relocalize a scan in a saved map"
    )
    l.add_argument("--map", required=True, help="map .npz from run --save-map")
    l.add_argument("--dataset", default="sim3d", help="query scan source")
    l.add_argument("--frame", type=int, default=0, help="query frame index")
    l.add_argument("--frames", type=int, default=0,
                   help="query log length (match the mapping run; 0 = frame+1)")
    l.add_argument("--topk", type=int, default=3)
    l.add_argument("--config", default=None, help="JSON config file")
    l.add_argument("overrides", nargs="*", help="dotted config overrides k=v")
    l.set_defaults(fn=cmd_localize)

    b = sub.add_parser("bench", help="frames/s benchmark harness")
    b.add_argument("--config-id", type=int, default=1, choices=[1, 2, 3, 4, 5])
    b.add_argument("--frames", type=int, default=50)
    b.add_argument("--json", action="store_true", help="one-line JSON output")
    b.set_defaults(fn=cmd_bench)

    e = sub.add_parser("eval", help="trajectory accuracy evaluation")
    e.add_argument("--dataset", default="sim2d")
    e.add_argument("--frames", type=int, default=60)
    e.add_argument("--config", default=None, help="JSON config file")
    e.add_argument("overrides", nargs="*", help="dotted config overrides k=v")
    e.set_defaults(fn=cmd_eval)
    return p


def main(argv=None) -> int:
    from tpu_icp_slam.obs.compile_cache import enable as _enable_cache

    _enable_cache()
    args = build_parser().parse_args(argv)
    if hasattr(args, "overrides"):
        args.override_dict = _parse_overrides(args.overrides)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
