"""Fast-frame A/B round 4: the whole-loop fused Pallas ICP kernel
(kernels/icp_fused_pallas.py, icp.loop_backend=fused).

BASELINE.md r3 SOL decomposition: at the 101.5 fps flagship point each ICP
iteration costs ~1.18 ms of which only ~0.5-0.7 ms is kernel work — the
rest is per-while_loop-step backend control floor, bounding the frame at
~140 fps. The fused kernel runs the entire iterate-until-converged loop in
ONE pallas_call, so the floor is paid once per frame instead of once per
iteration. Expected win if Mosaic-on-axon supports the kernel: ~2-3 ms per
frame (~25-35%% fps).

Variants:
  flagship       bench.py _kitti_cfg (steps loop, bf16 NN)
  fused          + icp.loop_backend=fused (bf16 NN selection inside)
  fused_f32      + fused with precision=highest NN (cost of exactness)
  fused_tiles    + fused with a larger model tile (one NN fold pass)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))

from exp_fast_frame3 import _base, _scans, run_variant  # noqa: E402

import jax  # noqa: E402


def _icpcfg(cfg, **kw):
    return dataclasses.replace(
        cfg, icp=dataclasses.replace(cfg.icp, **kw)
    )


if __name__ == "__main__":
    scans, gt = _scans()
    from tpu_icp_slam.obs.bench import measurement_stamp
    print(json.dumps(measurement_stamp()), flush=True)
    print(json.dumps({"platform": jax.default_backend(),
                      "frames": len(scans)}), flush=True)
    base = _base()
    variants = {
        "flagship": base,
        # r5: the steps loop with the exact-selection shortlist+rescore NN
        # — the config the accuracy-first flagship flip rides on
        "flagship_rescore": _icpcfg(base, nn_precision="rescore"),
        "fused": _icpcfg(base, loop_backend="fused"),
        "fused_f32": _icpcfg(base, loop_backend="fused",
                             nn_precision="highest"),
        # tile_n = full local model: a single dst fold pass per src tile
        "fused_tiles": _icpcfg(base, loop_backend="fused",
                               nn_tile_m=2048, nn_tile_n=8192),
    }
    only = os.environ.get("FUSED_AB_ONLY")
    for name, cfg in variants.items():
        if only and name not in only.split(","):
            continue
        try:
            run_variant(name, cfg, scans, gt)
        except Exception as exc:  # one failing arm must not kill the A/B
            print(json.dumps({"variant": name, "error": str(exc)[:400]}),
                  flush=True)
