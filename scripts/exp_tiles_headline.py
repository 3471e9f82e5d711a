"""NN tile sweep at the HEADLINE regime with the honest fence (VERDICT r2
item 3): 16,384 source points vs the 16,384-point local model (the shape the
flagship pipeline actually runs per ICP iteration), bf16 and HIGHEST.

The r1 sweep that picked 1024x8192 measured enqueue rates (BASELINE.md
invalidation note); this one loops the kernel ITERS times inside one jit
with a data dependency between calls (CSE-defeated — the per-call cost is
(total - floor)/ITERS, amortizing the scan-step floor) and fences with a
host readback. Writes one JSON line per (precision, tile_m, tile_n);
summarize into BASELINE.md and set kernel defaults from the winner.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import numpy as np  # noqa: E402

from tpu_icp_slam.obs.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_icp_slam.kernels.nn_pallas import nn_bruteforce_pallas  # noqa: E402
from tpu_icp_slam.obs import realize  # noqa: E402

M = int(os.environ.get("TILES_M", "16384"))
N = int(os.environ.get("TILES_N", "16384"))
ITERS = int(os.environ.get("TILES_ITERS", "20"))
REPEATS = int(os.environ.get("TILES_REPEATS", "3"))


def sweep_one(precision, tm, tn, src, dst):
    @jax.jit
    def looped(s, d):
        def body(carry, _):
            # data dependency defeats CSE: shift src by the previous
            # iteration's mean distance (tiny, doesn't change the workload)
            s_c, acc = carry
            idx, d2 = nn_bruteforce_pallas(
                s_c, d, tile_m=tm, tile_n=tn, precision=precision
            )
            eps = jnp.mean(d2) * 1e-12
            return (s_c + eps, acc + jnp.sum(idx)), ()

        (s_f, acc), _ = jax.lax.scan(body, (s, jnp.int32(0)), None,
                                     length=ITERS)
        return acc

    try:
        t0 = time.perf_counter()
        realize(looped(src, dst))
        compile_s = time.perf_counter() - t0
        best = np.inf
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            realize(looped(src, dst))
            best = min(best, time.perf_counter() - t0)
        # subtract the measured in-context scan-step floor (~0.8 ms/step)
        per_call_ms = best * 1e3 / ITERS
        print(json.dumps({
            "precision": precision, "tile_m": tm, "tile_n": tn,
            "ms_per_call_incl_floor": round(per_call_ms, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    except Exception as e:  # VMEM OOM etc — record, keep sweeping
        print(json.dumps({
            "precision": precision, "tile_m": tm, "tile_n": tn,
            "error": type(e).__name__, "msg": str(e)[:140],
        }), flush=True)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-40, 40, (M, 3)), jnp.float32)
    dst = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
    from tpu_icp_slam.obs.bench import measurement_stamp
    print(json.dumps(measurement_stamp()), flush=True)
    print(json.dumps({"platform": jax.default_backend(), "M": M, "N": N,
                      "iters": ITERS}), flush=True)
    tiles = [
        (512, 4096), (512, 8192),
        (1024, 4096), (1024, 8192), (1024, 16384),
        (2048, 4096), (2048, 8192),
        (4096, 8192),
    ]
    # rescore holds ~3 (TM×TN) arrays in VMEM (e + iota + masked copy) so
    # its tile frontier sits lower; more tiles also = more candidates
    rescore_tiles = [
        (256, 1024), (256, 2048), (256, 4096),
        (512, 1024), (512, 2048), (512, 4096),
        (1024, 2048),
    ]
    only = os.environ.get("TILES_PRECISIONS", "bf16,highest,rescore")
    for prec in only.split(","):
        for tm, tn in (rescore_tiles if prec == "rescore" else tiles):
            sweep_one(prec, tm, tn, src, dst)
