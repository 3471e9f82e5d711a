#!/bin/bash
# r3 TPU measurement queue — run serially once the axon tunnel is healthy.
# Each stage logs to $OUT/<stage>.log; a failed tunnel probe between stages
# aborts the rest (a dead tunnel would otherwise burn hours of timeouts).
# Order = descending judge priority: endurance (VERDICT r2 item 1) first.
set -u
OUT=${TPU_QUEUE_OUT:-/tmp/tpu_queue}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))+1).sum()))" >/dev/null 2>&1
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if ! probe; then
    echo "[$name] SKIPPED: tunnel probe failed at $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
    return 1
  fi
  echo "[$name] start $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "[$name] done rc=$rc $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
  tail -5 "$OUT/$name.log" | tee -a "$OUT/queue.log"
  return 0
}

# 0. warm the compile cache (verify-skill recipe): small kernels + align
stage warm 900 python - <<'EOF'
import sys, os
sys.path.insert(0, 'src')
from tpu_icp_slam.obs.compile_cache import enable; enable()
import numpy as np, jax.numpy as jnp
from tpu_icp_slam.config import ICPConfig
from tpu_icp_slam.core import pointcloud as pcm
from tpu_icp_slam.datasets import synthetic
from tpu_icp_slam.icp import align
from tpu_icp_slam.kernels.nn_pallas import nn_bruteforce_pallas
rng = np.random.default_rng(0)
src = jnp.asarray(rng.uniform(-5, 5, (256, 3)), jnp.float32)
dst = jnp.asarray(rng.uniform(-5, 5, (300, 3)), jnp.float32)
for prec in ("highest", "bf16"):
    nn_bruteforce_pallas(src, dst, tile_m=128, tile_n=256, precision=prec)
s, d, _ = synthetic.two_scan_pair(n=512, seed=1)
align(pcm.make(s, 512), pcm.make(d, 512),
      cfg=ICPConfig(max_iters=25, tol=1e-6, nn_backend="pallas"))
print("warm")
EOF
[ $? -eq 1 ] && exit 1

# 1. flagship-length endurance (VERDICT r2 item 1) — uses the scan cache
stage endurance 4500 env ENDURANCE_CACHE=/tmp/end_scans ENDURANCE_OUT="$OUT/endurance" \
  python scripts/exp_endurance.py || exit 1

# 2. whole-loop fused ICP A/B (the r3 flagship lever)
stage fused_ab 4500 python scripts/exp_fused_ab.py || exit 1

# 3. map-op levers A/B (approx extract / hash insert)
stage fast_frame3 3000 python scripts/exp_fast_frame3.py || exit 1

# 4. driver bench (final headline; band + roofline gated)
stage bench 1800 python bench.py || exit 1

# 5. NN tile sweep at the headline regime (fills BASELINE's tile table)
stage tiles 3000 python scripts/exp_tiles_headline.py || exit 1

# 6. full-resolution RGB-D ladder (VERDICT r2 item 6)
stage rgbd 3000 python scripts/exp_rgbd_fullres.py || exit 1

# 7. batched align engine rate (config-1 ladder, VERDICT r2 weak 4)
stage align_rate 1800 env PYTHONPATH="src:${PYTHONPATH:-}" \
  python -m tpu_icp_slam.cli align --n 4096 --repeat 64 || exit 1

echo "QUEUE COMPLETE $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
