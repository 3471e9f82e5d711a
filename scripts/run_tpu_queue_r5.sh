#!/bin/bash
# r5 TPU measurement queue — run serially; waits for the axon tunnel to be
# healthy before each stage (the r5 session hit a multi-hour congestion
# window where a trivial dispatch took >10 min). Judge-priority order:
#   1. rescore tile sweep        (VERDICT r4 item 1: pick the kernel tiles)
#   2. full-scale lap sweep arms (item 1 accuracy validation + item 6
#      gate-x-voxel isolation + the never-run xla_exn arm)
#   3. bench pre-flip            (rescore+oversample fps; band-soft)
#   4. endurance3                (item 5: backend levers at 5-lap density)
#   5. fused A/B                 (item 4: the decision run)
#   6. KITTI-00 length           (item 7: 4,541 frames)
# Each stage logs to $OUT/<stage>.log.
set -u
OUT=${TPU_QUEUE_OUT:-/tmp/tpu_queue_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))+1).sum()))" >/dev/null 2>&1
}

wait_healthy() {  # block up to ~2 h for the tunnel; rc=1 when it never comes
  for i in $(seq 1 24); do
    probe && return 0
    echo "[wait] tunnel unhealthy, probe $i/24 failed $(date +%H:%M:%S)" \
      | tee -a "$OUT/queue.log"
    sleep 300
  done
  return 1
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "$OUT/$name.done" ]; then
    echo "[$name] already done, skipping" | tee -a "$OUT/queue.log"
    return 0
  fi
  if ! wait_healthy; then
    echo "[$name] SKIPPED: tunnel never recovered $(date +%H:%M:%S)" \
      | tee -a "$OUT/queue.log"
    return 1
  fi
  echo "[$name] start $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
  timeout "$to" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "[$name] done rc=$rc $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  tail -5 "$OUT/$name.log" | tee -a "$OUT/queue.log"
  return 0
}

# 0. warm the compile cache (verify-skill recipe) incl. the rescore kernel
stage warm 1200 python - <<'EOF'
import sys
sys.path.insert(0, 'src')
from tpu_icp_slam.obs.compile_cache import enable; enable()
import numpy as np, jax.numpy as jnp
from tpu_icp_slam.kernels.nn_pallas import nn_bruteforce_pallas
rng = np.random.default_rng(0)
src = jnp.asarray(rng.uniform(-5, 5, (256, 3)), jnp.float32)
dst = jnp.asarray(rng.uniform(-5, 5, (300, 3)), jnp.float32)
for prec in ("highest", "bf16", "rescore"):
    nn_bruteforce_pallas(src, dst, tile_m=128, tile_n=256, precision=prec)
print("warm")
EOF

# 1. rescore tile sweep at the headline regime (+ bf16 session reference)
stage tiles_rescore 3600 env TILES_PRECISIONS=rescore,bf16 \
  python scripts/exp_tiles_headline.py

# 2. full-scale lap sweep: the r5 validation + isolation arms
stage lap_sweep_r5 7200 env \
  LAP_SWEEP_ONLY=corr1.0_hi_exn,corr1.0_rescore_ovs,corr1.0_xla_exn,corr0.7_hi_exn,vox0.35_hi_exn \
  python scripts/exp_lap_sweep.py

# 3. bench pre-flip measurement (rescore + oversampled normals; soft band —
#    the stored band belongs to the old config and is re-derived at flip)
stage bench_rescore 2400 env BENCH_NN=rescore BENCH_NOVS=4 BENCH_REGIME=kitti \
  BENCH_BAND_SOFT=1 python bench.py

# 4. endurance3: 5 laps with the r5 backend levers + rescore config
stage endurance3 5400 env ENDURANCE_NN=rescore ENDURANCE_NOVS=4 \
  ENDURANCE_CACHE=/tmp/end_scans ENDURANCE_OUT="$OUT/endurance3" \
  python scripts/exp_endurance.py

# 5. whole-loop fused ICP A/B (VERDICT r4 item 4: run to a decision)
stage fused_ab 4500 python scripts/exp_fused_ab.py

# 5b. fused-path full-scale lap soak (r4 item 8 leftover: the 2D
#     adversarial soak cannot reach the 3D-only fused kernel)
stage lap_fused 7200 env LAP_SCALE=full LAP_LOOP=fused LAP_NN=highest \
  python scripts/exp_lap_eval.py

# 6. KITTI-00 length: 4,541 frames (~23 laps of the circuit)
stage kitti00_len 10800 env ENDURANCE_NN=rescore ENDURANCE_NOVS=4 \
  ENDURANCE_FRAMES=4541 ENDURANCE_CACHE=/tmp/end_scans_k00 \
  ENDURANCE_OUT="$OUT/kitti00" python scripts/exp_endurance.py

echo "[queue] complete $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
