#!/bin/bash
# r5d TPU queue — the coverage-ratio prediction arm (BASELINE.md r5c):
# LAP_LMS=32768 at voxel 0.2 gives the flagship lap a 2:1 model:scan
# surplus at matched density. Prediction: full-scale odometry closes
# toward the small-scale ~2.2% of route. Launch only after r5c completes.
set -u
OUT=${TPU_QUEUE_OUT:-/tmp/tpu_queue_r5d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))+1).sum()))" >/dev/null 2>&1
}

wait_healthy() {
  for i in $(seq 1 24); do
    probe && return 0
    echo "[wait] tunnel unhealthy, probe $i/24 failed $(date +%H:%M:%S)" \
      | tee -a "$OUT/queue.log"
    sleep 300
  done
  return 1
}

stage() {
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

stage lap_lm32768 7200 env LAP_SCALE=full LAP_NN=highest LAP_LMS=32768 \
  LAP_NO_GOLDEN=1 python scripts/exp_lap_eval.py

echo "[queue] complete $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
