#!/bin/bash
# r5c TPU queue — post-r5b follow-ups. Launch ONLY after run_tpu_queue_r5b.sh
# completes (one TPU; concurrent workloads pollute each other's timings).
#   1. lm_ab         local-model-size fps gate (scripts/exp_local_model.py):
#                    the one flagship NN lever the r4 map-op A/B never tried
#   2. lap_lm8192    accuracy gate for any lm flip (the r4 lesson: 30
#                    straight frames hide divergence — gate on the lap)
#   3. lap_smallx    VERDICT r4 item 6 discriminator: full-scale scans with
#                    the SMALL-scale extraction exactly (voxel 0.35, model
#                    4,096). vox0.35_hi_exn (model 16,384) diverged while
#                    small-scale vox0.35 holds 2.2% — this arm separates
#                    scan density from extraction radius as the cause.
#   4. bench_default bench.py at shipped defaults (ovs8) — the number the
#                    driver's end-of-round capture should reproduce
set -u
OUT=${TPU_QUEUE_OUT:-/tmp/tpu_queue_r5c}
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

stage lm_ab 3600 python scripts/exp_local_model.py

stage lap_lm8192 7200 env LAP_SCALE=full LAP_NN=highest LAP_LMS=8192 LAP_NO_GOLDEN=1 \
  python scripts/exp_lap_eval.py

stage lap_smallx 7200 env LAP_SCALE=full LAP_NN=highest LAP_LMS=4096 LAP_NO_GOLDEN=1 \
  LAP_VOXEL=0.35 python scripts/exp_lap_eval.py

stage bench_default 2400 python bench.py

echo "[queue] complete $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
