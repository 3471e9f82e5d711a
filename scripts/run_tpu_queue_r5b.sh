#!/bin/bash
# r5b TPU queue — the stages left pending when the r5 session ended (the
# /tmp queue state did not survive; recorded results live in BASELINE.md
# "r5 TPU queue results"). Order:
#   1. fused_smoke     compile probe at flagship scale (post-8e229df
#                      50 B/elem VMEM shrink) — cheap gate for 2 and 5
#   2. fused_ab        VERDICT r4 item 4: the decision run
#   3. endurance3b     item 5+2: 5-lap endurance at the FLAGSHIP accuracy
#                      config (highest NN + ovs8 rescore normals) — the
#                      r5 endurance3 ran the diverging rescore config
#   4. kitti00_final   item 7: 4,541 frames, MAXKF=2048 (the 512-cap
#                      overflow found in the first run), flagship config
#   5. lap_fused       r4 item 8 leftover: fused-path full-scale lap
set -u
OUT=${TPU_QUEUE_OUT:-/tmp/tpu_queue_r5b}
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

stage fused_smoke 2400 python scripts/exp_fused_smoke.py

stage fused_ab 4500 python scripts/exp_fused_ab.py

stage endurance3b 5400 env \
  ENDURANCE_CACHE=/tmp/end_scans ENDURANCE_OUT="$OUT/endurance3b" \
  python scripts/exp_endurance.py

stage kitti00_final 10800 env ENDURANCE_FRAMES=4541 ENDURANCE_MAXKF=2048 \
  ENDURANCE_CACHE=/tmp/end_scans_k00 ENDURANCE_OUT="$OUT/kitti00_final" \
  python scripts/exp_endurance.py

stage lap_fused 7200 env LAP_SCALE=full LAP_LOOP=fused LAP_NN=highest \
  python scripts/exp_lap_eval.py

echo "[queue] complete $(date +%H:%M:%S)" | tee -a "$OUT/queue.log"
