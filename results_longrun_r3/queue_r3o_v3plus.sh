#!/bin/bash
# Watches for the TPU tunnel to come back, then validates the v3+ band
# (17q/18q) and runs a full default bench with the new repeats protocol.
# Stop early: touch /tmp/stop_r3o
cd /root/repo
LOG=results_longrun_r3/v3plus_validate.log
echo "=== queue_r3o started $(date)" >> "$LOG"
while true; do
  [ -f /tmp/stop_r3o ] && echo "stopped by flag $(date)" >> "$LOG" && exit 0
  if timeout 90 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "=== tunnel up $(date)" >> "$LOG"
    break
  fi
  sleep 120
done
timeout 3600 python scripts/validate_v3plus.py >> "$LOG" 2>&1
echo "=== validate exit=$? $(date)" >> "$LOG"
[ -f /tmp/stop_r3o ] && exit 0
BENCH_SIZES=8,10,12,14,16,18 timeout 5400 python bench.py \
  > results_longrun_r3/bench_r3o.json 2>> "$LOG"
echo "=== bench exit=$? $(date)" >> "$LOG"
touch results_longrun_r3/queue_r3o.done
