#!/bin/bash
# Round-4 stage j: one more 20q single-chip episode with a production
# optimizer budget (global_iters 50 x 4 starts, vs the capability
# demo's 10 x 2) so the recorded trajectory descends.  Runs after the
# 18q fixed train (stage_i3) releases the chip; hard-stops in time for
# the driver's round-end bench.  Stop early: touch /tmp/stop_r4j
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4j started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4j ] && echo "r4j stopped by flag $(date)" >> "$LOG" && exit 0; }

for i in $(seq 200); do
  [ -f $R/stage_i3.done ] && break
  sleep 10
done

stop
timeout 1500 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 1 --num_layers 30 --global_iters 50 --n_starts 4 \
  --out $R/demo20q_budget.json > $R/demo20q_budget.log 2>&1
echo "=== demo20q (budget) exit=$? $(date)" >> "$LOG"
touch $R/stage_j1.done
echo "=== queue_r4j COMPLETE $(date)" >> "$LOG"
