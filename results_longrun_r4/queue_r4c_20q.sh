#!/bin/bash
# Round-4 stage c rerun: 20q training demo on the real chip (the previous
# session's background queue died with the session before stage c finished).
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4c started $(date)" >> "$LOG"
timeout 5400 python scripts/demo_20q_training.py --mesh 1,1 \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out $R/demo20q_chip.json > $R/demo20q_chip.log 2>&1
echo "=== demo20q (1,1 mesh) exit=$? $(date)" >> "$LOG"
timeout 5400 python scripts/demo_20q_training.py --mesh none \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out $R/demo20q_chip_nomesh.json > $R/demo20q_nomesh.log 2>&1
echo "=== demo20q (no mesh, adjoint) exit=$? $(date)" >> "$LOG"
touch $R/stage_c.done
echo "=== queue_r4c COMPLETE $(date)" >> "$LOG"
