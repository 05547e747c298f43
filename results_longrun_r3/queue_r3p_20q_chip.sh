#!/bin/bash
# After queue_r3o (v3+ validation + bench) completes, run the 20-qubit
# training demo on the REAL chip via a degenerate (1 amp x 1 dp) mesh —
# upgrading the round-3 20q evidence from virtual-mesh to real-hardware.
# Stop early: touch /tmp/stop_r3p
cd /root/repo
LOG=results_longrun_r3/demo20q_chip.log
echo "=== queue_r3p started $(date)" >> "$LOG"
while [ ! -f results_longrun_r3/queue_r3o.done ]; do
  [ -f /tmp/stop_r3p ] && echo "stopped by flag $(date)" >> "$LOG" && exit 0
  sleep 60
done
timeout 5400 python scripts/demo_20q_training.py --mesh 1,1 \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out results_longrun_r3/demo20q_chip.json >> "$LOG" 2>&1
echo "=== demo (1,1 mesh) exit=$? $(date)" >> "$LOG"
[ -f /tmp/stop_r3p ] && exit 0
timeout 5400 python scripts/demo_20q_training.py --mesh none \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out results_longrun_r3/demo20q_chip_nomesh.json >> "$LOG" 2>&1
echo "=== demo (no mesh, adjoint) exit=$? $(date)" >> "$LOG"
touch results_longrun_r3/queue_r3p.done
