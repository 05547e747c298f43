#!/bin/bash
# Round-4 stage k: re-probe the kernel roofline on hardware after the
# round-4 kernel changes (start-chunking, su4 kinds) — VERDICT r3 item
# 4's measurement — then top up the 18q fixed-mode training log with
# the remaining chip window.  Stop early: touch /tmp/stop_r4k
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4k started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4k ] && echo "r4k stopped by flag $(date)" >> "$LOG" && exit 0; }

for i in $(seq 200); do
  [ -f $R/stage_j1.done ] && break
  sleep 10
done

stop
timeout 1800 python -u scripts/roofline.py --sizes 8,10,12,14 \
  --out $R/roofline_r4.json > $R/roofline_r4.log 2>&1
echo "=== roofline exit=$? $(date)" >> "$LOG"
touch $R/stage_k1.done

stop
timeout 1200 python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h2/ > $R/fixed_18q_b.log 2>&1
echo "=== 18q fixed (b) exit=$? $(date)" >> "$LOG"
touch $R/stage_k2.done
echo "=== queue_r4k COMPLETE $(date)" >> "$LOG"
