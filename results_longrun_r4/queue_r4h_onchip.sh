#!/bin/bash
# Round-4 stage h (replaces r4g, whose --num_layers 12 left no gate
# budget after the depth-22 warm start): 20q single-chip demo on the
# host-stepped fused path, then a wall-bounded 18q fixed-mode training
# run.  Must release the chip by ~18:10 UTC for the driver's round-end
# bench.  Stop early: touch /tmp/stop_r4h
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4h started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4h ] && echo "r4h stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 40 min) for the 10q DQfD stage to release the chip
for i in $(seq 240); do
  [ -f $R/stage_f1.done ] && break
  sleep 10
done

stop
timeout 2400 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 2 --num_layers 30 --global_iters 10 --n_starts 2 \
  --out $R/demo20q_hostloop.json > $R/demo20q_hostloop.log 2>&1
echo "=== demo20q (hostloop) exit=$? $(date)" >> "$LOG"
touch $R/stage_h1.done

stop
timeout 2400 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h/ > $R/fixed_18q.log 2>&1
echo "=== 18q fixed train exit=$? $(date)" >> "$LOG"
touch $R/stage_h2.done
echo "=== queue_r4h COMPLETE $(date)" >> "$LOG"
