#!/bin/bash
# Round-4 stage g: 20q single-chip demo on the host-stepped fused path
# (commit 0c1aee2 — the fully fused program SIGKILLed the AOT compile
# helper at 16:07; the hostloop compiles only the value+grad body),
# then a wall-bounded 18q fixed-mode training run.  Everything here must
# release the chip by ~18:10 UTC so the driver's round-end bench runs
# uncontended.  Stop early: touch /tmp/stop_r4g
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4g started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4g ] && echo "r4g stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 40 min) for the 10q DQfD stage to release the chip
for i in $(seq 240); do
  [ -f $R/stage_f1.done ] && break
  sleep 10
done

stop
timeout 2700 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 1 --num_layers 12 --global_iters 10 --n_starts 2 \
  --out $R/demo20q_hostloop.json > $R/demo20q_hostloop.log 2>&1
echo "=== demo20q (hostloop) exit=$? $(date)" >> "$LOG"
touch $R/stage_g1.done

stop
timeout 2100 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h/ > $R/fixed_18q.log 2>&1
echo "=== 18q fixed train exit=$? $(date)" >> "$LOG"
touch $R/stage_g2.done
echo "=== queue_r4g COMPLETE $(date)" >> "$LOG"
