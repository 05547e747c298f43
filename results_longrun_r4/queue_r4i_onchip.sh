#!/bin/bash
# Round-4 stage i (supersedes r4h): the first 10q DQfD run kept the
# demo playable (replay at 4.026e-4 < published 4.1e-4) but its RL best
# plateaued at 5.4e-4 with a slow epsilon anneal — retry with a
# fast-anneal/deep-exploit config variant and heavier demo seeding,
# then the 20q host-stepped demo, then (time permitting) the 18q
# fixed-mode training run.  Chip must be free by ~18:10 UTC.
# Stop early: touch /tmp/stop_r4i
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4i started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4i ] && echo "r4i stopped by flag $(date)" >> "$LOG" && exit 0; }

for i in $(seq 240); do
  [ -f $R/stage_f1.done ] && break
  sleep 10
done

stop
timeout 1500 python -u -m tensorrl_qas_tpu.train.cli --seed 7 \
  --config H2O10q_TNbond3_exploit --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --demo results_extracts/structure_search_10q_legal.json --demo_copies 100 \
  --total_steps 32000 --stop_at_error 4.1e-4 --stop_min_successes 1 \
  --results_path $R/f10demo2/ > $R/fixed_10q_demo2.log 2>&1
echo "=== 10q DQfD exploit exit=$? $(date)" >> "$LOG"
touch $R/stage_i1.done

stop
timeout 2400 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 2 --num_layers 30 --global_iters 10 --n_starts 2 \
  --out $R/demo20q_hostloop.json > $R/demo20q_hostloop.log 2>&1
echo "=== demo20q (hostloop) exit=$? $(date)" >> "$LOG"
touch $R/stage_i2.done

stop
timeout 1500 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h/ > $R/fixed_18q.log 2>&1
echo "=== 18q fixed train exit=$? $(date)" >> "$LOG"
touch $R/stage_i3.done
echo "=== queue_r4i COMPLETE $(date)" >> "$LOG"
