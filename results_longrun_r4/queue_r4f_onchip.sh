#!/bin/bash
# Round-4 stage f: the round-3 DQfD 10q-fixed run that never executed
# (queue_r3h stage 3; tunnel died) — seed the replay buffer with the
# mask-legal evolutionary champion (polished 3.81e-4 < published 4.1e-4)
# and see if RL lands episodes at/below the published row.  Then the 18q
# fixed-mode training run (stage e2, deferred behind this short run).
# Chained: waits for stage_e1.done (20q demo frees the chip).
# Stop early: touch /tmp/stop_r4f
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4f started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4f ] && echo "r4f stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 45 min) for the 20q demo stage to release the chip
for i in $(seq 270); do
  [ -f $R/stage_e1.done ] && break
  sleep 10
done

stop
timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 3 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --demo results_extracts/structure_search_10q_legal.json --demo_copies 40 \
  --total_steps 64000 --stop_at_error 4.1e-4 --stop_min_successes 1 \
  --results_path $R/f10demo/ > $R/fixed_10q_demo.log 2>&1
echo "=== 10q DQfD exit=$? $(date)" >> "$LOG"
touch $R/stage_f1.done

stop
timeout 12600 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h/ > $R/fixed_18q.log 2>&1
echo "=== 18q fixed train exit=$? $(date)" >> "$LOG"
touch $R/stage_f2.done
echo "=== queue_r4f COMPLETE $(date)" >> "$LOG"
