#!/bin/bash
# Round 3 queue Q — 18-qubit Heisenberg training through the v3+ fast
# path (TensorRL-trainable, chi=2 warm start): extends the 14q/16q
# beyond-reference training rows to the new top of the single-chip band.
# Chained after queue_r3p (20q chip demos) frees the chip.
# Stop early: touch /tmp/stop_r3q
set -u
cd /root/repo
R=results_longrun_r3
LOG=$R/trainable_18q.log

while [ ! -f $R/queue_r3p.done ]; do
  [ -f /tmp/stop_r3q ] && exit 0
  sleep 60
done

[ -f /tmp/stop_r3q ] && exit 0
timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 8000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/tr18h/ > "$LOG" 2>&1
echo "=== 18q train exit=$? $(date)" >> "$LOG"
touch $R/queue_r3q.done
