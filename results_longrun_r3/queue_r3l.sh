#!/bin/bash
# Round 3 queue L — beyond-reference scale demos on the real chip:
# 14q and 16q Heisenberg training runs through the v3 fast path
# (TensorRL-trainable: warm-start angles refine, agent adds gates).
# Chained after the 20q single-chip demo frees the chip.
# Stop: touch /tmp/stop_r3l (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3l ] && exit 0 || true; }

for _ in $(seq 1 480); do
  [ -f $R/demo20q_tpu.json ] && break
  pgrep -f demo_20q_training >/dev/null 2>&1 || break
  [ -f /tmp/stop_r3l ] && exit 0
  sleep 30
done

stop; timeout 5400 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_14q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 32 --eps_per_step 1 \
  --total_steps 60000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/tr14h/ > $R/trainable_14q.log 2>&1

stop; timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_16q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 16 --eps_per_step 1 \
  --total_steps 12000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/tr16h/ > $R/trainable_16q.log 2>&1

echo done > $R/queue_r3l.done
