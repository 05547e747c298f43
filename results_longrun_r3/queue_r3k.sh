#!/bin/bash
# Round 3 queue K — chained after queue_r3j: remaining regenerations
# under normalized numerics (10q StructureRL) on the quiet chip.
# Detached via setsid; stop: touch /tmp/stop_r3k (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3k ] && exit 0 || true; }

for _ in $(seq 1 960); do
  [ -f $R/queue_r3j.done ] && break
  [ -f /tmp/stop_r3k ] && exit 0
  sleep 30
done

stop; timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond2 --experiment_name StructureRL/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 80000 --stop_at_error 1.0e-4 --stop_min_successes 50 \
  --results_path $R/st10f/ > $R/structure_10q_r3.log 2>&1

echo done > $R/queue_r3k.done
