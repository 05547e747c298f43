#!/bin/bash
# Round 3 queue N — matched-env-step learning-dynamics comparison ON THE
# REAL PROTOCOL PROBLEM (8q H2O fixed): the reference-shape sequential
# loop (1 env, replay every step) vs the 64-replica vectorized loop with
# the rescaled per-env-step epsilon, both at ~15k env-steps.  Extends the
# round-3 5q CPU note (VERDICT r2 weak 7) with hardware-scale evidence.
# Chained after queue_r3m. Stop: touch /tmp/stop_r3n.
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3n ] && exit 0 || true; }

for _ in $(seq 1 960); do
  [ -f $R/queue_r3m.done ] && break
  [ -f /tmp/stop_r3n ] && exit 0
  sleep 30
done

stop; timeout 5400 python -u -m tensorrl_qas_tpu.train.cli --seed 11 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --episodes 370 \
  --results_path $R/dyn_seq/ > $R/dyn_sequential_8q.log 2>&1

stop; timeout 1800 python -u -m tensorrl_qas_tpu.train.cli --seed 11 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --total_steps 15170 \
  --results_path $R/dyn_vec/ > $R/dyn_vectorized_8q.log 2>&1

echo done > $R/queue_r3n.done
