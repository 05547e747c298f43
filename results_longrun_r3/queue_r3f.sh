#!/bin/bash
# Round 3 queue F — regenerate flagship in-state rows under the
# Rayleigh-normalized numerics (round-3 fix) so every quoted table row
# has an f64-verifiable summary artifact.  Waits for queue E.
# Stop: touch /tmp/stop_r3f (checked between runs); never kill pythons.
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3f ] && exit 0 || true; }

while [ ! -f $R/queue_r3e.done ]; do
  [ -f /tmp/stop_r3f ] && exit 0
  sleep 30
done

# 1) 8q H2O trainable (flagship BASELINE row)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 120000 --stop_at_error 5.0e-5 --stop_min_successes 200 \
  --results_path $R/tr8f/ > $R/trainable_8q_r3.log 2>&1

# 2) 8q H2O StructureRL
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name StructureRL/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 120000 --stop_at_error 5.0e-5 --stop_min_successes 200 \
  --results_path $R/st8f/ > $R/structure_8q_r3.log 2>&1

# 3) 10q H2O trainable (chi=3)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 80000 --stop_at_error 1.0e-4 --stop_min_successes 50 \
  --results_path $R/tr10f/ > $R/trainable_10q_r3.log 2>&1

# 4) 6q BeH2 trainable + StructureRL (quick)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config BEH26q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 60000 --stop_at_error 1.0e-5 --stop_min_successes 200 \
  --results_path $R/tr6f/ > $R/trainable_6q_r3.log 2>&1

stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config BEH26q_TNbond2 --experiment_name StructureRL/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 60000 --stop_at_error 1.0e-5 --stop_min_successes 200 \
  --results_path $R/st6f/ > $R/structure_6q_r3.log 2>&1

echo done > $R/queue_r3f.done
