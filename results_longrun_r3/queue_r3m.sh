#!/bin/bash
# Round 3 queue M — multi-seed robustness for the flagship in-state rows
# (the long-run tables are single-seed; these pin seed-to-seed variance
# with the early-stop criteria so each run releases the chip quickly).
# Chained after queue_r3l. Stop: touch /tmp/stop_r3m.
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3m ] && exit 0 || true; }

for _ in $(seq 1 720); do
  [ -f $R/queue_r3l.done ] && break
  [ -f /tmp/stop_r3m ] && exit 0
  sleep 30
done

for SEED in 2 3 4; do
  stop; timeout 3600 python -u -m tensorrl_qas_tpu.train.cli --seed $SEED \
    --config H2O8q_TNbond2 --experiment_name TensorRL_trainable/ \
    --vector 64 --eps_per_step 1 \
    --total_steps 120000 --stop_at_error 1.9e-4 --stop_min_successes 200 \
    --results_path $R/tr8f_seeds/ > $R/trainable_8q_seed$SEED.log 2>&1
done

stop; timeout 5400 python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 80000 --stop_at_error 2.5e-4 --stop_min_successes 100 \
  --results_path $R/tr10f_seeds/ > $R/trainable_10q_seed2.log 2>&1

echo done > $R/queue_r3m.done
