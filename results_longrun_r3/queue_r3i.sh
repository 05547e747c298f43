#!/bin/bash
# Round 3 queue I — remainder after the kernel-dispatch commit (4aebfad),
# so every run below rides the specialized per-gate dispatch:
#   1) 12q fixed extended at the reference update ratio (unbeaten row)
#   2) 8q flagship regenerations under normalized numerics
#   3) 10q trainable + 6q regenerations
#   4) optimizer-budget and batch bench artifacts
# Detached via setsid; stop: touch /tmp/stop_r3i (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3i ] && exit 0 || true; }

# 1) 12q fixed extended at the reference update ratio
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 40000 --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

# 2) 8q flagship rows under normalized numerics
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 120000 --stop_at_error 5.0e-5 --stop_min_successes 200 \
  --results_path $R/tr8f/ > $R/trainable_8q_r3.log 2>&1

stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name StructureRL/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 120000 --stop_at_error 5.0e-5 --stop_min_successes 200 \
  --results_path $R/st8f/ > $R/structure_8q_r3.log 2>&1

# 3) 10q trainable + 6q regenerations
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 80000 --stop_at_error 1.0e-4 --stop_min_successes 50 \
  --results_path $R/tr10f/ > $R/trainable_10q_r3.log 2>&1

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

# 4) bench artifacts on the dispatch kernel
stop; BENCH_GLOBAL_ITERS=1000 BENCH_SIZES=8 BENCH_NOISY=0 \
  python -u bench.py > $R/bench_iters1000.json 2> $R/bench_iters1000.log
stop; BENCH_N_ENVS=128 BENCH_SIZES=8 BENCH_NOISY=0 \
  python -u bench.py > $R/bench_nenvs_128.json 2> $R/bench_nenvs_128.log

echo done > $R/queue_r3i.done
