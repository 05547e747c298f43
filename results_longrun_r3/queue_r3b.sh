#!/bin/bash
# Serial TPU run queue, round 3 part B. Waits for the live seed4 run
# (pid $1) to exit, then drives the remaining published-row attacks.
set -u
cd /root/repo
R=results_longrun_r3

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1) 8q fixed, round-1-style slow exploration schedule (per-replay eps
#    decay, 32 replicas) — reclaim the published 8.9e-4 row.
timeout 1500 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 32 --eps_per_step 0 --total_steps 96000 \
  --stop_at_error 1.0e-4 --stop_min_successes 1 \
  --results_path $R/slow8q/ > $R/fixed_8q_slow.log 2>&1

# 2) 10q fixed, same slow schedule — published 4.1e-4.
timeout 3000 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
  --vector 32 --eps_per_step 0 --total_steps 64000 \
  --stop_at_error 3.5e-4 --stop_min_successes 1 \
  --results_path $R/slow10q/ > $R/fixed_10q_slow.log 2>&1

# 3) Bug-fixed heavy-hex restricted training to threshold (labeled
#    extension beyond the reference's CNOT-only shipped table).
timeout 2400 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2_noise_restricted --experiment_name TensorRL_fixed/ \
  --topology hexagon_full --vector 64 --eps_per_step 1 \
  --total_steps 40000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/hexfull8q/ > $R/fixed_8q_hexfull.log 2>&1

# 4) 8q fixed at the reference-equal optimizer budget (accuracy side of
#    the global_iters sensitivity row).
timeout 1800 python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --global_iters 1000 \
  --total_steps 24000 --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/gi1000_8q/ > $R/fixed_8q_gi1000.log 2>&1

# 5) 12q LiH fixed, extended run — solidify the short-run edge.
timeout 4200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --total_steps 40000 \
  --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

echo done > $R/queue_r3b.done
