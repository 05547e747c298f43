#!/bin/bash
# Serial TPU run queue, round 3 part C — corrected recipes.
# Round-1's winning 8q fixed recipe was 32 replicas + the *rescaled*
# per-env-step epsilon schedule (decays half as fast per iteration as the
# B=64 seed runs): long exploration AND late exploitation.
# Stop mechanism: touch /tmp/stop_r3c (checked between runs); never kill
# the python processes (TPU tunnel wedges on mid-call signals).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3c ] && exit 0 || true; }

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

# 1) 8q fixed, round-1 recipe, seed 1
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 32 --eps_per_step 1 --total_steps 96000 \
  --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/f8c1/ > $R/fixed_8q_v32_s1.log 2>&1

# 2) 8q fixed, round-1 recipe, seed 7
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 7 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 32 --eps_per_step 1 --total_steps 96000 \
  --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/f8c7/ > $R/fixed_8q_v32_s7.log 2>&1

# 3) 10q fixed, same recipe
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
  --vector 32 --eps_per_step 1 --total_steps 64000 \
  --stop_at_error 3.8e-4 --stop_min_successes 1 \
  --results_path $R/f10c/ > $R/fixed_10q_v32.log 2>&1

# 4) Bug-fixed heavy-hex restricted training to threshold (fixed mode,
#    shot-noise config — labeled extension beyond the reference)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2_noise_restricted --experiment_name TensorRL_fixed/ \
  --topology hexagon_full --vector 64 --eps_per_step 1 \
  --total_steps 40000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/hexfull8q/ > $R/fixed_8q_hexfull.log 2>&1

# 5) 8q fixed at reference-equal optimizer budget (gi=1000 accuracy row)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --global_iters 1000 \
  --total_steps 24000 --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/gi1000_8q/ > $R/fixed_8q_gi1000.log 2>&1

# 6) 12q LiH fixed, extended run
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --total_steps 40000 \
  --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

# 7) hexagon_full trainable (+ noisy variant) — restricted-with-rotations
#    beyond-reference demonstrations in the stronger mode
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_trainable/ \
  --topology hexagon_full --vector 64 --eps_per_step 1 \
  --total_steps 48000 --stop_at_error 1.0e-4 --stop_min_successes 50 \
  --results_path $R/hexfulltr/ > $R/trainable_8q_hexfull.log 2>&1

stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2_noise --experiment_name TensorRL_trainable/ \
  --topology hexagon_full --vector 64 --eps_per_step 1 \
  --total_steps 48000 --stop_at_error 1.0e-3 --stop_min_successes 20 \
  --results_path $R/hexfulltrn/ > $R/trainable_8q_hexfull_noise.log 2>&1

echo done > $R/queue_r3c.done
