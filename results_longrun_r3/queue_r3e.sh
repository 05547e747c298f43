#!/bin/bash
# Serial TPU run queue, round 3 part D — full reference protocol.
# Diagnosis trail (probe_random_fixed + CPU replay re-optimization):
# the 1.07e-3 fixed-mode floor is circuit-structure-limited, not
# optimizer-precision-limited; and our vectorized runs at
# replays_per_iter=1 train the policy with B-times fewer updates per
# env-step than the reference's replay-every-step loop.  This queue runs
# fixed mode at the reference update ratio (replays_per_iter=B) and the
# full 10k-episode budget.
# Stop: touch /tmp/stop_r3e (checked between runs); never kill pythons.
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3e ] && exit 0 || true; }

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

# 1) 8q fixed, TIGHT threshold (accept_err 1.0e-3): landing-depth
#    experiment — episodes continue past the shipped 1.6e-3 success point
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2_tight --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 256000 --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/f8t/ > $R/fixed_8q_tight.log 2>&1

# 2) 10q fixed, same recipe (capped budget, early stop at a clear beat)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 128000 --stop_at_error 3.8e-4 --stop_min_successes 1 \
  --results_path $R/f10d/ > $R/fixed_10q_rpi64.log 2>&1

# 3) Bug-fixed heavy-hex restricted training to threshold (fixed mode)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2_noise_restricted --experiment_name TensorRL_fixed/ \
  --topology hexagon_full --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 48000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/hexfull8q/ > $R/fixed_8q_hexfull.log 2>&1

# 4) 12q LiH fixed, extended run at the reference update ratio
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 40000 --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

# 5) 8q fixed at reference-equal optimizer budget (gi=1000 accuracy row;
#    CPU replay probe predicts no change — this documents it on-TPU)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --global_iters 1000 \
  --total_steps 16000 --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/gi1000_8q/ > $R/fixed_8q_gi1000.log 2>&1

# 6) hexagon_full trainable (+ noisy variant)
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

echo done > $R/queue_r3e.done
