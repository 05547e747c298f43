#!/bin/bash
# Round 3 queue G — remainder of queues E+F after the session restart:
#   E5) 8q fixed at reference-equal optimizer budget (gi=1000) — accuracy row
#   E4) 12q LiH fixed extended at reference update ratio
#   E6) hexagon_full trainable + E7) noisy variant
#   F1-F5) flagship in-state rows regenerated under Rayleigh-normalized
#          numerics (8q/6q trainable+structure, 10q trainable)
# Detached via setsid; stop: touch /tmp/stop_r3g (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3g ] && exit 0 || true; }

# E5: short — the dangling RESULTS promise ("gi=1000 accuracy run below")
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --global_iters 1000 \
  --total_steps 16000 --stop_at_error 8.5e-4 --stop_min_successes 1 \
  --results_path $R/gi1000_8q/ > $R/fixed_8q_gi1000.log 2>&1

# E6/E7: hexagon_full trainable rows (bug-fixed heavy-hex)
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

# F1/F2: 8q flagship rows under normalized numerics
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

# E4: 12q fixed extended (longest — after the short high-value items)
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 40000 --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

# F3: 10q trainable regeneration
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_trainable/ \
  --vector 64 --eps_per_step 1 \
  --total_steps 80000 --stop_at_error 1.0e-4 --stop_min_successes 50 \
  --results_path $R/tr10f/ > $R/trainable_10q_r3.log 2>&1

# F4/F5: 6q rows under normalized numerics
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

echo done > $R/queue_r3g.done
