#!/bin/bash
# Round 3 queue H — reordered remainder after queue G's early stop:
#   1) hexagon_full trainable (+noisy) rows
#   2) 10q fixed mask-legal structure search (is sub-4.1e-4 reachable?)
#   3) conditional DQfD-seeded 10q fixed RL run using the champion
#   4) flagship in-state regenerations under normalized numerics
#   5) 12q fixed extended; 10q/6q regenerations
#   6) lost-artifact regeneration: roofline.json, bench_iters1000.json
# Detached via setsid; stop: touch /tmp/stop_r3h (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3h ] && exit 0 || true; }

# wait for queue G to exit (it stops after its current run)
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

# 1) hexagon_full trainable rows (bug-fixed heavy-hex)
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

# 2) 10q fixed reachability: mask-legal evolutionary search inside the
#    episode budget (80 gates; cap 40 — the published circuit is 32)
stop; python -u scripts/structure_search.py \
  --config H2O10q_TNbond3 --pop 64 --gens 2500 \
  --min_gates 12 --max_gates 40 --mask_legal 1 \
  --target 3.9e-4 --stall_restart 200 --seed 1 \
  --out $R/structure_search_10q_legal.json \
  > $R/structure_search_10q_legal.log 2>&1

# 3) DQfD-seeded 10q fixed RL run, only if the search found a beat
stop
if python - << 'EOF'
import json, sys
try:
    j = json.load(open("results_longrun_r3/structure_search_10q_legal.json"))
except Exception:
    sys.exit(1)
sys.exit(0 if j.get("polished_err", 1.0) < 4.0e-4 else 1)
EOF
then
  python -u -m tensorrl_qas_tpu.train.cli --seed 3 \
    --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
    --vector 64 --eps_per_step 1 --replays_per_iter 64 \
    --demo $R/structure_search_10q_legal.json --demo_copies 40 \
    --total_steps 64000 --stop_at_error 3.9e-4 --stop_min_successes 1 \
    --results_path $R/f10demo/ > $R/fixed_10q_demo.log 2>&1
fi

# 4) 8q flagship rows under normalized numerics
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

# 5) 12q fixed extended at the reference update ratio
stop; python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config LIH12q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --total_steps 40000 --stop_at_error 1.5e-2 --stop_min_successes 1 \
  --results_path $R/fixed12q_ext/ > $R/fixed_12q_ext.log 2>&1

# 10q trainable + 6q regenerations
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

# 6) regenerate the reset-lost citation artifacts
stop; python -u scripts/roofline.py --out $R/roofline.json \
  > $R/roofline.log 2>&1
stop; BENCH_GLOBAL_ITERS=1000 BENCH_SIZES=8 BENCH_NOISY=0 \
  python -u bench.py > $R/bench_iters1000.json 2> $R/bench_iters1000.log
stop; BENCH_N_ENVS=128 BENCH_SIZES=8 BENCH_NOISY=0 \
  python -u bench.py > $R/bench_nenvs_128.json 2> $R/bench_nenvs_128.log

echo done > $R/queue_r3h.done
