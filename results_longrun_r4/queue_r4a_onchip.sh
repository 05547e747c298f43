#!/bin/bash
# Round-4 on-chip program (VERDICT r3 item 2): the round-3 queue that the
# tunnel outage killed, consolidated and run first thing while the tunnel
# is up.  Stages (chained, each leaves a .done flag):
#   a) validate_v3plus.py       — 17q/18q mega-kernel on real hardware
#   b) full bench 8..18q        — measured 18q steps/s row for extra_sizes
#   c) 20q training on the chip — degenerate (1,1) mesh + single-chip adjoint
#   d) 18q trainable training   — error trajectory at the top of the band
# Stop early: touch /tmp/stop_r4
set -u
cd /root/repo
R=results_longrun_r4
mkdir -p $R
LOG=$R/onchip.log
echo "=== queue_r4a started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4 ] && echo "stopped by flag $(date)" >> "$LOG" && exit 0; }

stop
timeout 3600 python scripts/validate_v3plus.py > $R/v3plus_validate.log 2>&1
echo "=== validate exit=$? $(date)" >> "$LOG"
touch $R/stage_a.done

stop
BENCH_SIZES=8,10,12,14,16,18 BENCH_WALL_BUDGET=5200 timeout 5400 \
  python bench.py > $R/bench_r4a.json 2> $R/bench_r4a.log
echo "=== bench exit=$? $(date)" >> "$LOG"
touch $R/stage_b.done

stop
timeout 5400 python scripts/demo_20q_training.py --mesh 1,1 \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out $R/demo20q_chip.json > $R/demo20q_chip.log 2>&1
echo "=== demo20q (1,1 mesh) exit=$? $(date)" >> "$LOG"
stop
timeout 5400 python scripts/demo_20q_training.py --mesh none \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out $R/demo20q_chip_nomesh.json > $R/demo20q_nomesh.log 2>&1
echo "=== demo20q (no mesh, adjoint) exit=$? $(date)" >> "$LOG"
touch $R/stage_c.done

stop
timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 8000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/tr18h/ > $R/trainable_18q.log 2>&1
echo "=== 18q train exit=$? $(date)" >> "$LOG"
touch $R/stage_d.done
echo "=== queue_r4a COMPLETE $(date)" >> "$LOG"
