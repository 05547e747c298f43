#!/bin/bash
# Round-4 stage e: 20q single-chip demo retry (the 11:33 crash predates
# the gather-free slice engine, commit e36f72a, which replaces the 36s
# scalar-core gathers that killed the worker), then the 18q FIXED-mode
# training run (trainable mode carries the TN tape in-state and ran 4x
# slower than the fused-step rate; fixed mode compiles psi0 once).
# Stop early: touch /tmp/stop_r4
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4e started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4 ] && echo "stopped by flag $(date)" >> "$LOG" && exit 0; }

stop
timeout 2400 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 2 --global_iters 20 --n_starts 2 \
  --out $R/demo20q_chip_slice.json > $R/demo20q_chip_slice.log 2>&1
echo "=== demo20q (slice, no mesh) exit=$? $(date)" >> "$LOG"
touch $R/stage_e1.done

stop
timeout 14400 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 20000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/f18h/ > $R/fixed_18q.log 2>&1
echo "=== 18q fixed train exit=$? $(date)" >> "$LOG"
touch $R/stage_e2.done
echo "=== queue_r4e COMPLETE $(date)" >> "$LOG"
