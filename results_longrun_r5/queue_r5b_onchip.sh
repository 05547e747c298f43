#!/bin/bash
# Round-5 stage b (chained on the 18q RL run releasing the chip):
#   b1. MXU-vs-roll microbenchmark (VERDICT items 2/5 evidence), both the
#       2D-kernel layout (128 lanes) and the composed su4 layout (256).
#   b2. Block-coordinate trainable A/B at 18q (VERDICT item 6): short
#       windows with --block_coord 8 vs reference joint optimization.
#   b3. 10q fixed DQfD with the large-margin supervised loss active
#       (VERDICT item 8): champion-seeded, annealed to the window.
#   b4. 20q annealed multi-episode window on the host-stepped path
#       (VERDICT item 7): cold 2-episode run captures compile time, the
#       main window shows the persistent-cache hit + descending errors.
#       20q warm gap (measured): E0=-34.35601, Emin=-36.00714, gap 1.6511.
# Stop early: touch /tmp/stop_r5b
set -u
cd /root/repo
R=results_longrun_r5
LOG=$R/onchip.log
echo "=== queue_r5b started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r5b ] && echo "r5b stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 4.5 h) for the RL run to release the chip
for i in $(seq 1620); do
  [ -f $R/stage_a2.done ] && break
  sleep 10
done

stop
timeout 1200 python -u scripts/probe_mxu_fusion.py --sr 256,1024,4096 --k 16 \
  --iters 100 --out $R/mxu_fusion.json > $R/mxu_fusion.log 2>&1
echo "=== mxu probe (128 lanes) exit=$? $(date)" >> "$LOG"
timeout 900 python -u scripts/probe_mxu_fusion.py --sr 64,512 --lanes 256 \
  --k 16 --iters 100 --out $R/mxu_fusion_256.json > $R/mxu_fusion_256.log 2>&1
echo "=== mxu probe (256 lanes) exit=$? $(date)" >> "$LOG"
touch $R/stage_b1.done

stop
timeout 1100 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 --total_steps 4000 \
  > $R/trainable_18q_joint.log 2>&1
echo "=== 18q trainable joint exit=$? $(date)" >> "$LOG"
timeout 1100 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 --total_steps 4000 --block_coord 8 \
  > $R/trainable_18q_bc8.log 2>&1
echo "=== 18q trainable block_coord=8 exit=$? $(date)" >> "$LOG"
touch $R/stage_b2.done

stop
timeout 3000 python -u -m tensorrl_qas_tpu.train.cli --seed 5 \
  --config H2O10q_TNbond3 --experiment_name TensorRL_fixed/ \
  --vector 64 --eps_per_step 1 --replays_per_iter 64 \
  --eps_decay 0.99985 \
  --demo results_extracts/structure_search_10q_legal.json --demo_copies 100 \
  --total_steps 150000 --stop_at_error 4.2e-4 --stop_min_successes 1 \
  --results_path $R/f10m/ > $R/fixed_10q_margin.log 2>&1
echo "=== 10q DQfD-margin exit=$? $(date)" >> "$LOG"
touch $R/stage_b3.done

stop
# cold probe: captures the one-off host-stepped body compile time
timeout 1500 python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config heisenberg_20q_TNbond2 --experiment_name TensorRL_fixed/ \
  --episodes 2 --num_layers 34 --global_iters 30 --n_starts 2 --batch_size 96 \
  --eps_decay 0.99 --eps_min 0.1 --accept_err 1.62 \
  --results_path $R/f20cold/ > $R/fixed_20q_cold.log 2>&1
echo "=== 20q cold probe exit=$? $(date)" >> "$LOG"
stop
# annealed window: same shapes => persistent-cache hit; errors should
# descend across episodes as epsilon anneals (0.99^steps, min 0.1)
timeout 4800 python -u -m tensorrl_qas_tpu.train.cli --seed 2 \
  --config heisenberg_20q_TNbond2 --experiment_name TensorRL_fixed/ \
  --episodes 40 --num_layers 34 --global_iters 30 --n_starts 2 --batch_size 96 \
  --eps_decay 0.99 --eps_min 0.1 --accept_err 1.62 \
  --results_path $R/f20/ > $R/fixed_20q_window.log 2>&1
echo "=== 20q annealed window exit=$? $(date)" >> "$LOG"
touch $R/stage_b4.done
echo "=== queue_r5b COMPLETE $(date)" >> "$LOG"
