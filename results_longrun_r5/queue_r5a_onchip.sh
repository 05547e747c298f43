#!/bin/bash
# Round-5 stage a: MXU-vs-roll kernel microbenchmark (VERDICT r4 items
# 2/5 evidence), then THE round-5 headline run — annealed DQfD-seeded
# 18q fixed-mode RL training with a reachable success threshold:
#   - epsilon_decay 0.9999 with B=16 / replays_per_iter=16 => per-iter
#     decay 0.9984: epsilon hits 0.1 ~iter 1440, inside the window
#   - --demo: the mask-legal evolutionary champion (structure_18q_b.json,
#     1.487 vs warm gap 1.5297) seeds replay with +5-terminal transitions
#   - --accept_err 1.49: success = landing clearly below the warm gap
# Stop early: touch /tmp/stop_r5a
set -u
cd /root/repo
R=results_longrun_r5
LOG=$R/onchip.log
echo "=== queue_r5a started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r5a ] && echo "r5a stopped by flag $(date)" >> "$LOG" && exit 0; }

stop
timeout 900 python -u scripts/probe_mxu_fusion.py --sr 256,1024,4096 --k 16 \
  --iters 100 --out $R/mxu_fusion.json > $R/mxu_fusion.log 2>&1
echo "=== mxu probe exit=$? $(date)" >> "$LOG"
touch $R/stage_a1.done

stop
timeout 14400 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 16 --eps_per_step 1 --replays_per_iter 16 \
  --eps_decay 0.9999 --eps_min 0.05 --accept_err 1.49 \
  --total_steps 500000 \
  --demo $R/structure_18q_b.json --demo_copies 50 \
  --results_path $R/f18/ > $R/rl_18q.log 2>&1
echo "=== 18q RL train exit=$? $(date)" >> "$LOG"
touch $R/stage_a2.done
echo "=== queue_r5a COMPLETE $(date)" >> "$LOG"
