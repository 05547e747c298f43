#!/bin/bash
# Round-5 restart queue (host rebooted 2026-08-20 00:17 UTC, killing
# queue_r5a at iter 20 of the 18q RL train and orphaning queue_r5b).
# One chained script so the single chip is never contended:
#   0. TPU health gate (first post-reboot compile was observed to hang)
#   a1. MXU-vs-roll microbenchmark, 128 + 256 lane layouts (VERDICT
#       items 2/5 evidence; the probe's ANY->VMEM fix is committed)
#   a2. THE headline run — annealed DQfD-seeded 18q fixed-mode RL
#       training with a reachable success threshold (VERDICT item 1)
#   b2. block-coordinate trainable A/B at 18q (VERDICT item 6)
#   b3. 10q fixed DQfD with large-margin supervised loss (item 8)
#   b4. 20q cold-probe + annealed window (item 7)
# Stop early: touch /tmp/stop_r5
set -u
cd /root/repo
R=results_longrun_r5
LOG=$R/onchip.log
echo "=== queue_r5_restart started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r5 ] && echo "r5 stopped by flag $(date)" >> "$LOG" && exit 0; }

# --- 0. health gate: retry a tiny on-chip matmul until it completes ---
for i in $(seq 30); do
  timeout 600 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); print(float((x @ x).sum()))" \
    > $R/health.log 2>&1 && break
  echo "=== health probe $i failed, retrying $(date)" >> "$LOG"
  sleep 60
done
echo "=== health gate passed $(date)" >> "$LOG"

stop
timeout 1200 python -u scripts/probe_mxu_fusion.py --sr 256,1024,4096 --k 16 \
  --iters 100 --out $R/mxu_fusion.json > $R/mxu_fusion.log 2>&1
echo "=== mxu probe (128 lanes) exit=$? $(date)" >> "$LOG"
timeout 900 python -u scripts/probe_mxu_fusion.py --sr 64,512 --lanes 256 \
  --k 16 --iters 100 --out $R/mxu_fusion_256.json > $R/mxu_fusion_256.log 2>&1
echo "=== mxu probe (256 lanes) exit=$? $(date)" >> "$LOG"
touch $R/stage_b1.done

# --- a1b. step-level pmul A/B: the production fused step (8q 2D kernel
# + su4 composed kernel + 12q 2D kernel) with the permutation-matmul
# lane exchanges off vs on.  Decides the flag for the 18q headline run
# and the BENCH_r05 defaults.
stop
BENCH_SIZES=8,12 BENCH_NOISY=0 BENCH_SU4=1 BENCH_REPEATS=1 \
  BENCH_WALL_BUDGET=900 TRLQAS_V2_PMUL=0 TRLQAS_SU4_PMUL=0 \
  timeout 1000 python -u bench.py > $R/ab_pmul_off.log 2>&1
echo "=== pmul A/B off-arm exit=$? $(date)" >> "$LOG"
BENCH_SIZES=8,12 BENCH_NOISY=0 BENCH_SU4=1 BENCH_REPEATS=1 \
  BENCH_WALL_BUDGET=900 TRLQAS_V2_PMUL=1 TRLQAS_SU4_PMUL=1 \
  timeout 1000 python -u bench.py > $R/ab_pmul_on.log 2>&1
echo "=== pmul A/B on-arm exit=$? $(date)" >> "$LOG"
python - <<'EOF' > $R/pmul_flags.sh 2>> $LOG
import json, re
def last_json(path):
    txt = open(path).read()
    for line in reversed(txt.splitlines()):
        if line.startswith('{'):
            return json.loads(line)
    return None
try:
    off = last_json('results_longrun_r5/ab_pmul_off.log')
    on = last_json('results_longrun_r5/ab_pmul_on.log')
    v2 = on['value'] > off['value'] * 1.02
    s_on = on['extra_sizes'].get('8q_su4', {}).get('steps_per_sec', 0)
    s_off = off['extra_sizes'].get('8q_su4', {}).get('steps_per_sec', 1e9)
    su4 = s_on > s_off * 1.02
    print(f"export TRLQAS_V2_PMUL={int(v2)}")
    print(f"export TRLQAS_SU4_PMUL={int(su4)}")
    print(f"# off 8q={off['value']} on 8q={on['value']} "
          f"su4 off={s_off} on={s_on}")
except Exception as exc:
    print(f"# A/B decision failed ({exc}); keeping defaults")
EOF
echo "=== pmul decision: $(cat $R/pmul_flags.sh | tr '\n' ' ') $(date)" >> "$LOG"
touch $R/stage_ab.done

stop
source $R/pmul_flags.sh 2>/dev/null || true
# headline 18q RL train: eps anneals inside the window (per-replay decay
# 0.9999 -> rescaled 0.9996, eps hits 0.1 ~iter 360 at 16 replays/iter);
# demo-seeded with the mask-legal evolutionary champion (1.487 < warm gap
# 1.5297); success threshold 1.49 = clearly below the gap
timeout 13200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 16 --eps_per_step 1 --replays_per_iter 16 \
  --eps_decay 0.9999 --eps_min 0.05 --accept_err 1.49 \
  --total_steps 500000 \
  --demo $R/structure_18q_b.json --demo_copies 50 \
  --results_path $R/f18/ > $R/rl_18q.log 2>&1
echo "=== 18q RL train exit=$? $(date)" >> "$LOG"
touch $R/stage_a2.done

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
echo "=== queue_r5_restart COMPLETE $(date)" >> "$LOG"
