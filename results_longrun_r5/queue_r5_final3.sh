#!/bin/bash
# Round-5 FINAL queue, take 3 — the annealed-exploitation follow-on.
# Take-2's 18q window (rl_18q_final.log) spent 30 min of its 45-min
# timeout on today's pathologically slow tunnel compiles and was killed
# at eps ~0.5 — ramp evidence only.  This continuation rides the
# now-warm persistent cache (same shapes) so setup is minutes, and
# anneals aggressively: passed decay d applies per replay (16/iter), so
# 0.9972 -> per-iter 0.956 -> eps 0.10 ~iter 51, then a long eps_min
# exploitation phase.  DQfD-seeded as before.
# Stop early: touch /tmp/stop_r5f3
set -u
cd /root/repo
R=results_longrun_r5
LOG=$R/onchip.log
echo "=== queue_r5_final3 started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r5f3 ] && echo "r5f3 stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 1 h) for take-2's 18q stage to release the chip
for i in $(seq 360); do
  [ -f $R/stage_a2.done ] && break
  sleep 10
done
echo "=== queue_r5f3 proceeding $(date)" >> "$LOG"

stop
timeout 2700 python -u -m tensorrl_qas_tpu.train.cli --seed 3 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_fixed/ \
  --vector 16 --eps_per_step 1 --replays_per_iter 16 \
  --eps_decay 0.9972 --eps_min 0.05 --init_eps 0.65 --accept_err 1.49 \
  --total_steps 500000 \
  --demo $R/structure_18q_b.json --demo_copies 50 \
  --results_path $R/f18c/ > $R/rl_18q_anneal.log 2>&1
echo "=== 18q RL anneal continuation exit=$? $(date)" >> "$LOG"
touch $R/stage_a3.done

# --- pmul A/B (8q + su4) ---
stop
BENCH_SIZES=8 BENCH_NOISY=0 BENCH_SU4=1 BENCH_REPEATS=1 \
  BENCH_WALL_BUDGET=300 TRLQAS_V2_PMUL=0 TRLQAS_SU4_PMUL=0 \
  timeout 600 python -u bench.py > $R/ab_pmul_off.log 2>&1
echo "=== pmul A/B off-arm exit=$? $(date)" >> "$LOG"
stop
BENCH_SIZES=8 BENCH_NOISY=0 BENCH_SU4=1 BENCH_REPEATS=1 \
  BENCH_WALL_BUDGET=300 TRLQAS_V2_PMUL=1 TRLQAS_SU4_PMUL=1 \
  timeout 600 python -u bench.py > $R/ab_pmul_on.log 2>&1
echo "=== pmul A/B on-arm exit=$? $(date)" >> "$LOG"
python - <<'EOF' > $R/pmul_flags.sh 2>> $LOG
import json
def last_json(path):
    for line in reversed(open(path).read().splitlines()):
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
    print(f"# off 8q={off['value']} on 8q={on['value']} su4 off={s_off} on={s_on}")
except Exception as exc:
    print(f"# A/B decision failed ({exc}); keeping defaults")
EOF
echo "=== pmul decision: $(tr '\n' ' ' < $R/pmul_flags.sh) $(date)" >> "$LOG"
touch $R/stage_ab.done

# --- MXU microbenchmarks (uniform-HIGHEST fix) ---
stop
timeout 700 python -u scripts/probe_mxu_fusion.py --sr 256,1024,4096 --k 16 \
  --iters 100 --out $R/mxu_fusion_fixed.json > $R/mxu_fusion_fixed.log 2>&1
echo "=== mxu probe fixed (128 lanes) exit=$? $(date)" >> "$LOG"
stop
timeout 500 python -u scripts/probe_mxu_fusion.py --sr 64,512 --lanes 256 \
  --k 16 --iters 100 --out $R/mxu_fusion_256_fixed.json \
  > $R/mxu_fusion_256_fixed.log 2>&1
echo "=== mxu probe fixed (256 lanes) exit=$? $(date)" >> "$LOG"
touch $R/stage_c1.done

stop
source $R/pmul_flags.sh 2>/dev/null || true
timeout 700 python -u scripts/roofline.py --out $R/roofline_r5.json \
  > $R/roofline_r5.log 2>&1
echo "=== roofline r5 exit=$? $(date)" >> "$LOG"
touch $R/stage_c2.done

stop
timeout 600 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 --total_steps 1200 \
  > $R/trainable_18q_joint.log 2>&1
echo "=== 18q trainable joint exit=$? $(date)" >> "$LOG"
stop
timeout 600 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 --total_steps 1200 --block_coord 8 \
  > $R/trainable_18q_bc8.log 2>&1
echo "=== 18q trainable block_coord=8 exit=$? $(date)" >> "$LOG"
touch $R/stage_b2.done
echo "=== queue_r5_final3 COMPLETE $(date)" >> "$LOG"
