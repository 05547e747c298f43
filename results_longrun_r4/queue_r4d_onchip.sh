#!/bin/bash
# Round-4 stage-a rerun + stage d: the 09:31 validate run predated the
# start-chunking fix (commit 5392c74) that targets exactly the 17q S=8
# register-spill OOM it died on.  Rerun 17q/18q validation with the fix,
# then the 18q trainable training run (stage d, never started).
# Stop early: touch /tmp/stop_r4
set -u
cd /root/repo
R=results_longrun_r4
LOG=$R/onchip.log
echo "=== queue_r4d started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r4 ] && echo "stopped by flag $(date)" >> "$LOG" && exit 0; }

stop
timeout 3600 python scripts/validate_v3plus.py > $R/v3plus_validate_r4d.log 2>&1
echo "=== validate(r4d) exit=$? $(date)" >> "$LOG"
touch $R/stage_a2.done

stop
timeout 7200 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config heisenberg_18q_TNbond2 --experiment_name TensorRL_trainable/ \
  --vector 8 --eps_per_step 1 \
  --total_steps 8000 --stop_at_error 1.0e-3 --stop_min_successes 10 \
  --results_path $R/tr18h/ > $R/trainable_18q.log 2>&1
echo "=== 18q train exit=$? $(date)" >> "$LOG"
touch $R/stage_d.done
echo "=== queue_r4d COMPLETE $(date)" >> "$LOG"
