#!/bin/bash
# Round-5 stage c (chained on queue_r5_restart's stage_b4.done):
#   c1. re-run the MXU microbenchmarks with the uniform-HIGHEST fix
#       (commit d9fec7c) so mxu1q/mxu2q/fused1q actually measure —
#       the VERDICT item-2 evidence either way (win or hardware
#       refutation), at both kernel lane layouts.
#   c2. roofline re-probe with the winning pmul flags (utilization
#       evidence for the 40%-of-peak target or its refutation).
# Stop early: touch /tmp/stop_r5
set -u
cd /root/repo
R=results_longrun_r5
LOG=$R/onchip.log
echo "=== queue_r5c started $(date)" >> "$LOG"

stop() { [ -f /tmp/stop_r5 ] && echo "r5c stopped by flag $(date)" >> "$LOG" && exit 0; }

# wait (max 8 h) for the main restart queue to finish
for i in $(seq 2880); do
  [ -f $R/stage_b4.done ] && break
  sleep 10
done
echo "=== queue_r5c proceeding $(date)" >> "$LOG"

stop
timeout 1800 python -u scripts/probe_mxu_fusion.py --sr 256,1024,4096 --k 16 \
  --iters 100 --out $R/mxu_fusion_fixed.json > $R/mxu_fusion_fixed.log 2>&1
echo "=== mxu probe fixed (128 lanes) exit=$? $(date)" >> "$LOG"
timeout 1200 python -u scripts/probe_mxu_fusion.py --sr 64,512 --lanes 256 \
  --k 16 --iters 100 --out $R/mxu_fusion_256_fixed.json \
  > $R/mxu_fusion_256_fixed.log 2>&1
echo "=== mxu probe fixed (256 lanes) exit=$? $(date)" >> "$LOG"
touch $R/stage_c1.done

stop
source $R/pmul_flags.sh 2>/dev/null || true
timeout 1800 python -u scripts/roofline.py --out $R/roofline_r5.json \
  > $R/roofline_r5.log 2>&1
echo "=== roofline r5 exit=$? $(date)" >> "$LOG"
touch $R/stage_c2.done
echo "=== queue_r5c COMPLETE $(date)" >> "$LOG"
