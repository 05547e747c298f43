#!/bin/bash
# Round 3 queue J — chained after queue_r3i (waits for its .done marker):
#   1) 20-qubit training demo on the REAL chip (single-chip adjoint path)
#   2) quiet-chip roofline refresh (min-of-5 timing, post-dispatch kernels)
#   3) su4-gateset training-to-threshold at 8q (beyond-reference accuracy row)
#   4) final multi-size bench on the dispatch kernels
# Detached via setsid; stop: touch /tmp/stop_r3j (checked between runs).
set -u
cd /root/repo
R=results_longrun_r3
stop() { [ -f /tmp/stop_r3j ] && exit 0 || true; }

# wait (up to 8 h) for queue I to finish so the chip is quiet
for _ in $(seq 1 960); do
  [ -f $R/queue_r3i.done ] && break
  [ -f /tmp/stop_r3j ] && exit 0
  sleep 30
done

# 1) 20q training on the real chip, single-chip XLA adjoint path
stop; timeout 3600 python -u scripts/demo_20q_training.py --mesh none \
  --episodes 2 --global_iters 20 --n_starts 4 \
  --out $R/demo20q_tpu.json > $R/demo20q_tpu.log 2>&1

# 2) roofline refresh (quiet chip, min-of-5)
stop; timeout 3600 python -u scripts/roofline.py --sizes 8,10,12,14 \
  --out $R/roofline_dispatch.json > $R/roofline_dispatch.log 2>&1

# 3) su4 training-to-threshold at 8q (XLA engine; mode the reference never wired)
stop; timeout 10800 python -u -m tensorrl_qas_tpu.train.cli --seed 1 \
  --config H2O8q_TNbond2 --experiment_name TensorRL_trainable/ \
  --gate_set su4 --vector 64 --eps_per_step 1 \
  --total_steps 30000 --stop_at_error 1.6e-3 --stop_min_successes 5 \
  --results_path $R/su4_8q/ > $R/su4_8q.log 2>&1

# 4) final bench artifact on the dispatch kernels
stop; timeout 3600 python -u bench.py > $R/bench_r3_final.json 2> $R/bench_r3_final.log

echo done > $R/queue_r3j.done
