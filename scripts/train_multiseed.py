"""Multi-seed training launcher.

The reference's experimental protocol runs many ``--seed`` jobs by hand
(``README.md:61``).  This launcher runs S seeds as parallel worker
processes (each seed is an independent training run; on multi-chip hosts
set one JAX device per worker via round-robin device pinning).

Usage:
  python scripts/train_multiseed.py --seeds 0 1 2 3 \
      --config heisenberg_5q_TNbond2 --experiment_name TensorRL_fixed/ \
      --episodes 100
"""

import argparse
import pathlib
import subprocess
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--max_parallel", type=int, default=4)
    args, passthrough = p.parse_known_args()

    repo = pathlib.Path(__file__).resolve().parents[1]
    procs = []
    results = {}
    pending = list(args.seeds)
    while pending or procs:
        while pending and len(procs) < args.max_parallel:
            seed = pending.pop(0)
            cmd = [sys.executable, "-m", "tensorrl_qas_tpu.train.cli",
                   "--seed", str(seed)] + passthrough
            print("launch:", " ".join(cmd), flush=True)
            procs.append((seed, subprocess.Popen(cmd, cwd=repo)))
        seed, proc = procs.pop(0)
        rc = proc.wait()
        results[seed] = rc
        print(f"seed {seed} exited with {rc}", flush=True)
    bad = {s: rc for s, rc in results.items() if rc != 0}
    if bad:
        print("FAILED seeds:", bad)
        return 1
    print("all seeds completed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
