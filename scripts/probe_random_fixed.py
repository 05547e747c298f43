"""Diagnostic: what does PURE RANDOM exploration achieve in fixed mode?

Round 1 reported 1.65e-5 Ha at 8q H2O fixed within 736 episodes under a
near-random schedule; round-3 runs plateau at the warm-start error during
their random phase.  This probe replays random episodes through the
current CircuitEnv and reports the best error per engine, to isolate
whether the regression is in the optimizer path (XLA vs mega-kernel) or
in the env/run protocol.

Usage: python scripts/probe_random_fixed.py [--engine off|auto|on] \
          [--episodes 20] [--iters 100] [--n_starts 8] [--seed 0] [--cpu]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--engine", default="off")
    p.add_argument("--episodes", type=int, default=20)
    p.add_argument("--iters", type=int, default=0,
                   help="override global_iters (0 = config value)")
    p.add_argument("--n_starts", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--experiment", default="TensorRL_fixed/")
    p.add_argument("--config", default="H2O8q_TNbond2")
    args = p.parse_args()

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        from tensorrl_qas_tpu.utils.compcache import apply_platform_env
        apply_platform_env()
    import numpy as np

    from tensorrl_qas_tpu.circuits.actions import action_dictionary
    from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.train.config import get_config

    conf = get_config(args.experiment, args.config + ".cfg")
    if args.iters:
        conf["non_local_opt"]["global_iters"] = args.iters
    if args.n_starts:
        conf["env"]["n_starts"] = args.n_starts
    cfg = EnvConfig.from_conf(conf, seed=args.seed)
    cfg.use_pallas = args.engine
    env = CircuitEnv(cfg)
    translate = action_dictionary(cfg.num_qubits, cfg.topology,
                                  gate_set=cfg.gate_set)
    rng = np.random.default_rng(args.seed)

    best = float("inf")
    t0 = time.time()
    for ep in range(args.episodes):
        env.reset()
        done = False
        while not done:
            illegal = set(env.illegal_action_new())
            legal = [a for a in range(env.action_size) if a not in illegal]
            a = int(rng.choice(legal))
            _, _, done = env.step(translate[a], train_flag=True)
            err = float(env.error)
            if err < best:
                best = err
                print(f"ep {ep}: new best {best:.3e}", flush=True)
        if (ep + 1) % 5 == 0:
            print(f"ep {ep + 1}/{args.episodes}: best {best:.3e} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"FINAL best_error={best:.6e} engine={args.engine} "
          f"iters={conf['non_local_opt']['global_iters']} "
          f"starts={conf['env'].get('n_starts', 8)}")


if __name__ == "__main__":
    main()
