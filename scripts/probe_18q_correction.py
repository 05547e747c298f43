"""Probe: can ANY correction circuit descend below the fixed-mode
warm-start gap at large n?

Round-4 finding: 18q fixed-mode exploration windows bottomed out at
exactly the warm-start gap (1.5297 for heisenberg_18q_TNbond2) — random
gates re-optimized to zero rotation angles recover the warm level but
never improve it.  Before committing hours to an annealed training run
(VERDICT r4 item 1), this probe answers the prerequisite question: does a
*deliberate* correction sequence (brickwork CNOT+rotation layers — the
natural bond-dimension-raising pattern on a chain) improve the energy
below the gap, and at what optimizer budget (global_iters x n_starts x
restart_scale)?

Scripted sequences use the production env step-by-step (same legality,
same optimize-before-append ordering — reference
``environment_qulacs.py:220-228``), so whatever this probe finds, RL can
replay.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def brickwork_actions(n: int, n_layers: int, axes=(2,)) -> list[list[int]]:
    """CNOT(i,i+1) brick + rotations on both legs, even/odd alternating.

    axes: rotation axes to apply on each leg after the CNOT (1=rx, 2=ry,
    3=rz).  RY-only keeps the state real (the heisenberg ground state is
    real), RY+RZ is the generic choice.
    """
    acts = []
    for layer in range(n_layers):
        start = layer % 2
        for i in range(start, n - 1, 2):
            acts.append([i, 1, n, 0])  # CNOT ctrl=i targ=i+1
            for ax in axes:
                acts.append([n, 0, i, ax])
                acts.append([n, 0, i + 1, ax])
    return acts


def random_actions(n: int, steps: int, rng) -> list[list[int]]:
    from tensorrl_qas_tpu.circuits.actions import all_to_all_actions

    adict = all_to_all_actions(n)
    return [adict[int(rng.integers(len(adict)))] for _ in range(steps)]


def run_sequence(env, acts, max_steps) -> dict:
    errors = []
    t0 = time.time()
    for i, a in enumerate(acts[:max_steps]):
        env.step(a, train_flag=True)
        errors.append(float(env.error))
        if i % 5 == 0:
            print(f"  step {i}: error {env.error:.6e} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    return {"errors": errors, "min_error": min(errors), "wall_s":
            time.time() - t0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="heisenberg_18q_TNbond2")
    ap.add_argument("--experiment_name", default="TensorRL_fixed/")
    ap.add_argument("--global_iters", type=int, default=100)
    ap.add_argument("--n_starts", type=int, default=4)
    ap.add_argument("--restart_scale", type=float, default=0.1)
    ap.add_argument("--adam_lr", type=float, default=0.0)
    ap.add_argument("--seq", default="brickwork_ry",
                    choices=["brickwork_ry", "brickwork_ryz", "random"])
    ap.add_argument("--layers", type=int, default=2,
                    help="brickwork layers for scripted sequences")
    ap.add_argument("--steps", type=int, default=0,
                    help="cap on env steps (0 = whole sequence / budget)")
    ap.add_argument("--num_layers", type=int, default=0)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from tensorrl_qas_tpu.utils.compcache import (
        apply_platform_env, enable_compilation_cache)
    apply_platform_env()
    enable_compilation_cache()

    from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.train.config import get_config

    conf = get_config(args.experiment_name, f"{args.config}.cfg")
    if args.num_layers:
        conf["env"]["num_layers"] = args.num_layers
    conf["non_local_opt"]["global_iters"] = args.global_iters
    conf["env"]["n_starts"] = args.n_starts
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=args.seed)
    cfg = dataclasses.replace(cfg, restart_scale=args.restart_scale)
    if args.adam_lr:
        cfg = dataclasses.replace(cfg, adam_lr=args.adam_lr)
    cfg.sim_dtype = "complex64"
    env = CircuitEnv(cfg)
    env.reset()
    n = cfg.num_qubits
    gap = abs(env.prev_energy - env.min_eig)
    print(f"n={n} warm gap {gap:.6e}  budget {env.num_layers_termination} "
          f"steps  iters={args.global_iters} starts={args.n_starts} "
          f"rscale={args.restart_scale}", flush=True)

    if args.seq == "brickwork_ry":
        acts = brickwork_actions(n, args.layers, axes=(2,))
    elif args.seq == "brickwork_ryz":
        acts = brickwork_actions(n, args.layers, axes=(2, 3))
    else:
        acts = random_actions(n, args.steps or env.num_layers_termination,
                              np.random.default_rng(args.seed))
    max_steps = args.steps or env.num_layers_termination
    res = run_sequence(env, acts, max_steps)
    res.update({"warm_gap": gap, "seq": args.seq,
                "global_iters": args.global_iters,
                "n_starts": args.n_starts,
                "restart_scale": args.restart_scale,
                "improved": res["min_error"] < gap * 0.999})
    print(json.dumps({k: v for k, v in res.items() if k != "errors"}),
          flush=True)
    print(f"RESULT: min_error {res['min_error']:.6e} vs gap {gap:.6e} "
          f"-> {'IMPROVED' if res['improved'] else 'no improvement'}",
          flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f)


if __name__ == "__main__":
    main()
