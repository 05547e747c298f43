"""Command-line entry point.

Reproduces the reference invocation shape (``python3 <script>.py --seed N
--config NAME --experiment_name DIR/`` — ``TensorRL_fixed_noiseless.py:
185-192``) with one script instead of five: the algorithm mode that the
reference encodes in the choice of entry file (TensorRL fixed / trainable /
StructureRL x noiseless / noisy / restricted) is inferred from the
experiment/config names, overridable with explicit flags.  The reference's
interactive device prompt (``TensorRL_fixed_noiseless.py:203-216``) is
replaced by automatic JAX device selection (TPU when present).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

from tensorrl_qas_tpu.agents.dqn import make_agent
from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.train.checkpoint import load_checkpoint
from tensorrl_qas_tpu.train.config import get_config
from tensorrl_qas_tpu.train.driver import train


def infer_modes(experiment_name: str, config_name: str):
    """Map the reference's entry-script choice onto (tn_placement,
    noise_mode, topology) flags — see SURVEY.md section 2.3 capability
    matrix."""
    exp = experiment_name.lower()
    cfgn = config_name.lower()
    tn_placement = "fixed" if "fixed" in exp else "in_state"
    if "restricted" in cfgn or "restricted" in exp:
        noise_mode = "shot"
        topology = "hexagon"
    elif "noise" in cfgn or "noise" in exp:
        noise_mode = "depolarizing"
        topology = "all_to_all"
    else:
        noise_mode = "none"
        topology = "all_to_all"
    return tn_placement, noise_mode, topology


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="trlqas",
        description="TPU-native TensorRL-QAS training driver")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--config", type=str, default="heisenberg_5q_TNbond2",
                   help="config file name without .cfg")
    p.add_argument("--experiment_name", type=str, default="TensorRL_fixed/",
                   help="config family directory (with trailing slash)")
    p.add_argument("--gpu_id", type=int, default=0,
                   help="accepted for reference CLI compatibility; unused")
    p.add_argument("--episodes", type=int, default=None,
                   help="override [general] episodes")
    p.add_argument("--tn_placement", choices=["fixed", "in_state"],
                   default=None)
    p.add_argument("--noise", choices=["none", "depolarizing", "shot"],
                   default=None)
    p.add_argument("--topology",
                   choices=["all_to_all", "hexagon", "hexagon_full"],
                   default=None)
    p.add_argument("--gate_set", choices=["cnot", "su4"], default=None,
                   help="su4 = RXX/RYY/RZZ two-qubit rotations instead of "
                        "CNOTs (the reference's vestigial SU(4) action set)")
    p.add_argument("--optim", choices=["adam", "cobyla"], default=None,
                   help="per-step angle optimizer (default: adam on device)")
    p.add_argument("--results_path", type=str, default="results/")
    p.add_argument("--test_every", type=int, default=0,
                   help="greedy eval rollout cadence (0 = off)")
    p.add_argument("--stop_on_success", type=int, default=0,
                   help="stop after N successful episodes (0 = run all)")
    p.add_argument("--sim_dtype", type=str, default="auto")
    p.add_argument("--vector", type=int, default=0,
                   help="run the vectorized trainer with N env replicas "
                        "(0 = reference-style sequential episodes)")
    p.add_argument("--total_steps", type=int, default=0,
                   help="env-step budget for the vectorized trainer "
                        "(default: episodes x num_layers)")
    p.add_argument("--replays_per_iter", type=int, default=1,
                   help="replay train steps per vectorized iteration (the "
                        "reference's sequential loop replays once per env "
                        "step; with N replicas, N keeps that data ratio)")
    p.add_argument("--eps_per_step", type=int, default=1,
                   help="vectorized mode: rescale epsilon_decay so epsilon "
                        "follows the reference's per-env-step schedule "
                        "(DeepQ.py:134-137) regardless of replica count")
    p.add_argument("--global_iters", type=int, default=0,
                   help="override [non_local_opt] global_iters (per-step "
                        "optimizer iterations; 0 = use config)")
    p.add_argument("--n_starts", type=int, default=0,
                   help="override the multi-start count of the per-step "
                        "angle optimizer (0 = default 8)")
    p.add_argument("--stop_at_error", type=float, default=0.0,
                   help="vectorized mode: stop early once best_error is at "
                        "or below this AND --stop_min_successes episodes "
                        "succeeded (0 = run the full step budget)")
    p.add_argument("--stop_min_successes", type=int, default=0)
    p.add_argument("--demo", type=str, default="",
                   help="vectorized mode: JSON file with a demonstration "
                        "gate list (e.g. a structure_search champion) to "
                        "seed the replay buffer with (DQfD-style)")
    p.add_argument("--demo_copies", type=int, default=20)
    p.add_argument("--num_layers", type=int, default=0,
                   help="override [env] num_layers (episode gate budget; "
                        "shorter budgets at large n give faster episodes "
                        "and denser learning signal; 0 = use config)")
    p.add_argument("--eps_decay", type=float, default=0.0,
                   help="override [agent] epsilon_decay — needed when a "
                        "wall-bounded window is much shorter than the "
                        "reference's 10k-episode schedule, so the anneal "
                        "actually completes inside the window (0 = config)")
    p.add_argument("--eps_min", type=float, default=-1.0,
                   help="override [agent] epsilon_min (<0 = use config)")
    p.add_argument("--init_eps", type=float, default=-1.0,
                   help="override [agent] init_epsilon, the exploration "
                        "rate at step 0 (<0 = use config / 1.0); lets a "
                        "continuation window resume an annealed schedule "
                        "without re-burning the pure-exploration ramp")
    p.add_argument("--accept_err", type=float, default=0.0,
                   help="override [env] accept_err AND the curriculum "
                        "thresholds with one value (bounded windows at "
                        "large n: a reachable success threshold gives the "
                        "agent usable +5 terminal rewards; the reference's "
                        "chemical-accuracy thresholds are unreachable "
                        "there)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="override [agent] batch_size (bounded sequential "
                        "windows at large n never fill the reference's "
                        "1000-sample minimum before the window closes)")
    p.add_argument("--block_coord", type=int, default=0,
                   help="trainable (in_state) mode: re-optimize the "
                        "embedded TN block only every K-th step; frozen "
                        "steps carry only the RL correction tape on a "
                        "cached prefix statevector (0 = reference joint "
                        "optimization every step)")
    return p


def main(argv=None) -> int:
    from tensorrl_qas_tpu.utils.compcache import (
        apply_platform_env,
        enable_compilation_cache,
    )

    apply_platform_env()
    enable_compilation_cache()
    args = build_parser().parse_args(argv)

    conf = get_config(args.experiment_name, f"{args.config}.cfg")
    tn_placement, noise_mode, topology = infer_modes(args.experiment_name,
                                                     args.config)
    if args.tn_placement:
        tn_placement = args.tn_placement
    if args.noise:
        noise_mode = args.noise
    if args.topology:
        topology = args.topology
    conf["env"]["topology"] = topology
    if args.gate_set:
        conf["env"]["gate_set"] = args.gate_set

    np.random.seed(args.seed)

    if args.global_iters:
        conf["non_local_opt"]["global_iters"] = args.global_iters
    if args.n_starts:
        conf["env"]["n_starts"] = args.n_starts
    if args.num_layers:
        conf["env"]["num_layers"] = args.num_layers
    if args.eps_decay:
        conf["agent"]["epsilon_decay"] = args.eps_decay
    if args.eps_min >= 0.0:
        conf["agent"]["epsilon_min"] = args.eps_min
    if args.init_eps >= 0.0:
        conf["agent"]["init_epsilon"] = args.init_eps
    if args.block_coord:
        conf["env"]["block_coord_k"] = args.block_coord
    if args.batch_size:
        conf["agent"]["batch_size"] = args.batch_size
    if args.accept_err:
        conf["env"]["accept_err"] = args.accept_err
        conf["env"]["thresholds"] = [args.accept_err]
    env_cfg = EnvConfig.from_conf(conf, tn_placement=tn_placement,
                                  noise_mode=noise_mode, seed=args.seed,
                                  optim_alg=args.optim)
    env_cfg.sim_dtype = args.sim_dtype

    if args.vector:
        from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv
        from tensorrl_qas_tpu.train.vector_driver import train_vectorized

        venv = VectorCircuitEnv(env_cfg, n_envs=args.vector)
        agent = make_agent(conf, venv.action_size, venv.state_size,
                           seed=args.seed)
        demo_transitions = None
        if args.demo:
            from tensorrl_qas_tpu.train.vector_driver import \
                collect_demo_transitions
            spec = json.load(open(args.demo))
            gates = spec["gates"] if isinstance(spec, dict) else spec
            demo_transitions, demo_err = collect_demo_transitions(
                env_cfg, conf, gates)
            print(f"demo episode: {len(demo_transitions)} transitions, "
                  f"final error {demo_err:.3e}", flush=True)
        output_path = f"{args.results_path}{args.experiment_name}{args.config}"
        pathlib.Path(output_path).mkdir(parents=True, exist_ok=True)
        episodes = args.episodes or conf["general"]["episodes"]
        total = args.total_steps or episodes * env_cfg.num_layers
        summary = train_vectorized(venv, agent, conf, args.seed, output_path,
                                   total_env_steps=total,
                                   replays_per_iter=args.replays_per_iter,
                                   eps_per_step=bool(args.eps_per_step),
                                   stop_at_error=args.stop_at_error,
                                   stop_min_successes=args.stop_min_successes,
                                   demo_transitions=demo_transitions,
                                   demo_copies=args.demo_copies)
        print(json.dumps(summary), flush=True)
        return 0

    env = CircuitEnv(env_cfg)
    agent = make_agent(conf, env.action_size, env.state_size, seed=args.seed)

    output_path = f"{args.results_path}{args.experiment_name}{args.config}"
    pathlib.Path(output_path).mkdir(parents=True, exist_ok=True)

    if conf["agent"].get("init_net"):
        prefix = (f"results/finalize/{args.config}/"
                  f"thresh_{conf['env']['accept_err']}_{args.seed}")
        load_checkpoint(prefix, agent, env)
        if not conf["agent"].get("epsilon_restart"):
            agent.epsilon = agent.epsilon_min

    print(json.dumps({
        "config": args.config, "experiment": args.experiment_name,
        "seed": args.seed, "tn_placement": tn_placement,
        "noise_mode": noise_mode, "topology": topology,
        "optim": env_cfg.optim_alg, "n_qubits": env_cfg.num_qubits,
        "num_layers": env_cfg.num_layers,
        "action_size": env.action_size, "state_size": env.state_size,
    }), flush=True)

    train(env, agent, conf, args.seed, output_path,
          episodes=args.episodes, test_every=args.test_every,
          stop_on_success=args.stop_on_success)
    return 0


if __name__ == "__main__":
    sys.exit(main())
