"""Sequential training driver: episode loop, metrics schema, eval rollout,
checkpoint cadence (reference TensorRL_fixed_noiseless.py semantics)."""

import numpy as np
import pytest

from tensorrl_qas_tpu.agents.dqn import make_agent
from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file
from tensorrl_qas_tpu.train.driver import agent_test, train


def _have_data():
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _have_data(), reason="no data")


def small_conf():
    return {
        "general": {"episodes": 3},
        "env": {"num_qubits": 5, "num_layers": 40, "rand_halt": 0,
                "tn_init": 1, "tn_bond": 2, "zero_param_init": 0,
                "n_shots": 0, "accept_err": 1e-3, "thresholds": [1e-3],
                "switch_episodes": [100000],
                "curriculum_type": "VanillaCurriculum",
                "fn_type": "incremental_with_fixed_ends"},
        "problem": {"ham_type": "heisenberg", "geometry": "0",
                    "mapping": "jordan_wigner"},
        "agent": {"batch_size": 16, "memory_size": 256,
                  "neurons": [32, 32], "dropout": 0.0,
                  "learning_rate": 1e-3, "angles": 0, "en_state": 1,
                  "agent_type": "DeepQNstep", "agent_class": "DQN_Nstep",
                  "n_step": 3, "init_net": 0, "priotitized_replay": 0,
                  "update_target_net": 10, "final_gamma": 0.05,
                  "epsilon_decay": 0.99, "epsilon_min": 0.05,
                  "epsilon_restart": 1.0},
        "non_local_opt": {"global_iters": 10, "method": "scipy_each_step",
                          "optim_alg": "COBYLA"},
    }


def make_env(conf, seed=0):
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=seed)
    cfg.sim_dtype = "complex128"
    cfg.n_starts = 2
    return CircuitEnv(cfg)


def test_train_loop_and_saver_schema(tmp_path):
    conf = small_conf()
    env = make_env(conf)
    agent = make_agent(conf, env.action_size, env.state_size, seed=0)
    saver = train(env, agent, conf, seed=0, output_path=str(tmp_path),
                  episodes=3, checkpoint_every=2, verbose=False)
    blob = np.load(tmp_path / "summary_0.npy", allow_pickle=True).item()
    assert set(blob["train"].keys()) == {0, 1, 2}
    rec = blob["train"][0]
    for key in ("loss", "actions", "errors", "errors_noiseless", "nfev",
                "opt_ang", "time", "save_circ", "reward", "done_threshold"):
        assert key in rec
    assert len(rec["actions"]) == len(rec["errors"]) > 0
    # checkpoints written
    assert (tmp_path / "thresh_0.001_0_agent.msgpack").exists()
    assert (tmp_path / "thresh_0.001_0_replay.npz").exists()
    # events stream
    assert (tmp_path / "events_0.jsonl").exists()


def test_agent_test_greedy_rollout(tmp_path):
    conf = small_conf()
    env = make_env(conf, seed=1)
    agent = make_agent(conf, env.action_size, env.state_size, seed=1)
    from tensorrl_qas_tpu.train.saver import Saver

    saver = Saver(str(tmp_path), 1)
    eps_before = agent.epsilon
    reward, steps, error = agent_test(0, env, agent, conf, saver)
    assert agent.epsilon == eps_before           # restored after greedy eval
    assert steps <= env.num_layers
    assert np.isfinite(error)
    assert len(saver.stats["test"][0]["actions"]) >= 1


@pytest.mark.slow
def test_agent_test_saves_best_per_threshold(tmp_path):
    """First completed eval at a threshold is a best; a later worse one
    must not overwrite it (TensorRL_fixed_noiseless.py:94-98 intent)."""
    conf = small_conf()
    env = make_env(conf, seed=2)
    agent = make_agent(conf, env.action_size, env.state_size, seed=2)
    from tensorrl_qas_tpu.train.saver import Saver

    saver = Saver(str(tmp_path), 2)
    r = agent_test(0, env, agent, conf, saver, output_path=str(tmp_path),
                   threshold=conf["env"]["accept_err"])
    if r[0] is None:
        pytest.skip("rollout did not finish inside layer budget")
    bond = env.current_bond_distance
    best = tmp_path / f"thresh_0.001_2_best_geo_{bond}_agent.msgpack"
    assert best.exists()
    first_mtime = best.stat().st_mtime_ns
    # fake a later, worse eval: inflate the recorded error of episode 1
    saver.new_episode("test", 1)
    saver.append("test", 1, actions=0, errors=1e9, errors_noiseless=1e9,
                 nfev=0, opt_ang=0, time=0.0)
    saver.set("test", 1, done_threshold=env.done_threshold)
    # run a real eval as episode 2; it saves only if it beats episode 0
    err0 = saver.stats["test"][0]["errors"][-1]
    r2 = agent_test(2, env, agent, conf, saver, output_path=str(tmp_path),
                    threshold=conf["env"]["accept_err"])
    if r2[0] is not None and saver.stats["test"][2]["errors"][-1] >= err0:
        assert best.stat().st_mtime_ns == first_mtime


def test_cli_optimizer_budget_overrides():
    """--global_iters/--n_starts flow from the CLI into EnvConfig."""
    from tensorrl_qas_tpu.train.cli import build_parser, infer_modes
    from tensorrl_qas_tpu.train.config import get_config

    args = build_parser().parse_args(
        ["--config", "heisenberg_5q_TNbond2",
         "--experiment_name", "TensorRL_fixed/",
         "--global_iters", "321", "--n_starts", "5"])
    conf = get_config(args.experiment_name, f"{args.config}.cfg")
    if args.global_iters:
        conf["non_local_opt"]["global_iters"] = args.global_iters
    if args.n_starts:
        conf["env"]["n_starts"] = args.n_starts
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=0)
    assert cfg.global_iters == 321
    assert cfg.n_starts == 5
    assert infer_modes("TensorRL_fixed/", "x_noise_restricted")[1:] == (
        "shot", "hexagon")


def test_tn_psi_memoized_across_envs():
    """Fixed-TN warm-start statevector is computed once per (qasm, dtype)
    process-wide — a 64-replica vector env must not pay 64 compiles."""
    from tensorrl_qas_tpu.envs.circuit_env import _TN_PSI_CACHE

    conf = small_conf()
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=0)
    e1 = CircuitEnv(cfg)
    key_count = len(_TN_PSI_CACHE)
    e2 = CircuitEnv(cfg)
    assert len(_TN_PSI_CACHE) == key_count
    assert e1._tn_psi is e2._tn_psi


@pytest.mark.slow
def test_collect_demo_transitions():
    """Demo seeding: a gate list replays into env transitions with the
    trainer's observation pipeline (train/vector_driver.py)."""
    from tensorrl_qas_tpu.envs.circuit_env import EnvConfig
    from tensorrl_qas_tpu.train.config import get_config
    from tensorrl_qas_tpu.train.vector_driver import (
        collect_demo_transitions)

    conf = get_config("TensorRL_fixed/", "heisenberg_5q_TNbond2.cfg")
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=0)
    cfg.use_pallas = "off"
    gates = [[2, 1, -1], [4, 2, 0], [1, 3, -1], [3, 0, -1]]
    trans, final_err = collect_demo_transitions(cfg, conf, gates)
    # 4 gates + 1 appended trailing rotation
    assert len(trans) == 5
    s0, a0, r0, ns0, d0 = trans[0]
    assert s0.shape == ns0.shape
    assert np.isfinite(final_err)
    assert all(np.isfinite(t[2]) for t in trans)
    # the appended action is a rotation id, all ids valid
    from tensorrl_qas_tpu.circuits.actions import action_dictionary
    adict = action_dictionary(5, "all_to_all")
    assert all(0 <= t[1] < len(adict) for t in trans)
