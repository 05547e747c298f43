"""Vectorized env: batched device phase must equal per-env stepping."""

import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv
from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file


def _have_data():
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _have_data(), reason="no data")


def make_cfg(**kw):
    return EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=20, n_starts=2,
        sim_dtype="complex128", seed=11, **kw)


@pytest.mark.slow
def test_vector_env_steps_all_replicas():
    venv = VectorCircuitEnv(make_cfg(), n_envs=4)
    obs = venv.reset_all()
    assert obs.shape == (4, 40 * 5 * 8)
    acts = all_to_all_actions(5)
    actions = [acts[20], acts[21], acts[0], acts[25]]
    obs2, rewards, dones, infos = venv.step_all(actions)
    assert obs2.shape == obs.shape
    assert rewards.shape == (4,)
    assert all(np.isfinite(i["energy"]) for i in infos)
    # replicas stepped independently: different actions -> different obs
    assert not np.array_equal(obs2[0], obs2[2])


def test_vector_env_matches_single_env():
    """Replica 0 of the vector env must produce the same energies as a
    standalone env given identical seeds and actions (determinism of the
    batched fused call up to PRNG stream, which we align by construction)."""
    cfg = make_cfg()
    env = CircuitEnv(cfg)
    venv = VectorCircuitEnv(cfg, n_envs=2)
    env.reset()
    venv.reset_all()
    acts = all_to_all_actions(5)
    # same action on both; deterministic optimizer start 0 = warm start, and
    # with n_starts>1 results depend on PRNG: compare within optimizer noise
    _, r1, _ = env.step(acts[20])
    _, rv, _, infos = venv.step_all([acts[20], acts[20]])
    assert infos[0]["energy"] == pytest.approx(env.energy, abs=0.05)
    # both replicas got the same action and the same psi0: close energies
    assert infos[0]["energy"] == pytest.approx(infos[1]["energy"], abs=0.05)


@pytest.mark.slow
def test_vector_env_auto_reset():
    venv = VectorCircuitEnv(make_cfg(rand_halt=0), n_envs=2)
    venv.reset_all()
    acts = all_to_all_actions(5)
    rng = np.random.default_rng(0)
    done_seen = False
    for _ in range(venv.envs[0].num_layers_termination + 2):
        ills = venv.illegal_actions()
        actions = []
        for ill in ills:
            legal = [a for a in range(venv.action_size) if a not in ill]
            actions.append(acts[int(rng.choice(legal))])
        obs, rewards, dones, infos = venv.step_all(actions)
        if dones.any():
            done_seen = True
            # auto-reset: replica is at step -1 again
            for i in np.nonzero(dones)[0]:
                assert venv.envs[i].step_counter == -1
            break
    assert done_seen


@pytest.mark.slow
def test_act_batch_respects_masks():
    from tensorrl_qas_tpu.agents.dqn import make_agent
    from tensorrl_qas_tpu.train.config import get_config

    conf = get_config("TensorRL_fixed/", "heisenberg_5q_TNbond2.cfg")
    cfg = make_cfg()
    env = CircuitEnv(cfg)
    agent = make_agent(conf, env.action_size, env.state_size, seed=0)
    agent.epsilon = 0.5
    b = 6
    states = np.random.default_rng(0).normal(
        size=(b, agent.state_size)).astype(np.float32)
    illegal = [[0, 1, 2], [], [5], list(range(30)), [7, 8], [34]]
    for trial in range(5):
        actions, explore = agent.act_batch(states, illegal)
        for i, ill in enumerate(illegal):
            assert actions[i] not in ill


@pytest.mark.slow
def test_vector_env_noise_mode():
    """Vectorized stepping with depolarizing noise on the XLA batched path
    (the kernel path is covered by tests/test_noise_pallas.py)."""
    venv = VectorCircuitEnv(make_cfg(noise_mode="depolarizing",
                                     use_pallas="off"), n_envs=2)
    venv.reset_all()
    acts = all_to_all_actions(5)
    obs, rewards, dones, infos = venv.step_all([acts[20], acts[0]])
    assert all(np.isfinite(i["energy"]) for i in infos)
    # noisy env reports the noisy value in both slots (reference quirk)
    assert venv.envs[0].error == venv.envs[0].error_noiseless


def test_device_replay_per_path():
    """PER + device-resident replay: priority updates shift sampling."""
    from tensorrl_qas_tpu.agents.dqn import DQN

    conf = {"env": {"num_qubits": 3, "num_layers": 4},
            "agent": {"batch_size": 8, "memory_size": 64,
                      "neurons": [16], "dropout": 0.0,
                      "learning_rate": 1e-3, "angles": 0, "en_state": 0,
                      "priotitized_replay": 1, "update_target_net": 5,
                      "final_gamma": 0.05, "epsilon_decay": 0.9,
                      "epsilon_min": 0.05, "device_replay": 1}}
    agent = DQN(conf, action_size=6, state_size=3 * 4 * 9, seed=0)
    rng = np.random.default_rng(0)
    for i in range(30):
        agent.remember(rng.normal(size=agent.state_size).astype(np.float32),
                       int(rng.integers(6)), float(rng.normal()),
                       rng.normal(size=agent.state_size).astype(np.float32),
                       0.0)
    loss = agent.replay(8)
    assert isinstance(loss, float)
    # priorities were updated from TD errors (no longer all equal)
    pri = agent.memory.priorities[: agent.memory.size]
    assert pri.std() > 0


@pytest.mark.slow
def test_train_vectorized_writes_summary_npy(tmp_path):
    """The vectorized trainer must produce the sequential driver's full
    artifact set: reference-schema summary_<seed>.npy (episodes in
    completion order), events jsonl, checkpoint."""
    from tensorrl_qas_tpu.agents.dqn import make_agent
    from tensorrl_qas_tpu.train.vector_driver import train_vectorized

    conf = {
        "general": {"episodes": 2},
        "agent": {"batch_size": 8, "memory_size": 128, "neurons": [32],
                  "dropout": 0.0, "learning_rate": 1e-3, "angles": 0,
                  "en_state": 1, "agent_type": "DeepQ",
                  "agent_class": "DQN", "init_net": 0,
                  "priotitized_replay": 0, "update_target_net": 10,
                  "final_gamma": 0.05, "epsilon_decay": 0.99,
                  "epsilon_min": 0.05, "epsilon_restart": 1.0},
        "env": {"num_qubits": 5, "num_layers": 40, "accept_err": 1e-3},
    }
    venv = VectorCircuitEnv(make_cfg(), n_envs=3)
    agent = make_agent(conf, venv.action_size, venv.state_size, seed=0)
    # enough steps that at least one replica finishes an episode
    # (episodes cap at num_layers_termination+1 steps)
    budget = 3 * (venv.envs[0].num_layers_termination + 2)
    summary = train_vectorized(venv, agent, conf, seed=0,
                               output_path=str(tmp_path),
                               total_env_steps=budget, verbose=False)
    assert summary["episodes"] >= 1
    blob = np.load(tmp_path / "summary_0.npy", allow_pickle=True).item()
    assert len(blob["train"]) == summary["episodes"]
    rec = blob["train"][0]
    for key in ("loss", "actions", "errors", "errors_noiseless", "nfev",
                "opt_ang", "time", "save_circ", "reward",
                "done_threshold"):
        assert key in rec
    assert len(rec["actions"]) == len(rec["errors"]) > 0
    assert (tmp_path / "events_0.jsonl").exists()
    assert (tmp_path / "vec_0_agent.msgpack").exists()
    # round-5 learning-trend telemetry: per-episode error streams in the
    # returned summary and rolling medians in the event stream
    assert len(summary["ep_final_errors"]) == summary["episodes"]
    assert len(summary["ep_best_errors"]) == summary["episodes"]
    assert summary["ep_best_errors"][0] == pytest.approx(
        min(blob["train"][0]["errors"]))
    assert np.isfinite(summary["warm_start_gap"])
    import json as _json

    events = [_json.loads(ln) for ln in open(tmp_path / "events_0.jsonl")]
    assert any("ep_best_med20" in e for e in events)
    assert all("epsilon" in e for e in events)


@pytest.mark.slow
def test_train_vectorized_early_stop_and_eps_rescale(tmp_path):
    """The early-stop criteria and the per-env-step epsilon rescale gate
    every multi-seed RESULTS row — pin both behaviors.

    With ``stop_at_error`` set above any reachable error and
    ``stop_min_successes=0``, the loop must end at the first completed
    episode rather than exhausting the step budget; ``eps_per_step`` must
    rescale ``epsilon_decay`` to ``decay ** (B / replays_per_iter)``; and
    the events stream must carry the intra-episode ``best_step_error``
    alongside the episode-final ``best_error``."""
    import json as _json

    from tensorrl_qas_tpu.agents.dqn import make_agent
    from tensorrl_qas_tpu.train.vector_driver import train_vectorized

    conf = {
        "general": {"episodes": 2},
        "agent": {"batch_size": 8, "memory_size": 128, "neurons": [32],
                  "dropout": 0.0, "learning_rate": 1e-3, "angles": 0,
                  "en_state": 1, "agent_type": "DeepQ",
                  "agent_class": "DQN", "init_net": 0,
                  "priotitized_replay": 0, "update_target_net": 10,
                  "final_gamma": 0.05, "epsilon_decay": 0.99,
                  "epsilon_min": 0.05, "epsilon_restart": 1.0},
        "env": {"num_qubits": 5, "num_layers": 40, "accept_err": 1e-3},
    }
    n_envs = 3
    venv = VectorCircuitEnv(make_cfg(), n_envs=n_envs)
    agent = make_agent(conf, venv.action_size, venv.state_size, seed=0)
    budget = 10 * (venv.envs[0].num_layers_termination + 2)
    summary = train_vectorized(venv, agent, conf, seed=0,
                               output_path=str(tmp_path),
                               total_env_steps=budget, verbose=False,
                               stop_at_error=1e6, stop_min_successes=0)
    # stopped at the first iteration with a finished episode, not the budget
    assert summary["episodes"] >= 1
    assert summary["steps"] < budget
    # epsilon_decay rescaled for B env-steps per replay (default
    # eps_per_step=True, replays_per_iter=1)
    assert agent.epsilon_decay == pytest.approx(0.99 ** n_envs)
    events = [_json.loads(line)
              for line in (tmp_path / "events_0.jsonl").read_text()
              .splitlines()]
    assert events, "events stream empty"
    last = events[-1]
    assert "best_step_error" in last and "best_error" in last
    # the intra-episode best can only be <= the episode-final best
    assert last["best_step_error"] <= last["best_error"]
