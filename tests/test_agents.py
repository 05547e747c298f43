"""Agent-layer unit tests on a fake counting environment (SURVEY.md
section 4 oracle (5)): masking, n-step folding, PER priorities, target
sync, epsilon schedule, checkpoint round trip."""

import numpy as np
import pytest

from tensorrl_qas_tpu.agents.dqn import DQN, DQN_Nstep, make_agent
from tensorrl_qas_tpu.agents.replay import (
    NStepReplayMemory,
    PrioritizedReplayMemory,
    ReplayMemory,
)


def small_conf(agent_class="DQN", **agent_kw):
    agent = {
        "batch_size": 8, "memory_size": 64, "neurons": [32, 32],
        "dropout": 0.0, "learning_rate": 1e-3, "angles": 0, "en_state": 1,
        "agent_type": "DeepQ", "agent_class": agent_class, "n_step": 3,
        "init_net": 0, "priotitized_replay": 0, "update_target_net": 5,
        "final_gamma": 0.05, "epsilon_decay": 0.9, "epsilon_min": 0.05,
        "epsilon_restart": 1.0,
    }
    agent.update(agent_kw)
    return {"env": {"num_qubits": 3, "num_layers": 4},
            "agent": agent}


def test_nstep_folding():
    gamma = 0.9
    mem = NStepReplayMemory(16, state_size=2, n_step=3, gamma=gamma)
    s = [np.full(2, i, dtype=np.float32) for i in range(5)]
    rewards = [1.0, 2.0, 3.0, 4.0]
    for i in range(4):
        mem.push(s[i], i, rewards[i], s[i + 1], 0.0)
    # first stored transition: (s0, a0, r0 + g r1 + g^2 r2, s3, 0)
    assert len(mem) == 2
    expected = 1.0 + gamma * 2.0 + gamma ** 2 * 3.0
    assert mem.rewards[0] == pytest.approx(expected)
    np.testing.assert_allclose(mem.next_states[0], s[3])


def test_nstep_folding_early_done():
    gamma = 0.9
    mem = NStepReplayMemory(16, state_size=1, n_step=3, gamma=gamma)
    s = [np.full(1, i, dtype=np.float32) for i in range(4)]
    mem.push(s[0], 0, 1.0, s[1], 0.0)
    mem.push(s[1], 1, 5.0, s[2], 1.0)   # done inside the window
    mem.push(s[2], 2, 9.0, s[3], 0.0)
    assert len(mem) == 1
    # reward folds stop at the done: r0 + g*r1 (r2 zeroed by (1-done))
    assert mem.rewards[0] == pytest.approx(1.0 + gamma * 5.0)
    np.testing.assert_allclose(mem.next_states[0], s[2])
    assert mem.dones[0] == 1.0


def test_per_priorities_shift_sampling():
    mem = PrioritizedReplayMemory(32, state_size=1, seed=0, alpha=1.0)
    for i in range(10):
        mem.push(np.full(1, i, np.float32), i, 0.0, np.zeros(1, np.float32),
                 0.0)
    mem.update_priorities(np.arange(10), np.full(10, 1e-6))
    mem.update_priorities(np.array([7]), np.array([100.0]))
    idx, batch, w = mem.sample(64, frame_idx=1)
    assert np.mean(idx == 7) > 0.9  # dominant priority dominates sampling
    assert w.shape == (64,)


def test_uniform_memory_ring():
    mem = ReplayMemory(4, state_size=1, seed=0)
    for i in range(6):
        mem.push(np.full(1, i, np.float32), i, float(i),
                 np.zeros(1, np.float32), 0.0)
    assert len(mem) == 4
    # oldest entries overwritten
    assert set(mem.actions.tolist()) == {2, 3, 4, 5}


def test_dqn_gamma_rounding_and_target_sync():
    conf = small_conf()
    agent = DQN(conf, action_size=6, state_size=3 * 4 * 9, seed=0)
    # reference rounds gamma to 2 decimals (DeepQ.py:55)
    assert agent.gamma == round(0.05 ** (1 / 4), 2)
    rng = np.random.default_rng(0)
    for i in range(20):
        agent.remember(rng.normal(size=agent.state_size).astype(np.float32),
                       int(rng.integers(6)), float(rng.normal()),
                       rng.normal(size=agent.state_size).astype(np.float32),
                       0.0)
    eps0 = agent.epsilon
    loss = agent.replay(8)
    assert isinstance(loss, float)
    assert agent.epsilon == pytest.approx(eps0 * 0.9)
    # training changes policy params but target stays until sync step
    import jax

    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                        agent.params, agent.target_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_agent_checkpoint_roundtrip(tmp_path):
    from tensorrl_qas_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    conf = small_conf("DQN_Nstep")
    agent = make_agent(conf, 6, 3 * 4 * 9, seed=1)
    rng = np.random.default_rng(1)
    for _ in range(30):
        agent.remember(rng.normal(size=agent.state_size).astype(np.float32),
                       int(rng.integers(6)), 0.5,
                       rng.normal(size=agent.state_size).astype(np.float32),
                       0.0)
    agent.replay(8)
    agent.epsilon = 0.42
    save_checkpoint(str(tmp_path / "ck"), agent)

    agent2 = make_agent(conf, 6, 3 * 4 * 9, seed=2)
    load_checkpoint(str(tmp_path / "ck"), agent2)
    assert agent2.epsilon == pytest.approx(0.42)
    assert len(agent2.memory) == len(agent.memory)
    import jax

    for a, b in zip(jax.tree.leaves(agent.params),
                    jax.tree.leaves(agent2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_act_masking_exhaustive():
    conf = small_conf()
    agent = DQN(conf, action_size=6, state_size=3 * 4 * 9, seed=3)
    agent.epsilon = 0.0  # greedy
    state = np.zeros(agent.state_size, dtype=np.float32)
    for illegal in ([0], [0, 1, 2, 3, 4], [5], []):
        a, _ = agent.act(state, illegal)
        assert a not in illegal
    agent.epsilon = 1.0  # exploring
    for _ in range(20):
        a, _ = agent.act(state, [0, 2, 4])
        assert a in (1, 3, 5)


def test_demo_margin_loss_teaches_argmax():
    """DQfD margin term: training on demo-flagged transitions forces the
    demo action's Q above every alternative at the demo state."""
    conf = small_conf()
    agent = DQN(conf, action_size=6, state_size=3 * 4 * 9, seed=0)
    rng = np.random.default_rng(1)
    s_demo = rng.normal(size=agent.state_size).astype(np.float32)
    ns_demo = rng.normal(size=agent.state_size).astype(np.float32)
    a_demo = 3
    # demo-flagged transitions plus background noise transitions
    for _ in range(40):
        agent.remember(s_demo, a_demo, 5.0, ns_demo, 1.0,
                       env_id="demo", is_demo=1.0)
        agent.remember(rng.normal(size=agent.state_size).astype(np.float32),
                       int(rng.integers(6)), float(rng.normal()),
                       rng.normal(size=agent.state_size).astype(np.float32),
                       0.0)
    for _ in range(60):
        agent.replay(16, fetch_loss=False)
    import jax.numpy as jnp
    q = np.asarray(agent._qvals(agent.params, jnp.asarray(s_demo[None])))[0]
    assert int(np.argmax(q)) == a_demo
    # margin actually enforced, not just a tie
    others = np.delete(q, a_demo)
    assert q[a_demo] - others.max() > 0.1
