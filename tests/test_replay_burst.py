"""replay_burst (K policy updates in one lax.scan device call) must match
K sequential replay() calls exactly — same parameters, same target-net
sync boundaries, same epsilon/step-counter bookkeeping."""

import numpy as np
import pytest

from tensorrl_qas_tpu.agents.dqn import make_agent
from tests.test_agents import small_conf


def _fill_agent(agent, n=40, seed=0):
    rng = np.random.default_rng(seed)
    ss = agent.state_size
    for i in range(n):
        s = rng.standard_normal(ss).astype(np.float32)
        s2 = rng.standard_normal(ss).astype(np.float32)
        agent.remember(s, int(rng.integers(6)),
                       float(rng.standard_normal()), s2,
                       float(rng.integers(2)))


def _tree_allclose(a, b, atol):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.parametrize("k,pre_steps", [
    (7, 0), pytest.param(6, 3, marks=pytest.mark.slow)])
def test_burst_matches_sequential(k, pre_steps):
    conf = small_conf("DQN_Nstep", update_target_net=3)
    a_seq = make_agent(conf, 6, 3 * 4 * 9, seed=5)
    a_bur = make_agent(conf, 6, 3 * 4 * 9, seed=5)
    _fill_agent(a_seq, seed=1)
    _fill_agent(a_bur, seed=1)
    # advance the step counter so the target-sync boundary falls inside
    # the burst at a non-trivial offset
    a_seq.step_counter = a_bur.step_counter = pre_steps

    for _ in range(k):
        a_seq.replay(conf["agent"]["batch_size"], fetch_loss=False)
    loss = a_bur.replay_burst(conf["agent"]["batch_size"], k)

    assert a_bur.step_counter == a_seq.step_counter
    assert a_bur.epsilon == pytest.approx(a_seq.epsilon, rel=1e-6)
    _tree_allclose(a_bur.params, a_seq.params, atol=1e-6)
    _tree_allclose(a_bur.target_params, a_seq.target_params, atol=1e-6)
    assert np.isfinite(float(loss))


def test_burst_k1_falls_back():
    conf = small_conf("DQN_Nstep")
    a = make_agent(conf, 6, 3 * 4 * 9, seed=2)
    _fill_agent(a, seed=2)
    loss = a.replay_burst(conf["agent"]["batch_size"], 1)
    assert loss is not None
