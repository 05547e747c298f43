"""Block-coordinate trainable mode (EnvConfig.block_coord_k).

The in_state (trainable) mode's per-step cost is dominated by the
embedded TN prefix riding every optimizer iterate (round-4: 0.1 steps/s
at 18q, 4-6x below fixed mode).  block_coord_k freezes the prefix into a
cached statevector for K-1 of every K steps; these tests pin the
transform's exactness and the angle bookkeeping at small n.
"""

import dataclasses

import numpy as np
import pytest

from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.train.config import get_config


def _cfg(block_k=0, n_starts=2, iters=5, config="heisenberg_5q_TNbond2"):
    conf = get_config("TensorRL_trainable/", f"{config}.cfg")
    conf["non_local_opt"]["global_iters"] = iters
    cfg = EnvConfig.from_conf(conf, tn_placement="in_state", seed=3)
    cfg = dataclasses.replace(cfg, n_starts=n_starts, sim_dtype="complex64",
                              block_coord_k=block_k)
    return cfg


def _acts(n):
    return [[n, 0, 1, 2], [0, 1, n, 0], [n, 0, 0, 3], [n, 0, 2, 1],
            [1, 1, n, 0], [n, 0, 3, 2], [n, 0, 1, 1], [2, 1, n, 0]]


def test_masked_prefix_energy_identity():
    """energy(full tape from |0>) == energy(masked tape from prefix state)
    at identical angles — the exactness contract of the frozen transform."""
    env = CircuitEnv(_cfg(block_k=3))
    env.reset()
    n = env.num_qubits
    for a in _acts(n)[:4]:
        env.step(a)
    tape = env._tape(env.state)
    x = tape.x0()

    e_full = env.optimizer.energy(env._psi0(), tape.arrays(), x)

    kind = np.asarray(tape.kind).copy()
    kind[: env._bc_n_gates] = 0
    env._bc_frozen = True
    env._bc_cache = None
    psi_prefix = env.step_psi0()
    e_masked = env.optimizer.energy(
        psi_prefix, (kind, tape.tq, tape.cq, tape.angle_slot), x)
    assert abs(e_full - e_masked) < 5e-5, (e_full, e_masked)


def test_prefix_angles_frozen_then_updated():
    env = CircuitEnv(_cfg(block_k=4))
    env.reset()
    n = env.num_qubits
    n_rots_e = env._bc_n_rots
    assert n_rots_e > 0
    prefix0 = env._tape(env.state).x0()[:n_rots_e].copy()

    # step 0 is a joint step (step_counter starts at 0): prefix may move
    env.step(_acts(n)[0])
    assert not env._bc_frozen
    prefix_after_joint = env._tape(env.state).x0()[:n_rots_e].copy()

    # steps 1..3 are frozen: prefix angles must be bit-identical
    for a in _acts(n)[1:4]:
        env.step(a)
        assert env._bc_frozen
        np.testing.assert_array_equal(
            env._tape(env.state).x0()[:n_rots_e], prefix_after_joint,
            err_msg="frozen step moved the embedded prefix angles")

    # step 4 is joint again and re-optimizes everything jointly
    env.step(_acts(n)[4])
    assert not env._bc_frozen
    assert env._bc_cache is None, "joint step must invalidate the cache"
    del prefix0


@pytest.mark.slow
def test_block_coord_descends_like_joint():
    """Same action script, with and without block_coord: both must track
    the same energy scale (block-coordinate is an optimization schedule,
    not a different objective)."""
    errs = {}
    for k in (0, 3):
        env = CircuitEnv(_cfg(block_k=k, iters=30, n_starts=4))
        env.reset()
        for a in _acts(env.num_qubits):
            env.step(a)
        errs[k] = env.error
    # identical final-step errors are not expected (different schedules);
    # the frozen variant must stay in the same ballpark, not diverge
    assert errs[3] < max(3.0 * errs[0], errs[0] + 0.5), errs


def test_block_coord_rejects_noise():
    with pytest.raises(ValueError):
        CircuitEnv(dataclasses.replace(_cfg(block_k=4),
                                       noise_mode="depolarizing"))


def test_vectorized_block_coord_smoke():
    """Per-env psi0 through the batched path (XLA fallback at 5q)."""
    from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv

    venv = VectorCircuitEnv(_cfg(block_k=2), n_envs=2)
    venv.reset_all()
    n = venv.envs[0].num_qubits
    for a in _acts(n)[:4]:
        _, rewards, dones, infos = venv.step_all([a, a])
        assert np.all(np.isfinite([i["error"] for i in infos]))
    # the two replicas ran the same actions from the same seed-split
    # starts; both must carry valid prefix bookkeeping
    for e in venv.envs:
        assert e._bc_n_rots > 0
