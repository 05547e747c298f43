"""Env-level oracle: along a random trajectory, every energy the env
reports must match the independent C++ engine on the same circuit."""

import numpy as np
import pytest

from tensorrl_qas_tpu import native
from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file


def _ready():
    if not native.available():
        return False
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _ready(), reason="csim or data missing")


def test_env_energy_matches_csim_along_trajectory():
    cfg = EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=25, n_starts=2,
        sim_dtype="complex128", seed=9)
    env = CircuitEnv(cfg)
    eng = native.CsimEngine(env.problem.pauli)
    env.reset()
    acts = all_to_all_actions(5)
    rng = np.random.default_rng(3)
    psi0 = env._tn_psi.astype(np.complex128)

    for _ in range(8):
        ill = env.illegal_action_new()
        legal = [a for a in range(env.action_size) if a not in ill]
        _, _, done = env.step(acts[int(rng.choice(legal))])
        tape = env._tape(env.state)
        e_csim = eng.tape_energy(psi0, *tape.arrays(), tape.x0())
        assert env.energy == pytest.approx(e_csim, abs=1e-9)
        if done:
            break
