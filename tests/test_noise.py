"""Noise model tests: trajectory statistics vs exact Kraus channel oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation
from tensorrl_qas_tpu.sim.noise import apply_tape_depolarizing, shot_noise

I2 = np.eye(2)
PAULIS = [I2,
          np.array([[0, 1], [1, 0]], dtype=complex),
          np.array([[0, -1j], [1j, 0]], dtype=complex),
          np.array([[1, 0], [0, -1]], dtype=complex)]


def kron_1q(u, q, n):
    ops = [I2] * n
    ops[n - 1 - q] = u
    out = ops[0]
    for o in ops[1:]:
        out = np.kron(out, o)
    return out


def depolarize_1q(rho, q, p, n):
    out = (1 - p) * rho
    for k in range(1, 4):
        m = kron_1q(PAULIS[k], q, n)
        out = out + (p / 3) * (m @ rho @ m.conj().T)
    return out


def depolarize_2q(rho, qa, qb, p, n):
    out = (1 - p) * rho
    for ka in range(4):
        for kb in range(4):
            if ka == 0 and kb == 0:
                continue
            m = kron_1q(PAULIS[ka], qa, n) @ kron_1q(PAULIS[kb], qb, n)
            out = out + (p / 15) * (m @ rho @ m.conj().T)
    return out


def cnot_matrix(ctrl, targ, n):
    dim = 1 << n
    m = np.zeros((dim, dim), dtype=complex)
    for i in range(dim):
        j = i ^ (1 << targ) if (i >> ctrl) & 1 else i
        m[j, i] = 1.0
    return m


def test_trajectory_mean_matches_kraus_channel():
    """Mean over many sampled trajectories must converge to the exact
    density-matrix (Kraus) evolution — statistical parity with qulacs'
    probabilistic noise gates (SURVEY.md hard part #5)."""
    n = 3
    p1, p2 = 0.15, 0.25  # large probabilities for a strong statistical test
    tape = GateTape(n, 4, 4)
    tape.add(GateKind.RY, target=0, angle=0.7)
    tape.add_cx(0, 1)
    tape.add(GateKind.RX, target=2, angle=-1.1)
    tape.add_cx(1, 2)

    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    dev = ps.device_arrays(jnp.complex128)

    # exact channel evolution (dense oracle)
    dim = 1 << n
    rho = np.zeros((dim, dim), dtype=complex)
    rho[0, 0] = 1.0
    ry = np.cos(0.35) * I2 - 1j * np.sin(0.35) * PAULIS[2]
    rx = np.cos(-0.55) * I2 - 1j * np.sin(-0.55) * PAULIS[1]
    for u, kind in [(kron_1q(ry, 0, n), ("rot", 0)),
                    (cnot_matrix(0, 1, n), ("cx", 0, 1)),
                    (kron_1q(rx, 2, n), ("rot", 2)),
                    (cnot_matrix(1, 2, n), ("cx", 1, 2))]:
        rho = u @ rho @ u.conj().T
        if kind[0] == "rot":
            rho = depolarize_1q(rho, kind[1], p1, n)
        else:
            rho = depolarize_2q(rho, kind[1], kind[2], p2, n)
    e_exact = float(np.real(np.trace(ps.to_dense() @ rho)))

    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0())

    @jax.jit
    def one(k):
        psi = apply_tape_depolarizing(zero_state(n, jnp.complex128), *arrs,
                                      x, k, p1, p2)
        return pauli_expectation(psi, *dev)

    n_traj = 6000
    keys = jax.random.split(jax.random.PRNGKey(0), n_traj)
    es = jax.vmap(one)(keys)
    mean = float(jnp.mean(es))
    sem = float(jnp.std(es)) / np.sqrt(n_traj)
    assert abs(mean - e_exact) < 5 * sem + 1e-3, (mean, e_exact, sem)


def test_noiseless_limit():
    n = 2
    tape = GateTape(n, 2, 2)
    tape.add(GateKind.RY, 0, angle=0.5)
    tape.add_cx(0, 1)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0())
    psi_n = apply_tape_depolarizing(zero_state(n, jnp.complex128), *arrs, x,
                                    jax.random.PRNGKey(1), 0.0, 0.0)
    psi = apply_tape(zero_state(n, jnp.complex128), *arrs, x)
    np.testing.assert_allclose(np.asarray(psi_n), np.asarray(psi), atol=1e-12)


def test_shot_noise_statistics():
    w = jnp.asarray(np.ones(10))
    n_shots = 100
    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    samples = jax.vmap(lambda k: shot_noise(w, n_shots, k))(keys)
    # variance = |w|^2 / n_shots = 10/100 = 0.1
    assert float(jnp.mean(samples)) == pytest.approx(0.0, abs=0.03)
    assert float(jnp.var(samples)) == pytest.approx(0.1, rel=0.15)


def _have_data():
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
        return True
    except FileNotFoundError:
        return False


@pytest.mark.skipif(not _have_data(), reason="no data")
@pytest.mark.slow
def test_noisy_env_step():
    """Depolarizing env mode: energies are stochastic but bounded; the env
    runs end-to-end (reference environment_qulacs_noise capability)."""
    cfg = EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=15, n_starts=2,
        noise_mode="depolarizing", sim_dtype="complex128", seed=5)
    env = CircuitEnv(cfg)
    env.reset()
    from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
    acts = all_to_all_actions(5)
    _, rwd, done = env.step(acts[22])
    assert env.error_noiseless == env.error  # reference: both slots noisy
    assert np.isfinite(env.energy)
    # shot-noise mode
    cfg2 = EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=15, n_starts=2,
        noise_mode="shot", n_shots=1000, sim_dtype="complex128", seed=6)
    env2 = CircuitEnv(cfg2)
    env2.reset()
    _, rwd2, _ = env2.step(acts[22])
    assert np.isfinite(env2.energy)
