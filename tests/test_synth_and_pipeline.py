"""KAK synthesis + warm-start pipeline tests."""

import numpy as np
import pytest

from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.synth.kak import (
    CX01,
    closest_unitary,
    decompose_su4,
    kron,
    makhlin_invariants,
    rx,
    ry,
    rz,
    zyz_angles,
)


def random_su4(rng):
    from scipy.stats import unitary_group

    return unitary_group.rvs(4, random_state=rng)


def test_zyz_reconstruction():
    rng = np.random.default_rng(0)
    from scipy.stats import unitary_group

    for _ in range(20):
        u = unitary_group.rvs(2, random_state=rng)
        alpha, a, b, c = zyz_angles(u)
        rec = np.exp(1j * alpha) * (rz(a) @ ry(b) @ rz(c))
        np.testing.assert_allclose(rec, u, atol=1e-10)
    # edge: diagonal and anti-diagonal
    for u in (np.diag([1, 1j]), np.array([[0, 1], [-1, 0]], dtype=complex)):
        alpha, a, b, c = zyz_angles(u)
        rec = np.exp(1j * alpha) * (rz(a) @ ry(b) @ rz(c))
        np.testing.assert_allclose(rec, u, atol=1e-10)


def test_decompose_su4_random():
    rng = np.random.default_rng(2)
    for _ in range(15):
        u = random_su4(rng)
        gates, phase = decompose_su4(u, 0, 1)   # verification built-in
        assert sum(1 for g in gates if g[0] == "cx") == 3


def test_decompose_special_gates():
    swap = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                     [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex)
    targets = [CX01, swap, kron(rx(0.3), rz(-1.2)), np.eye(4, dtype=complex)]
    for u in targets:
        gates, _ = decompose_su4(u, 0, 1)
        assert sum(1 for g in gates if g[0] == "cx") <= 3


def test_invariants_local_invariance():
    rng = np.random.default_rng(3)
    u = random_su4(rng)
    from scipy.stats import unitary_group

    l = kron(unitary_group.rvs(2, random_state=rng),
             unitary_group.rvs(2, random_state=rng))
    r = kron(unitary_group.rvs(2, random_state=rng),
             unitary_group.rvs(2, random_state=rng))
    g1a, g2a = makhlin_invariants(u)
    g1b, g2b = makhlin_invariants(l @ u @ r)
    assert g1a == pytest.approx(g1b, abs=1e-10)
    assert g2a == pytest.approx(g2b, abs=1e-10)


def test_closest_unitary():
    rng = np.random.default_rng(4)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    u = closest_unitary(m)
    np.testing.assert_allclose(u @ u.conj().T, np.eye(4), atol=1e-12)


def test_warmstart_pipeline_heisenberg5():
    """Full stage-1 pipeline on the benchmark spin chain: DMRG -> brickwork
    fit -> KAK -> native tape with verified energy round trip."""
    from tensorrl_qas_tpu.tn.pipeline import build_warmstart

    paulis, weights = heisenberg_hamiltonian(5)
    res = build_warmstart(paulis, weights, chi=2, n_layers=2,
                          maxiter=2000, seed=0)
    assert res.e_exact is not None
    # chi=2 warm start should land within ~0.5 Ha of the ground state
    # (comparable to the shipped reference circuit at -8.497 vs -8.712)
    assert res.e_circuit < res.e_exact + 0.3
    assert res.e_circuit >= res.e_exact - 1e-9
    # n=5, 2 brick layers -> 2+2 = 4 bricks, 3 CNOTs per brick (same count
    # as the reference's shipped chi=2 heisenberg circuit: 12 CNOTs)
    assert res.cnot_count == 12
    # round-trip: qasm text parses back to the same energy
    from tensorrl_qas_tpu.circuits.qasm import parse_qasm
    from tensorrl_qas_tpu.circuits.tape import tape_from_gate_list
    import jax.numpy as jnp
    from tensorrl_qas_tpu.sim import apply_tape, pauli_expectation, zero_state
    from tensorrl_qas_tpu.sim.expectation import PauliSum

    n2, gates = parse_qasm(res.qasm)
    tape2 = tape_from_gate_list(n2, gates)
    ps = PauliSum.from_strings(paulis, weights, 5)
    psi = apply_tape(zero_state(5, jnp.complex128),
                     *map(jnp.asarray, tape2.arrays()),
                     jnp.asarray(tape2.x0()))
    e2 = float(pauli_expectation(psi, *ps.device_arrays(jnp.complex128)))
    assert e2 == pytest.approx(res.e_circuit, abs=1e-9)
