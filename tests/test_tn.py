"""Tensor-network layer tests: MPS/MPO round trips, DMRG vs exact diag."""

import numpy as np
import pytest

from tensorrl_qas_tpu.problems.hamiltonians import (
    heisenberg_hamiltonian,
    tfim_hamiltonian,
)
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tensorrl_qas_tpu.tn.dmrg import gs_dmrg, gs_exact_diag
from tensorrl_qas_tpu.tn.mpo import mpo_from_paulis
from tensorrl_qas_tpu.tn.mps import MPS


def test_mps_statevector_roundtrip():
    rng = np.random.default_rng(0)
    psi = rng.normal(size=32) + 1j * rng.normal(size=32)
    psi /= np.linalg.norm(psi)
    mps = MPS.from_statevector(psi)
    np.testing.assert_allclose(mps.to_statevector(), psi, atol=1e-12)
    # overlap identity
    assert mps.overlap(mps) == pytest.approx(1.0, abs=1e-12)


def test_mps_truncation_fidelity():
    # product state has chi=1 exactly
    psi = np.zeros(16, dtype=complex)
    psi[0b0101] = 1.0
    mps = MPS.from_statevector(psi, chi=1)
    np.testing.assert_allclose(mps.to_statevector(), psi, atol=1e-12)


def test_mpo_dense_matches_pauli_sum():
    """MPO.to_dense must equal the PauliSum dense oracle (the reference's
    MPO-vs-dense check, dmrg_to_qc.py:175-176)."""
    paulis, weights = heisenberg_hamiltonian(4)
    mpo = mpo_from_paulis(paulis, weights)
    ps = PauliSum.from_strings(paulis, weights, 4)
    np.testing.assert_allclose(mpo.to_dense(), ps.to_dense(), atol=1e-10)


def test_mpo_compression_shrinks_bond():
    paulis, weights = heisenberg_hamiltonian(6)
    raw = mpo_from_paulis(paulis, weights, compress=False)
    comp = mpo_from_paulis(paulis, weights, compress=True)
    assert max(comp.bond_dims) < max(raw.bond_dims)
    np.testing.assert_allclose(comp.to_dense(), raw.to_dense(), atol=1e-8)


@pytest.mark.parametrize("ham,n,chi,tol", [
    ("heisenberg", 5, 8, 1e-6),
    ("tfim", 6, 8, 1e-6),
])
def test_dmrg_reaches_ground_state(ham, n, chi, tol):
    if ham == "heisenberg":
        paulis, weights = heisenberg_hamiltonian(n)
    else:
        paulis, weights = tfim_hamiltonian(n)
    mpo = mpo_from_paulis(paulis, weights)
    ps = PauliSum.from_strings(paulis, weights, n)
    e_exact, v_exact = gs_exact_diag(ps.to_dense())
    e_dmrg, mps = gs_dmrg(mpo, chi=chi, max_sweeps=6, seed=1)
    assert e_dmrg == pytest.approx(e_exact, abs=tol)
    # the MPS statevector energy agrees
    psi = mps.to_statevector()
    e_sv = np.real(psi.conj() @ ps.to_dense() @ psi)
    assert e_sv == pytest.approx(e_exact, abs=10 * tol)
    # fidelity with the exact ground state
    fid = abs(np.vdot(v_exact, psi)) ** 2
    assert fid > 0.999


def test_dmrg_chi2_chemical_accuracy_check():
    """chi=2 on the 5q Heisenberg chain: bounded error (the warm-start
    regime — DMRG energy above but near the ground state)."""
    paulis, weights = heisenberg_hamiltonian(5)
    mpo = mpo_from_paulis(paulis, weights)
    ps = PauliSum.from_strings(paulis, weights, 5)
    e_exact, _ = gs_exact_diag(ps.to_dense())
    e_dmrg, _ = gs_dmrg(mpo, chi=2, max_sweeps=6, seed=0)
    assert e_dmrg >= e_exact - 1e-9        # variational
    assert e_dmrg - e_exact < 0.5          # chi=2 quality envelope
