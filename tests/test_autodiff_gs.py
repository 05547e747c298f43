"""gs_autodiff: gradient-descent MPS ground state vs exact diagonalization.

Counterpart checks for the reference's alternative TNOptimizer solver
(``dmrg-to-qc/mps2qc.py:156-216``), which logs its loss_best against
``gs_exact_diag`` for small systems.
"""

import numpy as np
import pytest

from tensorrl_qas_tpu.problems.hamiltonians import (
    heisenberg_hamiltonian,
    tfim_hamiltonian,
)
from tensorrl_qas_tpu.tn.autodiff_gs import gs_autodiff
from tensorrl_qas_tpu.tn.dmrg import gs_dmrg, gs_exact_diag
from tensorrl_qas_tpu.tn.mpo import mpo_from_paulis


def test_gs_autodiff_exact_at_full_bond():
    # n=4 TFIM: chi=4 saturates the Schmidt rank, so the variational
    # minimum IS the exact ground state.
    paulis, weights = tfim_hamiltonian(4)
    mpo = mpo_from_paulis(paulis, weights)
    e0, _ = gs_exact_diag(mpo.to_dense())
    e, mps, hist = gs_autodiff(mpo, chi=4, opt_steps=1500, lr=5e-2, seed=0)
    assert e == pytest.approx(e0, abs=2e-4)
    # the returned state is normalized and achieves (about) the energy
    psi = mps.to_statevector()
    assert np.linalg.norm(psi) == pytest.approx(1.0, abs=1e-9)
    h = mpo.to_dense()
    e_psi = float(np.real(psi.conj() @ h @ psi))
    assert e_psi == pytest.approx(e0, abs=5e-4)
    # monotone-ish: the loss history ends far below where it starts
    assert hist[-1] < hist[0] - 0.5 * abs(hist[0] - e0)


def test_gs_autodiff_matches_dmrg_bound_at_small_chi():
    # chi=2 on a 5q Heisenberg chain: the autodiff optimum must come
    # within a hair of the chi=2 DMRG energy (both optimize the same
    # variational class; DMRG is the sharper solver).
    paulis, weights = heisenberg_hamiltonian(5)
    mpo = mpo_from_paulis(paulis, weights)
    e0 = gs_exact_diag(mpo.to_dense())[0]
    e_dmrg = gs_dmrg(mpo, chi=2, max_sweeps=4)[0]
    e_ad, _, _ = gs_autodiff(mpo, chi=2, opt_steps=2500, lr=5e-2, seed=1)
    assert e_ad >= e0 - 1e-6              # variational: cannot beat exact
    assert e_ad == pytest.approx(e_dmrg, abs=5e-2)
