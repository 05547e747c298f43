"""The 56th row: reference ``VQE.py``'s oracle role, pinned by convention.

``environments/VQAs/VQE.py`` (reference, dead code — imported by no env)
evaluates the same ansatz through qiskit's big-endian ``Statevector`` /
``Operator`` stack; its only distinct content is the qubit-ordering
convention, which the live reference code also leans on
(``Operator(ham).reverse_qargs()`` at
``environment_qulacs_TN_notin_agent.py:162``).  qiskit is not a
dependency here, so this test pins that contract directly: the
little-endian Pauli-sum energy must equal the big-endian dense evaluation
(reference kron order) of the bit-reversed statevector — i.e. our engine
and a qiskit-convention evaluator agree on the shipped artifacts.

With this pinned, PARITY.md records VQE.py as permanently covered
(56/56): the qiskit-statevector twin's observable behavior is the
convention identity tested here plus the ansatz/energy semantics already
oracled by the dense and csim engines.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorrl_qas_tpu import native
from tensorrl_qas_tpu.circuits.qasm import load_qasm_tape
from tensorrl_qas_tpu.problems.hamiltonians import (
    dense_from_paulis,
    load_problem,
    resolve_warmstart_qasm,
)
from tensorrl_qas_tpu.sim.expectation import pauli_expectation

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _bit_reverse(psi: np.ndarray, n: int) -> np.ndarray:
    """Little-endian amplitude order -> big-endian (qiskit Statevector)."""
    return psi.reshape([2] * n).transpose(*reversed(range(n))).ravel()


def test_little_endian_energy_matches_qiskit_convention():
    n = 5
    prob = load_problem("heisenberg", n)
    tape = load_qasm_tape(resolve_warmstart_qasm("heisenberg", n, 2))
    eng = native.CsimEngine(prob.pauli)
    psi0 = np.zeros(1 << n, dtype=np.complex128)
    psi0[0] = 1.0
    psi = eng.apply_tape(psi0, *tape.arrays(), tape.x0())

    # our engine's energy (little-endian Pauli masks)
    w, flip, sm, ip = prob.pauli.device_arrays(jnp.complex128)
    e_le = float(np.real(pauli_expectation(jnp.asarray(psi), w, flip, sm,
                                           ip)))

    # qiskit-convention evaluation: dense H built in the reference's kron
    # order (pauli string index 0 = leftmost kron factor = qubit n-1 in
    # qiskit's labeling) applied to the bit-reversed statevector — the
    # exact pairing VQE.py:L85-87 / reverse_qargs() realizes upstream
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    paulis, weights = heisenberg_hamiltonian(n)
    h_ref_order = dense_from_paulis(paulis, weights)
    psi_be = _bit_reverse(psi.astype(np.complex128), n)
    e_be = float(np.real(psi_be.conj() @ (h_ref_order @ psi_be)))

    assert abs(e_le - e_be) < 1e-9
    # and both sit at the shipped warm-start energy
    assert abs(e_le - (-8.4986)) < 1e-3
