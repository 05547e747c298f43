"""Golden-pair tests against the reference's shipped data files.

The stored .npz (dense Hamiltonian + pauli strings) and .qasm warm-start
circuits provide ready-made oracles (SURVEY.md section 4): our Pauli-mask
Hamiltonian must reproduce the stored dense matrix after endianness
conversion, and the warm-start circuit's energy must land near the DMRG
ground state.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.qasm import dump_qasm, load_qasm_tape, parse_qasm
from tensorrl_qas_tpu.problems.hamiltonians import (
    heisenberg_hamiltonian,
    load_problem,
    resolve_data_file,
    save_problem_npz,
    tfim_hamiltonian,
    warmstart_qasm_name,
)
from tensorrl_qas_tpu.sim import apply_tape, dense_expectation, pauli_expectation, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tensorrl_qas_tpu.utils.bits import bit_reversal_permutation


def _have(relpath):
    try:
        resolve_data_file(relpath)
        return True
    except FileNotFoundError:
        return False


def test_heisenberg_generator_matches_reference_npz(tmp_path):
    paulis, weights = heisenberg_hamiltonian(5)
    if _have("mol_data/heisenberg_5q.npz"):
        raw = np.load(resolve_data_file("mol_data/heisenberg_5q.npz"),
                      allow_pickle=True)
        assert [str(p) for p in raw["paulis"]] == paulis
        np.testing.assert_allclose(raw["weights"], weights)
        ps = PauliSum.from_strings(paulis, weights, 5)
        perm = bit_reversal_permutation(5)
        np.testing.assert_allclose(ps.to_dense(),
                                   raw["hamiltonian"][np.ix_(perm, perm)],
                                   atol=1e-12)
    # round-trip through our npz writer
    save_problem_npz(str(tmp_path / "heisenberg_5q.npz"), paulis, weights)
    os.environ["TRLQAS_DATA_DIR"] = ""
    raw2 = np.load(tmp_path / "heisenberg_5q.npz", allow_pickle=True)
    assert set(raw2.files) >= {"hamiltonian", "eigvals", "weights", "paulis"}


def test_pickle_twin_roundtrip(tmp_path, monkeypatch):
    """The .p pickle twin (making_molecules.py:138-140) is drop-in loadable.

    The reference dumps the same complete_dict to both ``<stem>.p`` and
    ``<stem>.npz``; a pickle-only artifact must load identically to the
    npz through ``load_problem``.
    """
    import pickle

    import tensorrl_qas_tpu.problems.hamiltonians as H

    paulis, weights = heisenberg_hamiltonian(5)
    (tmp_path / "mol_data").mkdir()
    H.save_problem_pickle(str(tmp_path / "mol_data" / "heisenberg_5q.p"),
                          paulis, weights)
    with open(tmp_path / "mol_data" / "heisenberg_5q.p", "rb") as fh:
        d = pickle.load(fh)
    # exact reference schema keys and plain-python value kinds
    assert set(d) == {"hamiltonian", "eigvals", "weights", "paulis",
                      "energy_shift"}
    assert isinstance(d["weights"], list) and isinstance(d["paulis"], list)
    # pickle-only directory: no .npz twin anywhere on the search path
    monkeypatch.setattr(H, "DATA_SEARCH_PATHS", [str(tmp_path)])
    prob = H.load_problem("heisenberg", 5)
    assert prob.min_eig == pytest.approx(-8.7115450, abs=1e-5)
    ps = PauliSum.from_strings(paulis, weights, 5)
    perm = bit_reversal_permutation(5)
    np.testing.assert_allclose(ps.to_dense(),
                               np.asarray(d["hamiltonian"])[np.ix_(perm, perm)],
                               atol=1e-12)


@pytest.mark.skipif(not _have("mol_data/heisenberg_5q.npz"),
                    reason="reference data not available")
def test_load_problem_heisenberg():
    prob = load_problem("heisenberg", 5)
    assert prob.n_qubits == 5
    assert prob.min_eig == pytest.approx(-8.7115450, abs=1e-5)
    # pauli-sum vs stored dense on random states
    rng = np.random.default_rng(0)
    psi = rng.normal(size=32) + 1j * rng.normal(size=32)
    psi /= np.linalg.norm(psi)
    e1 = float(pauli_expectation(jnp.asarray(psi),
                                 *prob.pauli.device_arrays(jnp.complex128)))
    e2 = float(dense_expectation(jnp.asarray(psi), jnp.asarray(prob.dense)))
    assert e1 == pytest.approx(e2, abs=1e-10)


@pytest.mark.skipif(not _have(warmstart_qasm_name("heisenberg", 5, 2)),
                    reason="reference data not available")
def test_warmstart_circuit_energy():
    """The shipped TN circuit must approximate the DMRG ground state."""
    prob = load_problem("heisenberg", 5)
    tape = load_qasm_tape(resolve_data_file(warmstart_qasm_name("heisenberg", 5, 2)))
    psi = apply_tape(zero_state(5, jnp.complex128),
                     *map(jnp.asarray, tape.arrays()), jnp.asarray(tape.x0()))
    # unitarity
    assert float(jnp.sum(jnp.abs(psi) ** 2)) == pytest.approx(1.0, abs=1e-10)
    e = float(pauli_expectation(psi, *prob.pauli.device_arrays(jnp.complex128)))
    # chi=2 brickwork fit of the ground state: should be within ~0.2 Ha
    assert e < prob.min_eig + 0.5
    assert e >= prob.min_eig - 1e-9


def test_qasm_roundtrip(tmp_path):
    text = """OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
rz(-3*pi/2) q[0];
ry(1.25) q[1];
cx q[0],q[2];
rx(-0.5e-1) q[2];
"""
    n, gates = parse_qasm(text)
    assert n == 3
    assert gates[0] == ("rz", [0], pytest.approx(-3 * np.pi / 2))
    assert gates[2] == ("cx", [0, 2], None)
    from tensorrl_qas_tpu.circuits.tape import tape_from_gate_list
    tape = tape_from_gate_list(n, gates)
    text2 = dump_qasm(tape)
    n2, gates2 = parse_qasm(text2)
    assert n2 == n
    assert len(gates2) == len(gates)
    for (g1, q1, a1), (g2, q2, a2) in zip(gates, gates2):
        assert (g1, q1) == (g2, q2)
        if a1 is not None:
            assert a1 == pytest.approx(a2)


def test_tfim_generator():
    paulis, weights = tfim_hamiltonian(4, j=1.0, h=0.05)
    ps = PauliSum.from_strings(paulis, weights, 4)
    dense = ps.to_dense()
    np.testing.assert_allclose(dense, dense.conj().T, atol=1e-12)
    assert len(paulis) == 3 + 4


def test_trim_to_depth():
    """trim_to_depth == the reference's trimmed_circuit DAG-layer cut
    (dmrg_to_qc.py:93-123): keep exactly the first max_depth layers."""
    from tensorrl_qas_tpu.circuits.tape import (
        GateKind, GateTape, trim_to_depth)

    tape = GateTape(3, capacity=8, rot_capacity=8)
    tape.add(GateKind.RX, target=0, angle=0.1)   # layer 1
    tape.add(GateKind.RY, target=1, angle=0.2)   # layer 1
    tape.add_cx(0, 1)                            # layer 2
    tape.add(GateKind.RZ, target=2, angle=0.3)   # layer 1
    tape.add(GateKind.RX, target=1, angle=0.4)   # layer 3
    tape.add_cx(1, 2)                            # layer 4
    assert tape.depth() == 4

    t2 = trim_to_depth(tape, 2)
    assert t2.depth() == 2
    assert t2.n_gates == 4                       # both layer-1 rots + cx + rz
    assert t2.cnot_count == 1
    # successor-of-dropped must drop: cutting at 3 keeps the layer-3 RX but
    # not the layer-4 CX even though its qubit-2 slot would be free
    t3 = trim_to_depth(tape, 3)
    assert t3.n_gates == 5 and t3.cnot_count == 1
    # full depth is the identity
    t4 = trim_to_depth(tape, 4)
    assert t4.n_gates == tape.n_gates
    assert np.allclose(t4.angles[: t4.n_rots], tape.angles[: tape.n_rots])
