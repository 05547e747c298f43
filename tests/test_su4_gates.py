"""Two-qubit Pauli rotations (SU(4) action-set support) vs dense oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.qasm import dump_qasm, parse_qasm
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape, tape_from_gate_list
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


def kron_1q(u, q, n):
    ops = [I2] * n
    ops[n - 1 - q] = u
    out = ops[0]
    for o in ops[1:]:
        out = np.kron(out, o)
    return out


def two_pauli_rot(p, qa, qb, theta, n):
    pp = kron_1q(p, qa, n) @ kron_1q(p, qb, n)
    return (np.cos(theta / 2) * np.eye(1 << n)
            - 1j * np.sin(theta / 2) * pp)


@pytest.mark.parametrize("kind,p", [(GateKind.RXX, X), (GateKind.RYY, Y),
                                    (GateKind.RZZ, Z)])
def test_two_qubit_rotation_matches_dense(kind, p):
    n = 4
    rng = np.random.default_rng(int(kind))
    psi = rng.normal(size=16) + 1j * rng.normal(size=16)
    psi /= np.linalg.norm(psi)
    for qa, qb in [(0, 1), (2, 0), (1, 3)]:
        theta = float(rng.uniform(-np.pi, np.pi))
        tape = GateTape(n, 1, 1)
        tape.add(kind, target=qb, control=qa, angle=theta)
        out = apply_tape(jnp.asarray(psi), *map(jnp.asarray, tape.arrays()),
                         jnp.asarray(tape.x0()), enable_2q=True)
        expected = two_pauli_rot(p, qa, qb, theta, n) @ psi
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)


def test_su4_tape_mixes_with_standard_gates():
    n = 3
    tape = GateTape(n, 5, 5)
    tape.add(GateKind.RY, 0, angle=0.4)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.9)
    tape.add_cx(1, 2)
    tape.add(GateKind.RZZ, target=2, control=0, angle=-0.3)
    out = apply_tape(zero_state(n, jnp.complex128),
                     *map(jnp.asarray, tape.arrays()),
                     jnp.asarray(tape.x0()), enable_2q=True)
    # dense oracle
    ry = np.cos(0.2) * I2 - 1j * np.sin(0.2) * Y
    cx12 = np.zeros((8, 8), dtype=complex)
    for i in range(8):
        j = i ^ 4 if (i >> 1) & 1 else i
        cx12[j, i] = 1
    u = (two_pauli_rot(Z, 0, 2, -0.3, n) @ cx12
         @ two_pauli_rot(X, 0, 1, 0.9, n) @ kron_1q(ry, 0, n))
    np.testing.assert_allclose(np.asarray(out), u @ np.eye(8)[0], atol=1e-12)


def test_su4_qasm_roundtrip():
    n = 3
    tape = GateTape(n, 3, 3)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.7)
    tape.add(GateKind.RYY, target=2, control=1, angle=-0.2)
    tape.add(GateKind.RZZ, target=2, control=0, angle=1.1)
    text = dump_qasm(tape)
    n2, gates = parse_qasm(text)
    tape2 = tape_from_gate_list(n2, gates)
    out1 = apply_tape(zero_state(n, jnp.complex128),
                      *map(jnp.asarray, tape.arrays()),
                      jnp.asarray(tape.x0()), enable_2q=True)
    out2 = apply_tape(zero_state(n, jnp.complex128),
                      *map(jnp.asarray, tape2.arrays()),
                      jnp.asarray(tape2.x0()), enable_2q=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-12)
