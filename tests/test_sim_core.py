"""Simulator core parity tests against dense numpy linear algebra.

Oracle strategy per SURVEY.md section 4: cross-check the JAX engine against
exact dense matrices on small n, and against the reference's stored
.npz/.qasm golden pairs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.sim import (
    apply_tape,
    dense_expectation,
    pauli_expectation,
    zero_state,
)
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tensorrl_qas_tpu.utils.bits import bit_reversal_permutation

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


def rx(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * X


def ry(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * Y


def rz(t):
    return np.cos(t / 2) * I2 - 1j * np.sin(t / 2) * Z


def kron_1q(u, q, n):
    """Little-endian embedding: qubit q = index bit q (kron from MSB down)."""
    ops = [I2] * n
    ops[n - 1 - q] = u
    out = ops[0]
    for o in ops[1:]:
        out = np.kron(out, o)
    return out


def cnot_matrix(ctrl, targ, n):
    dim = 1 << n
    m = np.zeros((dim, dim), dtype=complex)
    for i in range(dim):
        j = i ^ (1 << targ) if (i >> ctrl) & 1 else i
        m[j, i] = 1.0
    return m


def random_tape(n, n_gates, rng):
    tape = GateTape(n, n_gates, n_gates)
    u = np.eye(1 << n, dtype=complex)
    for _ in range(n_gates):
        kind = rng.choice([GateKind.RX, GateKind.RY, GateKind.RZ, GateKind.CX])
        if kind == GateKind.CX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
            u = cnot_matrix(c, t, n) @ u
        else:
            q = int(rng.integers(n))
            theta = float(rng.uniform(-np.pi, np.pi))
            tape.add(kind, target=q, angle=theta)
            f = {GateKind.RX: rx, GateKind.RY: ry, GateKind.RZ: rz}[kind]
            u = kron_1q(f(theta), q, n) @ u
    return tape, u


@pytest.mark.parametrize("n", [2, 3, 5])
def test_apply_tape_matches_dense_unitary(n):
    rng = np.random.default_rng(7 + n)
    tape, u = random_tape(n, 20, rng)
    psi = apply_tape(zero_state(n, jnp.complex128), *map(jnp.asarray, tape.arrays()),
                     jnp.asarray(tape.x0()))
    expected = u @ np.eye(1 << n)[0]
    np.testing.assert_allclose(np.asarray(psi), expected, atol=1e-12)


def test_apply_tape_padding_is_identity():
    n = 3
    tape = GateTape(n, 10, 10)
    tape.add(GateKind.RY, target=1, angle=0.3)
    psi = apply_tape(zero_state(n, jnp.complex128), *map(jnp.asarray, tape.arrays()),
                     jnp.asarray(tape.x0()))
    expected = kron_1q(ry(0.3), 1, n) @ np.eye(8)[0]
    np.testing.assert_allclose(np.asarray(psi), expected, atol=1e-12)


def test_pauli_expectation_matches_dense():
    n = 4
    rng = np.random.default_rng(3)
    paulis = ["XXII", "IYYI", "IIZZ", "XYZI", "ZIIX", "YYYY", "IIII"]
    weights = rng.uniform(-2, 2, len(paulis))
    ps = PauliSum.from_strings(paulis, weights, n_qubits=n)
    dense = ps.to_dense()
    # dense oracle built independently from kron (char 0 = MSB = qubit n-1)
    chars = {"I": I2, "X": X, "Y": Y, "Z": Z}
    href = np.zeros((16, 16), dtype=complex)
    for w, s in zip(weights, paulis):
        m = chars[s[0]]
        for ch in s[1:]:
            m = np.kron(m, chars[ch])
        href += w * m
    perm = bit_reversal_permutation(n)
    np.testing.assert_allclose(dense, href[np.ix_(perm, perm)], atol=1e-12)

    psi = rng.normal(size=16) + 1j * rng.normal(size=16)
    psi /= np.linalg.norm(psi)
    e_pauli = pauli_expectation(jnp.asarray(psi), *ps.device_arrays(jnp.complex128))
    e_dense = dense_expectation(jnp.asarray(psi), jnp.asarray(dense))
    np.testing.assert_allclose(float(e_pauli), float(e_dense), atol=1e-12)
    np.testing.assert_allclose(float(e_pauli),
                               np.real(psi.conj() @ dense @ psi), atol=1e-12)


def test_pauli_expectation_batched():
    n = 3
    rng = np.random.default_rng(5)
    ps = PauliSum.from_strings(["XXI", "IZZ", "YIY"], [0.5, -1.0, 2.0], n)
    psis = rng.normal(size=(4, 8)) + 1j * rng.normal(size=(4, 8))
    psis /= np.linalg.norm(psis, axis=1, keepdims=True)
    e = pauli_expectation(jnp.asarray(psis), *ps.device_arrays(jnp.complex128))
    dense = ps.to_dense()
    expected = [np.real(p.conj() @ dense @ p) for p in psis]
    np.testing.assert_allclose(np.asarray(e), expected, atol=1e-12)


def test_gradients_flow_through_tape():
    import jax

    n = 3
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ"], [1.0, 1.0, 1.0], n)
    tape = GateTape(n, 4, 4)
    for q in range(3):
        tape.add(GateKind.RY, target=q, angle=0.1)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    dev = ps.device_arrays(jnp.complex128)

    def energy(x):
        psi = apply_tape(zero_state(n, jnp.complex128), *arrs, x)
        return pauli_expectation(psi, *dev)

    g = jax.grad(energy)(jnp.asarray(tape.x0()))
    # d<Z>/dtheta for RY(theta)|0> is -sin(theta)
    np.testing.assert_allclose(np.asarray(g)[:3], -np.sin(0.1) * np.ones(3),
                               atol=1e-10)
