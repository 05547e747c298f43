"""Amplitude-sharded simulator vs single-chip reference on a virtual
8-device CPU mesh (the multi-chip scale-out path, SURVEY.md section 2.4b)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.parallel.sharded_sim import ShardedSimulator
from tensorrl_qas_tpu.sim import apply_tape, pauli_expectation, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum


def amp_mesh(n_dev):
    devs = jax.devices()
    if len(devs) < n_dev:
        pytest.skip(f"need {n_dev} devices")
    return Mesh(np.array(devs[:n_dev]).reshape(n_dev), ("amp",))


def random_tape(n, n_gates, seed):
    rng = np.random.default_rng(seed)
    tape = GateTape(n, n_gates, n_gates)
    for _ in range(n_gates):
        kind = rng.choice([GateKind.RX, GateKind.RY, GateKind.RZ, GateKind.CX])
        if kind == GateKind.CX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
        else:
            tape.add(kind, target=int(rng.integers(n)),
                     angle=float(rng.uniform(-np.pi, np.pi)))
    return tape


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_apply_matches_single_chip(n_dev):
    n = 5
    mesh = amp_mesh(n_dev)
    ps = PauliSum.from_strings(["XZIII", "IIYXI", "ZZZZZ"], [0.3, -1.1, 0.7], n)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex128)
    tape = random_tape(n, 40, seed=n_dev)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0())

    psi_ref = apply_tape(zero_state(n, jnp.complex128), *arrs, x)
    psi_sh = sim.apply_tape(sim.zero_state(), *arrs, x)
    np.testing.assert_allclose(np.asarray(psi_sh), np.asarray(psi_ref),
                               atol=1e-12)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_expectation_matches(n_dev):
    n = 6
    mesh = amp_mesh(n_dev)
    # terms whose flips cross the device-bit boundary in every combination
    paulis = ["XIIIII", "IIIIIX", "XYIIZX", "ZZZZZZ", "IYIYIY", "XXXXXX"]
    weights = [0.5, -0.25, 1.5, 2.0, -0.75, 0.1]
    ps = PauliSum.from_strings(paulis, weights, n)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex128)
    tape = random_tape(n, 30, seed=42 + n_dev)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0())

    psi_ref = apply_tape(zero_state(n, jnp.complex128), *arrs, x)
    e_ref = float(pauli_expectation(psi_ref,
                                    *ps.device_arrays(jnp.complex128)))
    psi_sh = sim.apply_tape(sim.zero_state(), *arrs, x)
    e_sh = float(sim.expectation(psi_sh))
    assert e_sh == pytest.approx(e_ref, abs=1e-10)


def test_sharded_heisenberg_warmstart_energy():
    """Cross-check the sharded engine against the golden warm-start energy."""
    from tensorrl_qas_tpu.circuits.qasm import load_qasm_tape
    from tensorrl_qas_tpu.problems.hamiltonians import (
        load_problem, resolve_data_file, warmstart_qasm_name)

    try:
        path = resolve_data_file(warmstart_qasm_name("heisenberg", 5, 2))
    except FileNotFoundError:
        pytest.skip("reference data not available")
    mesh = amp_mesh(8)
    prob = load_problem("heisenberg", 5)
    sim = ShardedSimulator(mesh, 5, prob.pauli, dtype=jnp.complex128)
    tape = load_qasm_tape(path)
    psi = sim.apply_tape(sim.zero_state(),
                         *map(jnp.asarray, tape.arrays()),
                         jnp.asarray(tape.x0()))
    e = float(sim.expectation(psi))
    # compare against the single-chip engine on the same circuit
    psi1 = apply_tape(zero_state(5, jnp.complex128),
                      *map(jnp.asarray, tape.arrays()),
                      jnp.asarray(tape.x0()))
    e1 = float(pauli_expectation(psi1,
                                 *prob.pauli.device_arrays(jnp.complex128)))
    assert e == pytest.approx(e1, abs=1e-9)
    assert -8.6 < e < -8.4


@pytest.mark.slow
def test_sharded_batched_dp_amp():
    """(dp x amp) jointly-sharded batch path vs single-chip results."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tensorrl_qas_tpu.parallel.mesh import make_mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("need 8 devices")
    mesh = make_mesh(n_amp=2, n_dp=4)
    n = 5
    ps = PauliSum.from_strings(["XZIII", "IIYXI", "ZZZZZ"], [0.3, -1.1, 0.7],
                               n)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex128)
    tape = random_tape(n, 25, seed=5)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    batch = 8
    rng = np.random.default_rng(0)
    angles_b = jnp.asarray(
        rng.uniform(-np.pi, np.pi, size=(batch, tape.rot_capacity)))
    psi_b = sim.zero_state_batched(batch)
    out = sim.apply_tape_batched(psi_b, *arrs, angles_b)
    e_b = sim.expectation_batched(out)

    for i in range(batch):
        ref = apply_tape(zero_state(n, jnp.complex128), *arrs, angles_b[i])
        e_ref = float(pauli_expectation(ref,
                                        *ps.device_arrays(jnp.complex128)))
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=1e-12)
        assert float(e_b[i]) == pytest.approx(e_ref, abs=1e-10)


@pytest.mark.slow
def test_sharded_adjoint_value_and_grad_matches_autodiff():
    """value_and_grad_batched (adjoint sweep on the mesh) == autodiff
    through the batched apply, per batch row."""
    import numpy as np

    from tensorrl_qas_tpu.parallel.mesh import make_mesh
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian

    n = 5
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    mesh = make_mesh(n_amp=2, n_dp=4)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex64)
    tape = random_tape(n, 14, seed=6)
    kind, tq, cq, slot = map(jnp.asarray, tape.arrays())
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.normal(size=(4, len(tape.x0()))).astype(np.float32))
    psi0_b = sim.zero_state_batched(4)

    ev, gr = sim.value_and_grad_batched(psi0_b, kind, tq, cq, slot, xb)

    arrs_h = ps.device_arrays(jnp.complex64)
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    def e_ref(x):
        return pauli_expectation(
            apply_tape(psi0, kind, tq, cq, slot, x), *arrs_h)

    for b in range(4):
        v, g = jax.value_and_grad(e_ref)(xb[b])
        assert float(ev[b]) == pytest.approx(float(v), abs=1e-4)
        np.testing.assert_allclose(np.asarray(gr[b]), np.asarray(g),
                                   atol=2e-4, rtol=2e-4)

def random_su4_tape(n, n_gates, seed):
    rng = np.random.default_rng(seed)
    tape = GateTape(n, n_gates, n_gates)
    for _ in range(n_gates):
        kind = rng.choice([GateKind.RX, GateKind.RY, GateKind.RZ,
                           GateKind.RXX, GateKind.RYY, GateKind.RZZ])
        angle = float(rng.uniform(-np.pi, np.pi))
        if kind >= GateKind.RXX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add(GateKind(kind), target=int(t), control=int(c),
                     angle=angle)
        else:
            tape.add(GateKind(kind), target=int(rng.integers(n)),
                     angle=angle)
    return tape


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_su4_apply_matches_single_chip(n_dev):
    """RXX/RYY/RZZ on the mesh (enable_2q): state parity vs the
    single-chip 2q-rotation path for every local/device-bit placement."""
    n = 5
    mesh = amp_mesh(n_dev)
    ps = PauliSum.from_strings(["XZIII", "IIYXI", "ZZZZZ"], [0.3, -1.1, 0.7],
                               n)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex128, enable_2q=True)
    tape = random_su4_tape(n, 30, seed=11 + n_dev)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0())

    psi_ref = apply_tape(zero_state(n, jnp.complex128), *arrs, x,
                         enable_2q=True)
    psi_sh = sim.apply_tape(sim.zero_state(), *arrs, x)
    np.testing.assert_allclose(np.asarray(psi_sh), np.asarray(psi_ref),
                               atol=1e-12)


@pytest.mark.slow
def test_sharded_su4_vag_matches_autodiff():
    """Adjoint value-and-grad on the mesh with the su4 generator pair."""
    from tensorrl_qas_tpu.parallel.mesh import make_mesh
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian

    n = 5
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    mesh = make_mesh(n_amp=2, n_dp=4)
    sim = ShardedSimulator(mesh, n, ps, dtype=jnp.complex64, enable_2q=True)
    tape = random_su4_tape(n, 12, seed=9)
    kind, tq, cq, slot = map(jnp.asarray, tape.arrays())
    rng = np.random.default_rng(4)
    xb = jnp.asarray(rng.normal(size=(4, len(tape.x0()))).astype(np.float32))
    psi0_b = sim.zero_state_batched(4)

    ev, gr = sim.value_and_grad_batched(psi0_b, kind, tq, cq, slot, xb)

    arrs_h = ps.device_arrays(jnp.complex64)
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    def e_ref(x):
        return pauli_expectation(
            apply_tape(psi0, kind, tq, cq, slot, x, enable_2q=True), *arrs_h)

    for b in range(4):
        v, g = jax.value_and_grad(e_ref)(xb[b])
        assert float(ev[b]) == pytest.approx(float(v), abs=1e-4)
        np.testing.assert_allclose(np.asarray(gr[b]), np.asarray(g),
                                   atol=2e-4, rtol=2e-4)
