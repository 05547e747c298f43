"""csim (C++ engine) vs the JAX engine: three-way oracle agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim import apply_tape, pauli_expectation, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tensorrl_qas_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def random_tape(n, n_gates, seed):
    rng = np.random.default_rng(seed)
    tape = GateTape(n, n_gates, n_gates)
    kinds = [GateKind.RX, GateKind.RY, GateKind.RZ, GateKind.CX,
             GateKind.X, GateKind.Y, GateKind.Z, GateKind.H]
    for _ in range(n_gates):
        kind = rng.choice(kinds)
        if kind == GateKind.CX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
        else:
            tape.add(kind, target=int(rng.integers(n)),
                     angle=float(rng.uniform(-np.pi, np.pi)))
    return tape


@pytest.mark.parametrize("n", [pytest.param(3, marks=pytest.mark.slow),
                               6,
                               pytest.param(9, marks=pytest.mark.slow)])
def test_csim_matches_jax(n):
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    eng = native.CsimEngine(ps)
    tape = random_tape(n, 50, seed=n)
    arrs = tape.arrays()
    x = tape.x0()

    psi_c = eng.apply_tape(zero_state(n, np.complex128), *arrs, x)
    psi_j = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, arrs), jnp.asarray(x))
    np.testing.assert_allclose(psi_c, np.asarray(psi_j), atol=1e-12)

    e_c = eng.expectation(psi_c)
    e_j = float(pauli_expectation(psi_j, *ps.device_arrays(jnp.complex128)))
    assert e_c == pytest.approx(e_j, abs=1e-10)

    e_fused = eng.tape_energy(zero_state(n, np.complex128), *arrs, x)
    assert e_fused == pytest.approx(e_j, abs=1e-10)


def test_csim_speed_smoke():
    """The fused native energy should evaluate a 10q/200-term/80-gate
    circuit in well under a millisecond-scale budget (COBYLA inner loop)."""
    import time

    n = 10
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    eng = native.CsimEngine(ps)
    tape = random_tape(n, 80, seed=1)
    arrs = tape.arrays()
    x = tape.x0()
    psi0 = zero_state(n, np.complex128)
    eng.tape_energy(psi0, *arrs, x)  # warm
    t0 = time.time()
    for _ in range(20):
        eng.tape_energy(psi0, *arrs, x)
    dt = (time.time() - t0) / 20
    assert dt < 0.05, f"csim energy too slow: {dt*1e3:.1f} ms"


def test_csim_su4_two_qubit_rotations():
    """csim's RXX/RYY/RZZ match the XLA 2q-rotation path (the SU(4) gate
    set rides the native oracle too)."""
    import jax.numpy as jnp

    from tensorrl_qas_tpu import native
    from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
    from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
    from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation

    if not native.available():
        import pytest
        pytest.skip("csim unavailable")
    n = 4
    tape = GateTape(n, 8, 8)
    tape.add(GateKind.RY, target=0, angle=0.4)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.9)
    tape.add(GateKind.RYY, target=3, control=2, angle=-0.6)
    tape.add(GateKind.RZZ, target=2, control=1, angle=1.3)
    tape.add(GateKind.RX, target=3, angle=-0.2)
    ps = PauliSum.from_strings(["ZIII", "IZII", "XXII", "IYYI", "IIZZ"],
                               [1.0, -0.5, 0.7, 0.9, -1.1], n)

    eng = native.CsimEngine(ps)
    import numpy as np
    psi0 = np.asarray(zero_state(n, jnp.complex128))
    e_c = eng.tape_energy(psi0, *(np.asarray(a) for a in tape.arrays()),
                          tape.x0())
    psi = apply_tape(jnp.asarray(psi0), *map(jnp.asarray, tape.arrays()),
                     jnp.asarray(tape.x0()), enable_2q=True)
    e_x = float(pauli_expectation(psi, *ps.device_arrays(jnp.complex128)))
    assert abs(e_c - e_x) < 1e-10


def test_csim_depolarizing_zero_prob_is_noiseless():
    paulis, weights = heisenberg_hamiltonian(5)
    ps = PauliSum.from_strings(paulis, weights, 5)
    eng = native.CsimEngine(ps)
    tape = random_tape(5, 20, seed=3)
    psi0 = np.zeros(32, complex)
    psi0[0] = 1.0
    e0 = eng.tape_energy(psi0, *tape.arrays(), tape.x0())
    ed = eng.tape_energy_depolarizing(psi0, *tape.arrays(), tape.x0(),
                                      0.0, 0.0, 99)
    assert abs(e0 - ed) < 1e-12


def test_csim_depolarizing_trajectory_mean_matches_jax():
    """Statistical parity of the C++ depolarizing channel with the JAX
    twin (sim/noise.py): trajectory-mean energies agree within combined
    standard error at exaggerated noise probabilities."""
    import jax
    from tensorrl_qas_tpu.sim.noise import apply_tape_depolarizing

    n, N = 5, 700
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    eng = native.CsimEngine(ps)
    tape = GateTape(n, 8, 8)
    tape.add_cx(0, 1)
    tape.add(GateKind.RY, target=1, angle=0.3)
    tape.add_cx(1, 2)
    tape.add(GateKind.RX, target=3, angle=-0.7)
    tape.add(GateKind.RZ, target=0, angle=0.2)
    tape.add_cx(3, 4)
    psi0 = np.zeros(2 ** n, complex)
    psi0[0] = 1.0
    p1, p2 = 0.3, 0.6
    es = np.asarray([eng.tape_energy_depolarizing(
        psi0, *tape.arrays(), tape.x0(), p1, p2, 1000 + i)
        for i in range(N)])
    arrs = [jnp.asarray(a) for a in tape.arrays()]
    w, flip, sm, ip = ps.device_arrays(jnp.complex128)
    def traj(key):
        psi = apply_tape_depolarizing(jnp.asarray(psi0), *arrs,
                                      jnp.asarray(tape.x0()), key, p1, p2)
        return jnp.real(pauli_expectation(psi, w, flip, sm, ip))
    ej = jax.vmap(traj)(jax.random.split(jax.random.PRNGKey(7), N))
    se = es.std() / np.sqrt(N) + float(jnp.std(ej)) / np.sqrt(N)
    assert abs(es.mean() - float(jnp.mean(ej))) < 5 * se
