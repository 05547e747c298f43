"""Gather-free slice engine vs the gather engine (XLA path twins).

The slice engine (sim/apply.py `engine='slice'`, expectation
`h_apply_static`, adjoint `make_adjoint_energy_slice`) replaces every
dynamic XOR-partner gather with static-axis reshapes/slices — the
large-n TPU fast path.  These tests pin bit-level agreement of states,
energies, and gradients between the two engines on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.adjoint import (
    adjoint_energy,
    make_adjoint_energy_slice,
)
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import (
    PauliSum,
    h_apply_static,
    pauli_expectation,
    pauli_expectation_static,
)
from test_pallas_apply import random_tape


def _ham(n):
    paulis, weights = heisenberg_hamiltonian(n)
    return PauliSum.from_strings(paulis, weights, n)


@pytest.mark.parametrize("n,gates", [(3, 16), (6, 40), (9, 64)])
def test_apply_tape_slice_matches_gather(n, gates):
    tape = random_tape(n, gates, seed=7 + n)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    out_g = jax.jit(lambda p: apply_tape(p, *arrs, x))(psi0)
    out_s = jax.jit(lambda p: apply_tape(p, *arrs, x, engine="slice"))(psi0)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g),
                               atol=1e-6)


def test_apply_tape_slice_batched():
    """Leading batch dims (the multi-start vmap shape) survive the
    reshape-based branches."""
    n, gates = 5, 24
    tape = random_tape(n, gates, seed=3)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    xs = jnp.asarray(np.stack([x0, x0 + 0.1, x0 - 0.2]))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    f = lambda eng: jax.vmap(  # noqa: E731
        lambda a: apply_tape(psi0, *arrs, a, engine=eng))(xs)
    np.testing.assert_allclose(np.asarray(f("slice")),
                               np.asarray(f("gather")), atol=1e-6)


def test_apply_tape_slice_su4_kinds():
    """RXX/RYY/RZZ through the slice engine (enable_2q path)."""
    n = 4
    tape = GateTape(n, 8, 8)
    tape.add(GateKind.RY, 0, angle=0.4)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.7)
    tape.add(GateKind.RYY, target=2, control=1, angle=-0.3)
    tape.add(GateKind.RZZ, target=3, control=2, angle=1.1)
    tape.add_cx(0, 3)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    out_g = apply_tape(psi0, *arrs, x, enable_2q=True)
    out_s = apply_tape(psi0, *arrs, x, enable_2q=True, engine="slice")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g),
                               atol=1e-6)


@pytest.mark.parametrize("n", [4, 8])
def test_expectation_static_matches(n):
    ps = _ham(n)
    tape = random_tape(n, 30, seed=n)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi = apply_tape(jnp.asarray(zero_state(n, jnp.complex64)), *arrs, x)
    pa = ps.device_arrays(jnp.complex64)

    e_ref = float(pauli_expectation(psi, *pa))
    e_sta = float(jax.jit(
        lambda p: pauli_expectation_static(p, *pa))(psi))
    assert abs(e_sta - e_ref) < 1e-5


def test_expectation_static_intrace_branch(monkeypatch):
    """The in-trace W-plane branch (large-D path) agrees with the
    host-precomputed-constant branch."""
    import tensorrl_qas_tpu.sim.expectation as ex

    n = 6
    ps = _ham(n)
    tape = random_tape(n, 20, seed=1)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi = apply_tape(jnp.asarray(zero_state(n, jnp.complex64)), *arrs, x)
    pa = ps.device_arrays(jnp.complex64)

    e_const = float(pauli_expectation_static(psi, *pa))
    monkeypatch.setattr(ex, "_PLANE_CONST_MAX", 0)
    e_trace = float(pauli_expectation_static(psi, *pa))
    assert abs(e_trace - e_const) < 1e-6


def test_h_apply_static_matches_dense():
    n = 5
    ps = _ham(n)
    rng = np.random.default_rng(0)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    pa = ps.device_arrays(jnp.complex64)

    h_sta = np.asarray(h_apply_static(jnp.asarray(psi), *pa))
    h_dense = ps.to_dense() @ psi
    np.testing.assert_allclose(h_sta, h_dense.astype(np.complex64),
                               atol=1e-5)


@pytest.mark.parametrize("n,gates", [(5, 30), (8, 50)])
def test_adjoint_slice_value_and_grad(n, gates):
    ps = _ham(n)
    tape = random_tape(n, gates, seed=11 + n)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))
    pa = ps.device_arrays(jnp.complex64)

    f_ref = jax.jit(jax.value_and_grad(
        lambda xx: adjoint_energy(False, psi0, *arrs, xx, *pa)))
    f_sli = jax.jit(jax.value_and_grad(
        lambda xx: make_adjoint_energy_slice(False, pa)(psi0, *arrs, xx)))
    e_r, g_r = f_ref(x)
    e_s, g_s = f_sli(x)
    assert abs(float(e_s) - float(e_r)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r), atol=1e-4)


def test_adjoint_slice_su4_grad():
    """Slice adjoint with the 2q rotation kinds enabled."""
    n = 4
    ps = _ham(n)
    tape = GateTape(n, 6, 6)
    tape.add(GateKind.RY, 0, angle=0.4)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.7)
    tape.add(GateKind.RYY, target=2, control=1, angle=-0.3)
    tape.add(GateKind.RZZ, target=3, control=2, angle=0.9)
    tape.add(GateKind.RX, 3, angle=-0.5)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))
    pa = ps.device_arrays(jnp.complex64)

    f_ref = jax.jit(jax.value_and_grad(
        lambda xx: adjoint_energy(True, psi0, *arrs, xx, *pa)))
    f_sli = jax.jit(jax.value_and_grad(
        lambda xx: make_adjoint_energy_slice(True, pa)(psi0, *arrs, xx)))
    e_r, g_r = f_ref(x)
    e_s, g_s = f_sli(x)
    assert abs(float(e_s) - float(e_r)) < 1e-5
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r), atol=1e-4)


@pytest.mark.slow
def test_optimizer_slice_engine_descends(monkeypatch):
    """AngleOptimizer forced onto the slice engine: fused_step descends
    and agrees with the gather engine's trajectory."""
    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer

    n = 6
    ps = _ham(n)
    tape = random_tape(n, 24, seed=5)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    pa = ps.device_arrays(jnp.complex64)
    key = jax.random.PRNGKey(0)

    outs = {}
    for eng in ("gather", "slice"):
        monkeypatch.setenv("TRLQAS_XLA_APPLY", eng)
        opt = AngleOptimizer(pa, iters=12, n_starts=2,
                             dtype=jnp.complex64, use_pallas=False)
        e0 = opt.energy(psi0_ri, arrs, x0)
        x1, e1, _ = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs,
                                   map_idx, key)
        outs[eng] = (e0, x1, e1)
    assert outs["slice"][2] < outs["slice"][0]   # descended
    assert abs(outs["slice"][0] - outs["gather"][0]) < 1e-5
    # energies agree; the angle *trajectories* are compared per-step in
    # test_adjoint_slice_value_and_grad instead — 12 Adam iterations at
    # lr=0.1 amplify 1e-7 engine rounding differences chaotically.
    assert abs(outs["slice"][2] - outs["gather"][2]) < 1e-4

@pytest.mark.slow
def test_fused_step_hostloop_matches_fused(monkeypatch):
    """TRLQAS_FUSED_HOST=1 (the n>=19 large-n path: host-stepped Adam
    around a jitted value+grad body) descends and lands within numerical
    noise of the fully fused scan program on the same inputs."""
    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer

    n = 6
    ps = _ham(n)
    tape = random_tape(n, 24, seed=7)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    pa = ps.device_arrays(jnp.complex64)
    key = jax.random.PRNGKey(3)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("TRLQAS_FUSED_HOST", mode)
        opt = AngleOptimizer(pa, iters=10, n_starts=2,
                             dtype=jnp.complex64, use_pallas=False)
        e0 = opt.energy(psi0_ri, arrs, x0)
        x1, e1, nfev = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots,
                                      arrs, map_idx, key)
        outs[mode] = (e0, x1, e1, nfev)
    assert outs["1"][2] < outs["1"][0]           # descended
    assert outs["1"][3] == outs["0"][3]          # same reported budget
    # same RNG stream (kn/ko split + per-start fold_in(i)) and the same
    # Adam recursion -> the trajectories only differ by the fused path's
    # trailing e_final probe; energies agree tightly
    assert abs(outs["1"][2] - outs["0"][2]) < 2e-4
