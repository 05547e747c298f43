"""Adjoint-mode gradient sweep vs JAX autodiff (sim/adjoint.py).

The custom VJP must return bit-for-bit the same *mathematical* gradient
as differentiating through the stored-residual ``apply_tape`` — the only
difference is memory behavior, which tests cannot see; the value and
gradient parity here is the whole correctness story.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.sim.adjoint import adjoint_energy, apply_pauli_sum
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation
from tests.test_pallas_apply import random_tape


def _ps(n, seed=0):
    rng = np.random.default_rng(seed)
    alphabet = "IXYZ"
    strings, weights = [], []
    for _ in range(7):
        s = "".join(rng.choice(list(alphabet)) for _ in range(n))
        strings.append(s)
        weights.append(float(rng.normal()))
    return PauliSum.from_strings(strings, weights, n)


def _rand_state(n, seed=1):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (v / np.linalg.norm(v)).astype(np.complex64)


def test_apply_pauli_sum_matches_dense():
    n = 4
    ps = _ps(n, seed=3)
    psi = jnp.asarray(_rand_state(n))
    arrs = ps.device_arrays(jnp.complex64)
    hpsi = apply_pauli_sum(psi, *arrs)
    h = ps.to_dense()
    np.testing.assert_allclose(np.asarray(hpsi), h @ np.asarray(psi),
                               atol=1e-5)
    # consistency: <psi|H psi> == pauli_expectation
    e_dot = float(np.real(np.vdot(np.asarray(psi), np.asarray(hpsi))))
    e_exp = float(pauli_expectation(psi, *arrs))
    assert e_dot == pytest.approx(e_exp, abs=1e-5)


@pytest.mark.parametrize("enable_2q", [False, True])
def test_adjoint_energy_value_and_grad_match_autodiff(enable_2q):
    n = 4
    ps = _ps(n, seed=5)
    arrs_h = ps.device_arrays(jnp.complex64)
    if enable_2q:
        tape = GateTape(n, 12, 12)
        tape.add(GateKind.RY, 0, angle=0.4)
        tape.add(GateKind.RXX, target=1, control=0, angle=0.9)
        tape.add(GateKind.RYY, target=2, control=1, angle=-0.2)
        tape.add(GateKind.RZZ, target=3, control=0, angle=1.1)
        tape.add_cx(1, 3)
        tape.add(GateKind.RX, 2, angle=-0.7)
        tape.add(GateKind.RZZ, target=2, control=3, angle=0.5)
    else:
        tape = random_tape(n, 12, seed=9)
    kind, tq, cq, slot = map(jnp.asarray, tape.arrays())
    x = jnp.asarray(tape.x0().astype(np.float32)) + 0.3
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    def e_ref(xv):
        psi = apply_tape(psi0, kind, tq, cq, slot, xv,
                         enable_2q=enable_2q)
        return pauli_expectation(psi, *arrs_h)

    def e_adj(xv):
        return adjoint_energy(enable_2q, psi0, kind, tq, cq, slot, xv,
                              *arrs_h)

    v_ref, g_ref = jax.value_and_grad(e_ref)(x)
    v_adj, g_adj = jax.value_and_grad(e_adj)(x)
    assert float(v_adj) == pytest.approx(float(v_ref), abs=1e-5)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_adjoint_energy_grad_wrt_psi0_matches_autodiff():
    n = 3
    ps = _ps(n, seed=7)
    arrs_h = ps.device_arrays(jnp.complex64)
    tape = random_tape(n, 8, seed=2)
    kind, tq, cq, slot = map(jnp.asarray, tape.arrays())
    x = jnp.asarray(tape.x0().astype(np.float32)) + 0.1
    psi0 = jnp.asarray(_rand_state(n, seed=4))

    def e_ref(p):
        psi = apply_tape(p, kind, tq, cq, slot, x)
        return pauli_expectation(psi, *arrs_h)

    def e_adj(p):
        return adjoint_energy(False, p, kind, tq, cq, slot, x, *arrs_h)

    g_ref = jax.grad(e_ref)(psi0)
    g_adj = jax.grad(e_adj)(psi0)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ref),
                               atol=2e-4)


def test_adjoint_inside_jit_scan():
    """The intended usage shape: value_and_grad inside a jitted scan
    (the Adam loop) with shared-slot gates (scatter-add accumulation)."""
    n = 3
    ps = _ps(n, seed=11)
    arrs_h = ps.device_arrays(jnp.complex64)
    tape = GateTape(n, 8, 4)
    tape.add(GateKind.RY, target=0, angle=0.3)
    tape.add_cx(0, 1)
    # two gates sharing one slot exercises grad accumulation
    tape.add(GateKind.RX, target=2, angle=0.5)
    tape.add(GateKind.RZ, target=1, angle=-0.2)
    kind, tq, cq, slot = map(jnp.asarray, tape.arrays())
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    def e_adj(xv):
        return adjoint_energy(False, psi0, kind, tq, cq, slot, xv, *arrs_h)

    @jax.jit
    def descend(x0):
        def step(xc, _):
            e, g = jax.value_and_grad(e_adj)(xc)
            return xc - 0.1 * g, e
        return jax.lax.scan(step, x0, None, length=30)

    xf, es = descend(x)
    assert float(es[-1]) < float(es[0]) - 1e-4   # actually descends
    # matches autodiff descent exactly
    def e_ref(xv):
        psi = apply_tape(psi0, kind, tq, cq, slot, xv)
        return pauli_expectation(psi, *arrs_h)

    @jax.jit
    def descend_ref(x0):
        def step(xc, _):
            e, g = jax.value_and_grad(e_ref)(xc)
            return xc - 0.1 * g, e
        return jax.lax.scan(step, x0, None, length=30)

    xf_ref, es_ref = descend_ref(x)
    np.testing.assert_allclose(np.asarray(es), np.asarray(es_ref),
                               atol=1e-4)
