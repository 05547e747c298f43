"""Gate-kind-specialized kernel dispatch vs the generic combine.

``ops/pallas_apply.py:_apply_gate_fast`` / ``_bwd_gate_fast`` dispatch on
the gate kind (padding skips, diagonals skip the XOR-partner rolls, X/CX
skip the coefficient algebra) — these must be *exactly* the generic
``_apply_u`` semantics for every kind, including heavily padded tapes
(the production tapes are padded to a static cap, so the padding class is
the most-executed branch early in training).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.ops.pallas_apply import apply_tape_pallas
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state

KINDS = [GateKind.RX, GateKind.RY, GateKind.RZ, GateKind.CX,
         GateKind.X, GateKind.Y, GateKind.Z, GateKind.H]


def tape_of(n, gates, cap):
    """Build a capacity-`cap` tape holding `gates`; the rest is padding."""
    tape = GateTape(n, cap, cap)
    for kind, t, c, ang in gates:
        tape.add(kind, target=t, control=c, angle=ang)
    return tape


@pytest.mark.parametrize("kind", KINDS)
def test_each_kind_matches_xla(kind):
    """One gate of each kind inside a padded tape, on a random state."""
    n = 4
    rng = np.random.default_rng(int(kind))
    t = int(rng.integers(n))
    c = -1
    if kind == GateKind.CX:
        c = int((t + 1 + rng.integers(n - 1)) % n)
    gates = [(GateKind.RY, q, -1, float(rng.uniform(-2, 2)))
             for q in range(n)]                      # entangle-ish prefix
    gates.append((kind, t, c, float(rng.uniform(-np.pi, np.pi))))
    tape = tape_of(n, gates, cap=16)                 # 11 padding gates

    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))[None]

    out_p = apply_tape_pallas(psi0, *arrs, x, True)  # interpret mode
    out_x = apply_tape(psi0[0], *arrs, x)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_x),
                               atol=2e-6)


@pytest.mark.slow
def test_padded_tape_gradients_match_xla():
    """Adjoint gradients through the specialized backward dispatch equal
    jax.grad of the XLA path on a mixed, half-padded tape."""
    n = 3
    rng = np.random.default_rng(7)
    gates = [(GateKind.RX, 0, -1, 0.3), (GateKind.CX, 1, 0, 0.0),
             (GateKind.RZ, 1, -1, -0.8), (GateKind.H, 2, -1, 0.0),
             (GateKind.RY, 2, -1, 1.1), (GateKind.CX, 2, 1, 0.0),
             (GateKind.Z, 0, -1, 0.0), (GateKind.RZ, 0, -1, 0.4)]
    tape = tape_of(n, gates, cap=16)                 # 8 padding gates
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))

    w = jnp.asarray(rng.normal(size=2 ** n).astype(np.float32))

    def loss_pallas(x):
        out = apply_tape_pallas(psi0[None], *arrs, x[None], True)[0]
        return jnp.sum(w * jnp.real(out)) + jnp.sum(w * jnp.imag(out))

    def loss_xla(x):
        out = apply_tape(psi0, *arrs, x)
        return jnp.sum(w * jnp.real(out)) + jnp.sum(w * jnp.imag(out))

    g_p = jax.grad(loss_pallas)(jnp.asarray(x0))
    g_x = jax.grad(loss_xla)(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=3e-6)
