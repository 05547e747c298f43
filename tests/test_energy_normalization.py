"""Rayleigh normalization: f32 energies must track the f64 oracle.

Regression guard for the round-3 norm-drift fix: float32 gate application
drifts ||psi||^2 by O(1e-6); without normalization the raw bilinear form
<psi|H|psi> is biased by |E| * drift — O(1e-4) Ha at molecular energy
scales, the same order as chemical accuracy and the published table's
error columns.  ``pauli_expectation`` (and the kernel/sharded
counterparts) therefore evaluate E = <psi|H|psi>/<psi|psi>.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation


def _random_tape(n, n_gates, rng):
    tape = GateTape(n, n_gates, n_gates)
    for _ in range(n_gates):
        if rng.random() < 0.35:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
        else:
            kind = GateKind(int(rng.integers(1, 4)))
            tape.add(kind, target=int(rng.integers(n)),
                     angle=float(rng.uniform(-np.pi, np.pi)))
    return tape


def _random_molecular_scale_hamiltonian(n, K, rng):
    """Pauli sum with molecular-scale coefficients (|E| ~ tens of Ha)."""
    letters = np.array(list("IXYZ"))
    paulis = ["".join(letters[rng.integers(0, 4, size=n)]) for _ in range(K)]
    paulis[0] = "I" * n
    weights = rng.normal(scale=2.0, size=K)
    weights[0] = -60.0          # large identity offset, as in molecular H
    return PauliSum.from_strings(paulis, weights, n)


def test_f32_energy_matches_f64_oracle_molecular_scale():
    rng = np.random.default_rng(3)
    n = 8
    ps = _random_molecular_scale_hamiltonian(n, 120, rng)
    warm = _random_tape(n, 90, rng)
    corr = _random_tape(n, 30, rng)

    def energy(dtype):
        psi0 = apply_tape(zero_state(n, dtype),
                          *map(jnp.asarray, warm.arrays()),
                          jnp.asarray(warm.x0()))
        psi = apply_tape(psi0, *map(jnp.asarray, corr.arrays()),
                         jnp.asarray(corr.x0()))
        return psi, float(pauli_expectation(
            psi, *ps.device_arrays(dtype)))

    psi32, e32 = energy(jnp.complex64)
    _, e64 = energy(jnp.complex128)
    # 120 gates of f32 drift at |E| ~ 60: raw bias would be O(1e-4);
    # normalized evaluation must stay within a few 1e-5 (trajectory
    # rounding only)
    assert abs(e32 - e64) < 5e-5

    # the normalized value is the raw bilinear form over the norm
    e32_raw = float(pauli_expectation(
        psi32, *ps.device_arrays(jnp.complex64), normalize=False))
    n2 = float(jnp.sum(jnp.abs(psi32) ** 2))
    assert e32_raw / n2 == pytest.approx(e32, abs=5e-5)
