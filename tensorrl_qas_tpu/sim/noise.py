"""Noisy statevector evolution: depolarizing trajectories + shot noise.

Reference semantics (``environments/VQAs/VQE_qulacs_noise.py:25-54``):
a TwoQubitDepolarizingNoise(p=0.05) follows every CNOT and a
DepolarizingNoise(p=0.01) follows every rotation; qulacs realizes these by
*trajectory sampling* — each circuit execution draws one random Pauli
realization, so each energy call returns one stochastic sample.  The shot
-noise variant adds per-term Gaussian noise to the exact expectation
(``VQE_qulacs_TN_notin_RL_noise_restricted.py:91-96``).

TPU-native design: the random Pauli insertions ride the same gate-tape scan
(branch-free, one compiled program), with explicit PRNG keys; a vmapped
trajectory *batch* gives a mean-energy estimator whose cost is the same
single compiled program (qulacs would pay a full re-execution per
trajectory).  ``n_traj=1`` reproduces the reference's single-sample
semantics exactly.
"""

import jax
import jax.numpy as jnp
from jax import lax

from tensorrl_qas_tpu.circuits.tape import GateKind
from tensorrl_qas_tpu.sim.apply import _apply_controlled_1q, _gate_matrix

_KIND_X = int(GateKind.X)


def apply_tape_depolarizing(psi, kind, tq, cq, angle_slot, angles, key,
                            p1: float, p2: float):
    """Apply a tape with depolarizing noise after every gate.

    After a rotation on q: with prob ``p1`` apply a uniform random Pauli on
    q.  After a CX: with prob ``p2`` apply a uniform random non-identity
    Pauli pair on (control, target) (15 combinations — qulacs
    TwoQubitDepolarizingNoise convention).
    """
    dtype = psi.dtype
    rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    angles = angles.astype(rdt)
    n_gates = kind.shape[0]
    gate_keys = jax.random.split(key, n_gates)

    def pauli_kind(code):
        # 0 -> NONE, 1..3 -> X/Y/Z
        return jnp.where(code == 0, int(GateKind.NONE), _KIND_X + code - 1)

    def body(p, xs):
        k, t, c, s, gkey = xs
        theta = jnp.where(s >= 0, angles[jnp.maximum(s, 0)], 0.0)
        u = _gate_matrix(k, theta, dtype)
        p = _apply_controlled_1q(p, u, t, c)

        k1, k2, k3 = jax.random.split(gkey, 3)
        is_rot = (k >= int(GateKind.RX)) & (k <= int(GateKind.RZ))
        is_cx = k == int(GateKind.CX)

        # single-qubit channel on the target
        fire1 = is_rot & (jax.random.uniform(k1) < p1)
        code1 = jax.random.randint(k2, (), 1, 4)
        # two-qubit channel: index 1..15 -> (pauli on ctrl, pauli on targ)
        fire2 = is_cx & (jax.random.uniform(k1) < p2)
        j = jax.random.randint(k3, (), 1, 16)
        code_ctrl = j // 4
        code_targ = j % 4

        pk_t = jnp.where(fire1, pauli_kind(code1),
                         jnp.where(fire2, pauli_kind(code_targ),
                                   int(GateKind.NONE)))
        pk_c = jnp.where(fire2, pauli_kind(code_ctrl), int(GateKind.NONE))

        p = _apply_controlled_1q(p, _gate_matrix(pk_t, 0.0, dtype), t, -1)
        # control-qubit pauli (only meaningful for CX; cq >= 0 there)
        p = _apply_controlled_1q(p, _gate_matrix(pk_c, 0.0, dtype),
                                 jnp.maximum(c, 0), -1)
        return p, None

    psi, _ = lax.scan(body, psi, (kind, tq, cq, angle_slot, gate_keys))
    return psi


def shot_noise(weights, n_shots: int, key):
    """Per-term Gaussian sampling noise: sum_k w_k N(0, n_shots^{-1/2})
    (reference ``VQE_qulacs_TN_notin_RL_noise_restricted.py:61-62, 91-96``)."""
    sigma = n_shots ** (-0.5)
    eps = jax.random.normal(key, (weights.shape[0],), dtype=weights.dtype)
    return jnp.dot(weights, eps) * sigma
