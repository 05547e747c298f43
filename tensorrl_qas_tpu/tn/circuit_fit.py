"""Brickwork circuit-TN fitting: compile an MPS into a shallow PQC.

The reference fits a brickwork of SU(4) gates to the DMRG MPS by minimizing
1 - |<qc(params)|mps>| with quimb TN contraction + jitted JAX gradients
(``dmrg-to-qc/mps2qc.py:242-339``, ``tnqc_ansatze.py:46-98``).  TPU-first
re-design: for n <= ~22 the overlap is computed *exactly* on the
statevector — the circuit apply is a chain of static-axis 2-qubit
contractions that XLA fuses, and the whole Stiefel-Adam optimization is one
compiled scan (no TN contraction engine needed; an environment-based MPS
overlap path can extend this beyond 22 qubits).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tensorrl_qas_tpu.tn.mps import MPS
from tensorrl_qas_tpu.tn.stiefel import StiefelAdam


def brickwork_pairs(n: int, n_layers: int) -> list[tuple[int, int]]:
    """(q_hi, q_lo) pairs, even/odd brick pattern (reference
    ``tnqc_ansatze.py:46-98``: layer 0 on (0,1),(2,3),...; layer 1 on
    (1,2),(3,4),...)."""
    pairs = []
    for layer in range(n_layers):
        start = layer % 2
        for i in range(start, n - 1, 2):
            pairs.append((i + 1, i))
    return pairs


def apply_2q(psi, u, q_hi: int, q_lo: int, n: int):
    """Apply a 4x4 unitary (basis 2*b_hi + b_lo) on static qubits."""
    ax_hi, ax_lo = n - 1 - q_hi, n - 1 - q_lo
    t = jnp.moveaxis(psi.reshape((2,) * n), (ax_hi, ax_lo), (0, 1))
    out = jnp.einsum("abcd,cd...->ab...",
                     u.reshape(2, 2, 2, 2).astype(psi.dtype), t)
    out = jnp.moveaxis(out, (0, 1), (ax_hi, ax_lo))
    return out.reshape(-1)


def circuit_state(params, pairs, n: int, dtype=jnp.complex128):
    """|psi(params)> = prod_g U_g |0...0>."""
    psi = jnp.zeros(1 << n, dtype=dtype).at[0].set(1.0)
    for g, (q_hi, q_lo) in enumerate(pairs):
        psi = apply_2q(psi, params[g], q_hi, q_lo, n)
    return psi


def fit_mps_to_circuit(mps: MPS, n_layers: int, maxiter: int = 2000,
                       lr: float = 1e-2, seed: int = 0,
                       init: str = "identity"):
    """Fit a brickwork PQC to the target MPS.

    Returns (params (G,4,4), pairs, overlap, loss_history).
    ``init='identity'`` matches the reference's identity-initialized bricks
    (``tnqc_ansatze.py:60``); 'haar' matches ``mps2qc.py:299-300``.
    """
    n = mps.n_sites
    target = jnp.asarray(mps.to_statevector())
    target = target / jnp.linalg.norm(target)
    pairs = brickwork_pairs(n, n_layers)
    G = len(pairs)

    if init == "identity":
        params0 = jnp.tile(jnp.eye(4, dtype=jnp.complex128), (G, 1, 1))
        # tiny unitary jitter so the identity saddle is left immediately
        rng = np.random.default_rng(seed)
        h = rng.normal(size=(G, 4, 4)) + 1j * rng.normal(size=(G, 4, 4))
        h = (h + np.conj(np.swapaxes(h, 1, 2))) / 2
        from scipy.linalg import expm
        jitter = np.stack([expm(1j * 1e-2 * hk) for hk in h])
        params0 = params0 @ jnp.asarray(jitter)
    elif init == "haar":
        from scipy.stats import unitary_group
        params0 = jnp.asarray(unitary_group.rvs(4, size=G,
                                                random_state=seed))
    else:
        raise ValueError(init)

    def loss_fn(params):
        psi = circuit_state(params, pairs, n)
        return 1.0 - jnp.abs(jnp.vdot(target, psi))

    opt = StiefelAdam(lr=lr, maxiter=maxiter)
    params = opt.minimize(loss_fn, params0)
    overlap = 1.0 - float(loss_fn(jnp.asarray(params)))
    return params, pairs, overlap, opt.loss_history
