"""Gradient-descent MPS ground-state solver (autodiff alternative to DMRG).

Counterpart of the reference's ``gs_autodiff``
(``dmrg-to-qc/mps2qc.py:156-216``), which minimizes the global energy of a
random chi-bounded MPS against a Hamiltonian MPO with quimb's TNOptimizer
(autodiff_backend="jax", default L-BFGS-B).  The reference never calls it
from its driver (``dmrg_to_qc.py`` uses ``gs_dmrg``); we keep the same role
here — an alternative, fully differentiable ground-state path that
cross-validates the sweeping solver.

TPU-first design differences from the reference:

- the whole optimization is ONE jitted ``lax.scan`` of Adam steps over the
  MPS site tensors (static chi-padded shapes), not a host loop of
  scipy L-BFGS iterations calling back into jitted losses;
- complex site tensors are carried as explicit (real, imag) pairs so the
  pytree stays real-valued (no reliance on complex-aware optimizer
  internals) — the energy is a real function of those reals;
- normalization is folded into the loss, E = <psi|H|psi> / <psi|psi>,
  instead of the reference's explicit ``norm_fn`` re-scaling; the returned
  MPS is normalized once at the end.

The MPS/MPO index conventions match ``tn/mps.py`` / ``tn/mpo.py``
(site tensor (chi_l, 2, chi_r); MPO tensor (bond_l, bond_r, s_out, s_in)).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.tn.mpo import MPO
from tensorrl_qas_tpu.tn.mps import MPS


def _energy(res, ims, w_tensors):
    """Rayleigh quotient <psi|H|psi> / <psi|psi> of an MPS (real output)."""
    env = jnp.ones((1, 1, 1), dtype=jnp.complex128)   # (mpo_b, bra_b, ket_b)
    nrm = jnp.ones((1, 1), dtype=jnp.complex128)      # (bra_b, ket_b)
    for re, im, w in zip(res, ims, w_tensors):
        a = re + 1j * im
        env = jnp.einsum("bud,usr,bcst,dtm->crm", env, a.conj(), w, a)
        nrm = jnp.einsum("ud,usr,dtm,st->rm", nrm, a.conj(), a,
                         jnp.eye(2, dtype=jnp.complex128))
    num = env[0, 0, 0].real
    den = nrm[0, 0].real
    return num / den


def gs_autodiff(mpo: MPO, chi: int = 2, opt_steps: int = 2000,
                lr: float = 5e-2, seed: int = 0):
    """Minimize the MPS energy by Adam on a jitted scan.

    Returns ``(energy, mps, loss_history)`` with ``energy`` the best value
    seen (the reference reports ``tnopt.loss_best``), ``mps`` the
    normalized final state, and ``loss_history`` the per-step energies.
    """
    n = mpo.n_sites
    psi0 = MPS.random(n, chi, seed=seed)
    res = [jnp.asarray(t.real) for t in psi0.tensors]
    ims = [jnp.asarray(t.imag) for t in psi0.tensors]
    w_tensors = [jnp.asarray(t) for t in mpo.tensors]

    loss = lambda params: _energy(params[0], params[1], w_tensors)
    val_grad = jax.value_and_grad(loss)

    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam_step(carry, i):
        params, m, v = carry
        e, g = val_grad(params)
        m = jax.tree.map(lambda a, b: b1 * a + (1 - b1) * b, m, g)
        v = jax.tree.map(lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
        t = i + 1.0
        mh = jax.tree.map(lambda a: a / (1 - b1 ** t), m)
        vh = jax.tree.map(lambda a: a / (1 - b2 ** t), v)
        params = jax.tree.map(
            lambda p, a, b: p - lr * a / (jnp.sqrt(b) + eps), params, mh, vh)
        return (params, m, v), e

    @jax.jit
    def run(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        (params, _, _), hist = jax.lax.scan(
            adam_step, (params, zeros, zeros),
            jnp.arange(opt_steps, dtype=jnp.float64))
        return params, hist

    (res_f, ims_f), hist = run((res, ims))
    final_e = float(_energy(res_f, ims_f, w_tensors))
    hist = np.asarray(hist)
    best_e = float(min(hist.min(), final_e))

    tensors = [np.asarray(r) + 1j * np.asarray(i)
               for r, i in zip(res_f, ims_f)]
    mps = MPS(tensors)
    mps.normalize()
    return best_e, mps, hist
