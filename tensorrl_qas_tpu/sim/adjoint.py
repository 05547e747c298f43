"""Adjoint-mode gradients for the XLA statevector path.

``jax.grad`` through ``apply_tape`` stores every per-gate intermediate
statevector for the backward pass: O(G * 2^n) residual memory per energy
evaluation, which overflows HBM once n reaches ~14 with a batched env
loop (the 33 GB program the 14q bench fallback produced).  This module
implements the standard adjoint-differentiation sweep of statevector
simulators (the trick qulacs/lightning use to make VQE gradients
feasible): every tape gate is unitary, so the backward pass *un-applies*
gates instead of storing intermediates —

    E(x)      = <psi_G | H | psi_G>,   psi_G = U_G ... U_1 psi_0
    lam^{(G)} = H psi_G
    for g = G .. 1:
        dE/dtheta_g = 2 Re <lam^{(g)} | dU_g/dtheta psi^{(g-1)}>
                    = Im  <lam^{(g)} | P_g | psi^{(g)}>      (U = e^{-i t P/2})
        psi^{(g-1)} = U_g^dagger psi^{(g)}
        lam^{(g-1)} = U_g^dagger lam^{(g)}

Memory: three statevectors, independent of gate count; compute: ~3 gate
sweeps per gradient (vs 2 for stored-residual autodiff).  Exposed as a
``jax.custom_vjp`` scalar energy so ``jax.value_and_grad`` picks the
sweep up transparently inside the jitted Adam loop.

Gradients are exact w.r.t. ``x`` and ``psi0``; the Pauli-sum arrays and
the integer tape arrays get zero cotangents (they are structural
constants — do not differentiate w.r.t. Hamiltonian coefficients through
this function).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tensorrl_qas_tpu.circuits.tape import GateKind
from tensorrl_qas_tpu.sim.apply import (
    _apply_controlled_1q,
    _apply_two_pauli_rot,
    _gate_matrix,
    apply_tape,
)
from tensorrl_qas_tpu.sim.expectation import pauli_expectation
from tensorrl_qas_tpu.utils.bits import parity

_RX, _RY, _RZ = int(GateKind.RX), int(GateKind.RY), int(GateKind.RZ)
_RXX, _RYY_KIND = int(GateKind.RXX), int(GateKind.RYY)


def apply_pauli_sum(psi, weights, flip, sign_mask, iphase):
    """H |psi> for a mask-form Pauli sum: K-term scan, O(2^n) memory.

    (P psi)[i] = iphase * (1 - 2*parity(i & sign_mask)) * psi[i ^ flip]
    (the operator form matching ``pauli_expectation``'s signed gather).
    """
    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)

    def term(acc, wfsi):
        w, f, sm, ip = wfsi
        signs = (1.0 - 2.0 * parity(idx & sm).astype(jnp.float32)).astype(
            psi.dtype)
        acc = acc + (w * ip).astype(psi.dtype) * signs * jnp.take(
            psi, idx ^ f, axis=-1)
        return acc, None

    out, _ = lax.scan(term, jnp.zeros_like(psi),
                      (weights, flip, sign_mask, iphase))
    return out


def _generator_apply(psi, k, t, c):
    """P_g |psi> for the rotation generator of gate kind ``k``:
    X/Y/Z on target (RX/RY/RZ) or the Pauli pair on (t, c) (RXX/RYY/RZZ).
    Non-rotation kinds produce a don't-care value (their slot is < 0)."""
    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)
    pair = k >= _RXX
    axis = jnp.where((k == _RX) | (k == _RXX), 0,
                     jnp.where((k == _RY) | (k == _RYY_KIND), 1, 2))
    m = (1 << t) | jnp.where(pair, 1 << c, 0)
    f = jnp.where(axis == 2, 0, m)
    sm = jnp.where(axis == 0, 0, m)
    signs = (1.0 - 2.0 * parity(idx & sm).astype(jnp.float32)).astype(
        psi.dtype)
    # Y: (-i) per Y factor -> -i for RY, (-i)^2 = -1 for RYY
    ip = jnp.where(axis == 1,
                   jnp.where(pair, jnp.array(-1.0, psi.dtype),
                             jnp.array(-1j, psi.dtype)),
                   jnp.array(1.0, psi.dtype))
    return ip * signs * jnp.take(psi, idx ^ f, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def adjoint_energy(enable_2q, psi0, kind, tq, cq, slot, x, weights, flip,
                   sign_mask, iphase):
    """<psi(x)|H|psi(x)> with O(1)-in-gates gradient memory (see module
    docstring).  Same value as ``apply_tape`` + ``pauli_expectation``."""
    psi = apply_tape(psi0, kind, tq, cq, slot, x, enable_2q=enable_2q)
    return pauli_expectation(psi, weights, flip, sign_mask, iphase)


def _adj_fwd(enable_2q, psi0, kind, tq, cq, slot, x, weights, flip,
             sign_mask, iphase):
    psi = apply_tape(psi0, kind, tq, cq, slot, x, enable_2q=enable_2q)
    e = pauli_expectation(psi, weights, flip, sign_mask, iphase)
    return e, (psi, kind, tq, cq, slot, x, weights, flip, sign_mask, iphase)


def _adj_bwd(enable_2q, res, ct):
    psi, kind, tq, cq, slot, x, weights, flip, sign_mask, iphase = res
    dtype = psi.dtype
    rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    xs = x.astype(rdtype)
    lam = apply_pauli_sum(psi, weights, flip, sign_mask, iphase)
    # gradient of the Rayleigh quotient E = <psi|H|psi>/<psi|psi> (see
    # pauli_expectation): dE/dpsi* = (H psi - E psi)/<psi|psi>.  The -E psi
    # term contributes nothing to the angle gradients below (for a Pauli
    # generator P, Im<psi|P|psi> = 0), but it is what makes the psi0
    # cotangent exact under normalization.
    n2 = jnp.sum(jnp.real(psi) ** 2 + jnp.imag(psi) ** 2)
    e_val = jnp.sum(jnp.real(jnp.conj(psi) * lam)) / n2
    lam = (lam - e_val.astype(dtype) * psi) / n2.astype(dtype)

    def body(carry, g):
        p, l, grad = carry
        k, t, c, s = g
        theta = jnp.where(s >= 0, xs[jnp.maximum(s, 0)], 0.0)
        pg = _generator_apply(p, k, t, jnp.maximum(c, 0))
        gval = jnp.imag(jnp.sum(jnp.conj(l) * pg)).astype(rdtype)
        grad = grad.at[jnp.maximum(s, 0)].add(
            jnp.where(s >= 0, gval, 0.0))
        # un-apply the gate to BOTH vectors in one gather pass
        z = jnp.stack([p, l])
        u = _gate_matrix(k, -theta, dtype)
        z = _apply_controlled_1q(z, u, t, c)
        if enable_2q:
            z2 = _apply_two_pauli_rot(z, k, -theta, t, jnp.maximum(c, 0))
            z = jnp.where(k >= _RXX, z2, z)
        return (z[0], z[1], grad), None

    grad0 = jnp.zeros(x.shape, rdtype)
    rev = tuple(jnp.flip(a, axis=0) for a in (kind, tq, cq, slot))
    (psi0_rec, lam0, grad), _ = lax.scan(body, (psi, lam, grad0), rev)
    del psi0_rec
    ct_r = jnp.asarray(ct, rdtype)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    # JAX cotangent convention for R-valued f of complex z (as jax.grad
    # returns): 2 * conj(dE/d psi0-bar) = 2 * conj(U^dag H psi)
    return ((2.0 * ct_r).astype(dtype) * jnp.conj(lam0),
            f0(kind), f0(tq), f0(cq), f0(slot),
            (ct_r * grad).astype(x.dtype),
            jnp.zeros_like(weights), f0(flip), f0(sign_mask),
            jnp.zeros_like(iphase))


adjoint_energy.defvjp(_adj_fwd, _adj_bwd)


# -- gather-free (slice-engine) twin ----------------------------------------
#
# TPU gathers of 2^n elements run on the scalar core; at 20q the
# gather-based adjoint spent ~99% of its time in per-gate ``jnp.take``
# (36 s per iters=1 fused step, and the iters=20 S=4 program crashed the
# TPU worker outright).  The slice engine replaces every XOR-partner
# gather with static-axis reshapes (see sim/apply.py _xor_bit_exchange /
# expectation.h_apply_static), turning the whole sweep into
# HBM-bandwidth block copies + VPU elementwise work.

def _generator_apply_slice(psi, k, t, c, enable_2q):
    """Gather-free twin of ``_generator_apply``: the 1- or 2-bit XOR flip
    becomes composed runtime single-bit exchanges (``lax.switch`` over
    static reshapes); signs stay elementwise iota parities."""
    from tensorrl_qas_tpu.sim.apply import _xor_bit_exchange

    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)
    pair = k >= _RXX
    axis = jnp.where((k == _RX) | (k == _RXX), 0,
                     jnp.where((k == _RY) | (k == _RYY_KIND), 1, 2))
    m = (1 << t) | jnp.where(pair, 1 << c, 0)
    sm = jnp.where(axis == 0, 0, m)
    signs = (1.0 - 2.0 * parity(idx & sm).astype(jnp.float32)).astype(
        psi.dtype)
    ip = jnp.where(axis == 1,
                   jnp.where(pair, jnp.array(-1.0, psi.dtype),
                             jnp.array(-1j, psi.dtype)),
                   jnp.array(1.0, psi.dtype))
    ex_t = _xor_bit_exchange(psi, t)
    if enable_2q:
        flipped = jnp.where(pair, _xor_bit_exchange(ex_t, c), ex_t)
    else:
        flipped = ex_t
    permuted = jnp.where(axis == 2, psi, flipped)   # Z-type: flip mask 0
    return ip * signs * permuted


def make_adjoint_energy_slice(enable_2q, pauli_arrays):
    """Build a gather-free ``adjoint_energy`` specialized to one Pauli sum.

    ``pauli_arrays`` (host numpy, from ``PauliSum.device_arrays``) are
    closed over as STATIC data: the flip masks drive trace-time static
    XOR exchanges in ``h_apply_static``, which is what removes the
    gathers.  Returns ``f(psi0, kind, tq, cq, slot, x) -> E`` with the
    same custom-VJP adjoint sweep (O(1)-in-gates memory) as
    ``adjoint_energy``.  Cache the returned function per optimizer — each
    call builds a fresh jaxpr-traceable closure.
    """
    from tensorrl_qas_tpu.sim.apply import (
        _apply_controlled_1q_slice,
        _apply_two_pauli_rot_slice,
    )
    from tensorrl_qas_tpu.sim.expectation import (
        h_apply_static,
        pauli_expectation_static,
    )

    weights, flip, sign_mask, iphase = (np.asarray(a) for a in pauli_arrays)

    @jax.custom_vjp
    def energy_slice(psi0, kind, tq, cq, slot, x):
        psi = apply_tape(psi0, kind, tq, cq, slot, x, enable_2q=enable_2q,
                         engine="slice")
        return pauli_expectation_static(psi, weights, flip, sign_mask,
                                        iphase)

    def fwd(psi0, kind, tq, cq, slot, x):
        psi = apply_tape(psi0, kind, tq, cq, slot, x, enable_2q=enable_2q,
                         engine="slice")
        e = pauli_expectation_static(psi, weights, flip, sign_mask, iphase)
        return e, (psi, kind, tq, cq, slot, x)

    def bwd(res, ct):
        psi, kind, tq, cq, slot, x = res
        dtype = psi.dtype
        rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        xs = x.astype(rdtype)
        lam = h_apply_static(psi, weights, flip, sign_mask, iphase)
        n2 = jnp.sum(jnp.real(psi) ** 2 + jnp.imag(psi) ** 2)
        e_val = jnp.sum(jnp.real(jnp.conj(psi) * lam)) / n2
        lam = (lam - e_val.astype(dtype) * psi) / n2.astype(dtype)

        def body(carry, g):
            p, l, grad = carry
            k, t, c, s = g
            theta = jnp.where(s >= 0, xs[jnp.maximum(s, 0)], 0.0)
            pg = _generator_apply_slice(p, k, t, jnp.maximum(c, 0),
                                        enable_2q)
            gval = jnp.imag(jnp.sum(jnp.conj(l) * pg)).astype(rdtype)
            grad = grad.at[jnp.maximum(s, 0)].add(
                jnp.where(s >= 0, gval, 0.0))
            z = jnp.stack([p, l])
            u = _gate_matrix(k, -theta, dtype)
            z = _apply_controlled_1q_slice(z, u, t, c)
            if enable_2q:
                z2 = _apply_two_pauli_rot_slice(z, k, -theta, t,
                                                jnp.maximum(c, 0))
                z = jnp.where(k >= _RXX, z2, z)
            return (z[0], z[1], grad), None

        grad0 = jnp.zeros(x.shape, rdtype)
        rev = tuple(jnp.flip(a, axis=0) for a in (kind, tq, cq, slot))
        (_, lam0, grad), _ = lax.scan(body, (psi, lam, grad0), rev)
        ct_r = jnp.asarray(ct, rdtype)
        f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
        return ((2.0 * ct_r).astype(dtype) * jnp.conj(lam0),
                f0(kind), f0(tq), f0(cq), f0(slot),
                (ct_r * grad).astype(x.dtype))

    energy_slice.defvjp(fwd, bwd)
    return energy_slice
