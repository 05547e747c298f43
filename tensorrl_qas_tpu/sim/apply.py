"""Differentiable statevector gate application.

TPU-native replacement for the qulacs C++ simulator used in the reference's
hot loop (``environments/VQAs/VQE_qulacs.py:79-86``).  Design:

- The circuit is a *gate tape* of index arrays (see circuits/tape.py), so the
  whole apply is one ``lax.scan`` compiled once per (n_qubits, capacity) and
  reused for every circuit structure, every optimizer iterate, and every
  episode.  Qubit indices are runtime values: gates are applied with
  XOR-partner gathers rather than axis reshapes, which keeps shapes static.
- Every supported gate is expressed as an (optionally controlled) 1-qubit
  unitary, so the scan body is branch-free apart from a tiny 2x2 matrix
  ``lax.switch``.
- Fully differentiable w.r.t. the angle vector (the gather transposes to a
  scatter-add), enabling on-device gradient-based angle optimization in
  place of the reference's host COBYLA.

The statevector is little-endian: qubit q = bit q of the flat index.
"""

import jax
import jax.numpy as jnp
from jax import lax

from tensorrl_qas_tpu.circuits.tape import GateKind


def zero_state(n_qubits: int, dtype=jnp.complex64):
    """|0...0> as a HOST numpy array.

    Deliberately host-side: on some TPU transports complex *device* arrays
    cannot cross jit boundaries (d2h fetch and re-input both fail), while
    complex host->device inputs and fully-fused complex compute are fine.
    Inside a trace this lowers as a constant; as a jit argument it uploads.
    """
    import numpy as np

    psi = np.zeros(1 << n_qubits, dtype=np.dtype(dtype))
    psi[0] = 1.0
    return psi


def _gate_matrix(kind, theta, dtype):
    """2x2 unitary for a gate kind (qiskit rotation-sign convention)."""
    half = theta * 0.5
    c = jnp.cos(half).astype(dtype)
    s = jnp.sin(half).astype(dtype)
    mi = jnp.array(-1j, dtype=dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def m(a, b, c_, d):
        return jnp.stack([jnp.stack([a, b]), jnp.stack([c_, d])])

    eye = lambda: m(one, zero, zero, one)  # noqa: E731
    branches = [
        eye,                                                   # NONE
        lambda: m(c, mi * s, mi * s, c),                       # RX
        lambda: m(c, -s * one, s * one, c),                    # RY
        lambda: m(c + mi * s, zero, zero, c - mi * s),         # RZ
        lambda: m(zero, one, one, zero),                       # CX (X on target)
        lambda: m(zero, one, one, zero),                       # X
        lambda: m(zero, mi, -mi, zero),                        # Y
        lambda: m(one, zero, zero, -one),                      # Z
        lambda: m(one, one, one, -one) / jnp.sqrt(2).astype(dtype),  # H
        eye, eye, eye,   # RXX/RYY/RZZ handled by the 2q-rotation path
    ]
    return lax.switch(kind, branches)


def _apply_two_pauli_rot(psi, kind, theta, qa, qb):
    """exp(-i theta (P_a P_b)/2) for P in {X, Y, Z} (kinds RXX/RYY/RZZ).

    new = cos(t/2) psi - i sin(t/2) (P_a P_b) psi, where the Pauli-pair
    action is a flip-and-phase on the flat index (same masks as the
    expectation kernel): XX flips both bits; YY flips both with
    -(-1)^parity; ZZ phases by (-1)^parity.
    """
    from tensorrl_qas_tpu.circuits.tape import GateKind

    dtype = psi.dtype
    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)
    mask = (1 << qa) | (1 << qb)
    par = ((idx >> qa) & 1) ^ ((idx >> qb) & 1)
    sign = (1.0 - 2.0 * par).astype(dtype)

    is_xx = kind == int(GateKind.RXX)
    is_yy = kind == int(GateKind.RYY)
    flip = jnp.where(is_xx | is_yy, mask, 0)
    phase = jnp.where(is_xx, jnp.ones_like(sign),
                      jnp.where(is_yy, -sign, sign))
    pp = phase * jnp.take(psi, idx ^ flip, axis=-1)
    half = theta * 0.5
    c = jnp.cos(half).astype(dtype)
    s = jnp.sin(half).astype(dtype)
    return c * psi + jnp.array(-1j, dtype) * s * pp


def _apply_controlled_1q(psi, u, target, control):
    """Apply a 1q unitary on ``target``, controlled on ``control`` (< 0: none).

    For flat index i with target bit b: out[i] = u[b,b] psi[i] + u[b,1-b]
    psi[i ^ (1<<target)], gated by the control bit.  psi may be (..., 2^n).
    """
    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)
    b = (idx >> target) & 1
    partner = idx ^ (1 << target)
    active = jnp.where(control >= 0, (idx >> jnp.maximum(control, 0)) & 1, 1)
    diag = jnp.where(b == 0, u[0, 0], u[1, 1])
    off = jnp.where(b == 0, u[0, 1], u[1, 0])
    pp = jnp.take(psi, partner, axis=-1)
    return jnp.where(active == 1, diag * psi + off * pp, psi)


def _xor_bit_exchange(psi, t):
    """psi[i ^ (1 << t)] for a *runtime* bit index t, gather-free.

    ``lax.switch`` over the n possible bit positions; each branch is a
    static reshape to (..., a, 2, b) plus a flip of the length-2 axis —
    pure strided slices, no dynamic gather.  TPU gathers of 2^n elements
    run on the scalar core and dominated the large-n XLA path (the 20q
    fused step spent ~99% of its time in per-gate ``jnp.take``); slices
    are HBM-bandwidth-bound copies instead.
    """
    dim = psi.shape[-1]
    n = dim.bit_length() - 1
    lead = psi.shape[:-1]

    def branch(t_static):
        def f(p):
            a, b = dim >> (t_static + 1), 1 << t_static
            q = p.reshape(*lead, a, 2, b)
            return jnp.flip(q, axis=-2).reshape(*lead, dim)
        return f

    return lax.switch(t, [branch(k) for k in range(n)], psi)


def _apply_controlled_1q_slice(psi, u, target, control):
    """Gather-free twin of ``_apply_controlled_1q`` (same contract).

    The target-bit pairing becomes a ``lax.switch`` over static reshapes
    (..., a, 2, b): the 2x2 mix touches contiguous slices, so the whole
    gate is elementwise VPU work + two block copies.  The control mask
    stays an elementwise iota predicate (runtime control bit).
    """
    dim = psi.shape[-1]
    n = dim.bit_length() - 1
    lead = psi.shape[:-1]

    def branch(t_static):
        def f(p):
            a, b = dim >> (t_static + 1), 1 << t_static
            q = p.reshape(*lead, a, 2, b)
            q0 = q[..., 0, :]
            q1 = q[..., 1, :]
            r0 = u[0, 0] * q0 + u[0, 1] * q1
            r1 = u[1, 0] * q0 + u[1, 1] * q1
            return jnp.stack([r0, r1], axis=-2).reshape(*lead, dim)
        return f

    out = lax.switch(target, [branch(k) for k in range(n)], psi)
    idx = jnp.arange(dim, dtype=jnp.int32)
    active = jnp.where(control >= 0, (idx >> jnp.maximum(control, 0)) & 1, 1)
    return jnp.where(active == 1, out, psi)


def _apply_two_pauli_rot_slice(psi, kind, theta, qa, qb):
    """Gather-free twin of ``_apply_two_pauli_rot``: the two-bit XOR flip
    is two composed single-bit exchanges (RZZ's flip mask is 0 — plain
    psi)."""
    from tensorrl_qas_tpu.circuits.tape import GateKind

    dtype = psi.dtype
    dim = psi.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.int32)
    par = ((idx >> qa) & 1) ^ ((idx >> qb) & 1)
    sign = (1.0 - 2.0 * par).astype(dtype)

    is_xx = kind == int(GateKind.RXX)
    is_yy = kind == int(GateKind.RYY)
    flipped = _xor_bit_exchange(_xor_bit_exchange(psi, qa), qb)
    pp_flip = jnp.where(is_xx | is_yy, flipped, psi)
    phase = jnp.where(is_xx, jnp.ones_like(sign),
                      jnp.where(is_yy, -sign, sign))
    pp = phase * pp_flip
    half = theta * 0.5
    c = jnp.cos(half).astype(dtype)
    s = jnp.sin(half).astype(dtype)
    return c * psi + jnp.array(-1j, dtype) * s * pp


def apply_tape(psi, kind, tq, cq, angle_slot, angles, enable_2q: bool = False,
               engine: str = "gather"):
    """Apply a padded gate tape to a statevector.

    Args:
      psi: (..., 2^n) complex statevector(s).
      kind, tq, cq, angle_slot: (G,) int32 tape arrays (see GateTape).
      angles: (R,) flat angle vector; rotation gate g reads
        ``angles[angle_slot[g]]``.
      enable_2q: compile the RXX/RYY/RZZ path (SU(4) action set).  Static:
        the default scan body stays single-primitive for the CNOT+rotation
        gate set.
      engine: 'gather' (XOR-partner ``jnp.take``, cheap to compile) or
        'slice' (``lax.switch`` over static-axis reshapes — no dynamic
        gather; the large-n fast path, see ``_xor_bit_exchange``).

    Returns the evolved statevector(s), same shape/dtype as ``psi``.
    """
    dtype = psi.dtype
    angles = angles.astype(jnp.float32 if dtype == jnp.complex64 else jnp.float64)

    from tensorrl_qas_tpu.circuits.tape import GateKind

    apply_1q = (_apply_controlled_1q_slice if engine == "slice"
                else _apply_controlled_1q)
    apply_2q = (_apply_two_pauli_rot_slice if engine == "slice"
                else _apply_two_pauli_rot)

    def body(p, g):
        k, t, c, s = g
        theta = jnp.where(s >= 0, angles[jnp.maximum(s, 0)], 0.0)
        u = _gate_matrix(k, theta, dtype)
        out = apply_1q(p, u, t, c)
        if enable_2q:
            out2 = apply_2q(p, k, theta, t, jnp.maximum(c, 0))
            out = jnp.where(k >= int(GateKind.RXX), out2, out)
        return out, None

    psi, _ = lax.scan(body, psi, (kind, tq, cq, angle_slot))
    return psi


def apply_tape_batched(psi0, kind, tq, cq, angle_slot, angles_batch):
    """vmap over a batch of angle vectors sharing one initial state & tape.

    This is the multi-start optimizer workhorse: (B, R) angles -> (B, 2^n)
    states, replacing qulacs' intra-gate OpenMP with on-chip batching.
    """
    return jax.vmap(
        lambda a: apply_tape(psi0, kind, tq, cq, angle_slot, a)
    )(angles_batch)
