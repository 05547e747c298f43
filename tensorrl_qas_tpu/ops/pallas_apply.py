"""Pallas TPU kernel: fused gate-tape application.

The XLA path (sim/apply.py) lowers each gate of the ``lax.scan`` to a
gather + elementwise combine, with the state bouncing through HBM between
gates.  This kernel keeps the whole (B, 2^n) state batch resident in VMEM
for the entire tape and expresses the XOR-partner permutation as a (D, D)
0/1 matmul built in-register from broadcasted iotas — i.e. the permutation
rides the MXU, which is both faster than a dynamic gather on TPU and free
of dynamic-index lowering restrictions.  Complex amplitudes are carried as
separate re/im f32 planes (TPU has no native complex).

Scope: D = 2^n up to 1024 (n <= 10; the (D, D) partner matrix must fit
VMEM).  Larger n falls back to the XLA gather path.  Tape scalars
(kind/target/control/angle-slot) ride SMEM via scalar prefetch.

Gradients: exposed through ``jax.custom_vjp`` with an adjoint backward pass
(reverse tape of inverse gates) built from the XLA path — forward-only
callers (energy evaluation, COBYLA mode, trajectory sampling) get the full
kernel benefit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrl_qas_tpu.circuits.tape import GateKind

_RX = int(GateKind.RX)
_RY = int(GateKind.RY)
_RZ = int(GateKind.RZ)
_CX = int(GateKind.CX)
_X = int(GateKind.X)
_Y = int(GateKind.Y)
_Z = int(GateKind.Z)
_H = int(GateKind.H)

_INV_SQRT2 = float(1.0 / np.sqrt(2.0))


def _gate_coeffs(k, theta):
    """Scalar (re, im) parts of the 2x2 unitary entries, branchless."""
    c = jnp.cos(0.5 * theta)
    s = jnp.sin(0.5 * theta)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    is_rx = k == _RX
    is_ry = k == _RY
    is_rz = k == _RZ
    is_x = (k == _CX) | (k == _X)
    is_y = k == _Y
    is_z = k == _Z
    is_h = k == _H
    is_rot_diag = is_rx | is_ry           # cos on the diagonal
    is_id = ~(is_rx | is_ry | is_rz | is_x | is_y | is_z | is_h)

    u00r = jnp.where(is_rot_diag, c,
                     jnp.where(is_rz, c,
                               jnp.where(is_h, _INV_SQRT2,
                                         jnp.where(is_id | is_z, one, zero))))
    u00i = jnp.where(is_rz, -s, zero)
    u11r = jnp.where(is_rot_diag, c,
                     jnp.where(is_rz, c,
                               jnp.where(is_h, -_INV_SQRT2,
                                         jnp.where(is_id, one,
                                                   jnp.where(is_z, -one,
                                                             zero)))))
    u11i = jnp.where(is_rz, s, zero)
    u01r = jnp.where(is_ry, -s, jnp.where(is_x, one,
                                          jnp.where(is_h, _INV_SQRT2, zero)))
    u01i = jnp.where(is_rx, -s, jnp.where(is_y, -one, zero))
    u10r = jnp.where(is_ry, s, jnp.where(is_x, one,
                                         jnp.where(is_h, _INV_SQRT2, zero)))
    u10i = jnp.where(is_rx, -s, jnp.where(is_y, one, zero))
    return (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i)


def _kernel(kind_ref, tq_ref, cq_ref, slot_ref, angles_ref,
            re_ref, im_ref, ore_ref, oim_ref):
    d = re_ref.shape[-1]
    n_gates = kind_ref.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (1, d), 1)
    row_i = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    col_j = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    xor_ij = row_i ^ col_j

    ore_ref[:] = re_ref[:]
    oim_ref[:] = im_ref[:]

    def body(g, _):
        k = kind_ref[g]
        t = tq_ref[g]
        c = cq_ref[g]
        s = slot_ref[g]
        theta = jnp.where(s >= 0, angles_ref[jnp.maximum(s, 0)],
                          jnp.float32(0.0))
        (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i) = _gate_coeffs(
            k, theta)

        # partner permutation as an MXU matmul: P[i, j] = [j == i ^ 2^t]
        p = (xor_ij == (1 << t)).astype(jnp.float32)
        re = ore_ref[:]
        im = oim_ref[:]
        pre = jnp.dot(re, p, preferred_element_type=jnp.float32)
        pim = jnp.dot(im, p, preferred_element_type=jnp.float32)

        b = ((col >> t) & 1).astype(jnp.float32)          # target bit
        act = jnp.where(c >= 0,
                        ((col >> jnp.maximum(c, 0)) & 1).astype(jnp.float32),
                        jnp.float32(1.0))                  # control bit

        dr = jnp.where(b == 0, u00r, u11r)
        di = jnp.where(b == 0, u00i, u11i)
        fr = jnp.where(b == 0, u01r, u10r)
        fi = jnp.where(b == 0, u01i, u10i)

        nre = dr * re - di * im + fr * pre - fi * pim
        nim = dr * im + di * re + fr * pim + fi * pre
        ore_ref[:] = act * nre + (1.0 - act) * re
        oim_ref[:] = act * nim + (1.0 - act) * im
        return 0

    lax.fori_loop(0, n_gates, body, 0)


def _pallas_forward(re, im, kind, tq, cq, slot, angles, interpret=False):
    batch, d = re.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,      # kind, tq, cq, slot, angles in SMEM
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((batch, d), jnp.float32),
                   jax.ShapeDtypeStruct((batch, d), jnp.float32)),
        interpret=interpret,
    )(kind, tq, cq, slot, angles.astype(jnp.float32), re, im)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def apply_tape_pallas(psi, kind, tq, cq, slot, angles, interpret=False):
    """Fused tape application: (B, 2^n) complex64 batch -> same.

    Drop-in batched equivalent of ``sim.apply.apply_tape`` for n <= 10.
    """
    re, im = _pallas_forward(jnp.real(psi).astype(jnp.float32),
                             jnp.imag(psi).astype(jnp.float32),
                             kind, tq, cq, slot, angles, interpret)
    return (re + 1j * im).astype(jnp.complex64)


def _fwd(psi, kind, tq, cq, slot, angles, interpret):
    out = apply_tape_pallas(psi, kind, tq, cq, slot, angles, interpret)
    return out, (psi, kind, tq, cq, slot, angles)


def _bwd(interpret, res, g):
    """Adjoint backward via the XLA path (correct for unitary tapes)."""
    from tensorrl_qas_tpu.sim.apply import apply_tape

    psi, kind, tq, cq, slot, angles = res

    def forward(psi, angles):
        return apply_tape(psi, kind, tq, cq, slot, angles)

    _, vjp = jax.vjp(forward, psi, angles)
    dpsi, dangles = vjp(g.astype(psi.dtype))
    return dpsi, None, None, None, None, dangles


apply_tape_pallas.defvjp(_fwd, _bwd)
