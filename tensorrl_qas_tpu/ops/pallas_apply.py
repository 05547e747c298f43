"""Pallas TPU kernels: fused gate-tape application, forward and adjoint.

The XLA path (sim/apply.py) lowers each gate of the ``lax.scan`` to a
gather + elementwise combine — a ~2G-kernel chain per energy+gradient
evaluation whose cost is pure launch latency at statevector sizes.  These
kernels keep the whole (B, 2^n) state batch resident in VMEM for the
entire tape:

- the XOR-partner permutation is a pair of +/- cyclic lane rolls with a
  per-element target-bit select (exact f32 shuffles; no dynamic gathers,
  no (D, D) masks, no MXU rounding);
- complex amplitudes are separate re/im f32 planes (TPU has no native
  complex), which also sidesteps complex-at-jit-boundary transport issues;
- each batch row carries its OWN angle vector (the multi-start optimizer);
- the backward kernel implements adjoint differentiation in one pass:
  undo gates with U^H on the state, propagate the cotangent with U^T
  (JAX's vjp convention: d<theta> = Re[(dpsi/dtheta)^T g], verified against
  jax.vjp), and accumulate d<theta>_g = 1/2 Im[(P_g psi)^T lambda].

Scope: D = 2^n <= 1024 (the (B, D) state blocks must fit VMEM) and the
CNOT+rotation(+pauli/H) gate set; larger n or the SU(4) two-qubit-rotation
set falls back to the XLA path.
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
_RXX = int(GateKind.RXX)
_RYY = int(GateKind.RYY)
_RZZ = int(GateKind.RZZ)

_INV_SQRT2 = float(1.0 / np.sqrt(2.0))


def _mm(a, b):
    """f32 matmul at full precision.  The MXU's default one-pass bf16
    multiply rounds psi to 8 mantissa bits; over a ~40-gate tape that
    accumulates to ~5e-3 Ha of energy error — far above the 1.6e-3
    chemical-accuracy gate.  HIGHEST (3-pass bf16 decomposition) restores
    f32-level precision at 3x matmul cost."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)

PALLAS_MAX_DIM = 1024
PALLAS_KINDS_OK = (_RX, _RY, _RZ, _CX, _X, _Y, _Z, _H, int(GateKind.NONE),
                   _RXX, _RYY, _RZZ)


def _gate_coeffs(k, theta):
    """(re, im) parts of the 2x2 unitary entries; theta may be (B, 1)."""
    c = jnp.cos(0.5 * theta)
    s = jnp.sin(0.5 * theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)

    is_rx = k == _RX
    is_ry = k == _RY
    is_rz = k == _RZ
    is_x = (k == _CX) | (k == _X)
    is_y = k == _Y
    is_z = k == _Z
    is_h = k == _H
    is_rot_diag = is_rx | is_ry
    is_id = ~(is_rx | is_ry | is_rz | is_x | is_y | is_z | is_h)

    u00r = jnp.where(is_rot_diag | is_rz, c,
                     jnp.where(is_h, _INV_SQRT2 * one,
                               jnp.where(is_id | is_z, one, zero)))
    u00i = jnp.where(is_rz, -s, zero)
    u11r = jnp.where(is_rot_diag | is_rz, c,
                     jnp.where(is_h, -_INV_SQRT2 * one,
                               jnp.where(is_id, one,
                                         jnp.where(is_z, -one, zero))))
    u11i = jnp.where(is_rz, s, zero)
    u01r = jnp.where(is_ry, -s, jnp.where(is_x, one,
                                          jnp.where(is_h, _INV_SQRT2 * one,
                                                    zero)))
    u01i = jnp.where(is_rx, -s, jnp.where(is_y, -one, zero))
    u10r = jnp.where(is_ry, s, jnp.where(is_x, one,
                                         jnp.where(is_h, _INV_SQRT2 * one,
                                                   zero)))
    u10i = jnp.where(is_rx, -s, jnp.where(is_y, one, zero))
    return (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i)


def _xor_lane(x, t, d):
    """x[..., c ^ (1<<t)] for a runtime bit t: element c needs the value at
    c + 2^t when bit t of c is 0 and at c - 2^t when it is 1, i.e. a +/-
    cyclic lane roll selected per element.  Exact f32 shuffles — no MXU,
    no bf16 rounding, no (D, D) mask in VMEM."""
    col = lax.broadcasted_iota(jnp.int32, (1, d), 1)
    s = 1 << jnp.maximum(t, 0)
    b = (col >> t) & 1
    return jnp.where(b == 1, pltpu.roll(x, s, 1),
                     pltpu.roll(x, (d - s) % d, 1))


# -- MXU permutation-matmul partner exchange (VERDICT r4 item 5) -----------
#
# An XOR partner over lane bits is x @ P with P[i, j] = ((i ^ j) == m) —
# a 0/1 permutation matrix built from iotas in-kernel.  The state operand
# uses HIGHEST (bf16x3 = exact f32 split) and the 0/1 matrix DEFAULT (one
# pass), so the product is EXACT and the double exchange of an RXX/RYY
# gate (4 rolls + 2 selects + an intermediate full-plane dependency)
# collapses into ONE matmul on the otherwise-idle MXU.
# TRLQAS_SU4_PMUL: "1" force on, "0" force off, "auto" (default) = off
# until validated on hardware (flip to d-bounded on after the chip A/B).
_SU4_PMUL_ENV = None


def _su4_pmul(d: int) -> bool:
    global _SU4_PMUL_ENV
    if _SU4_PMUL_ENV is None:
        import os

        _SU4_PMUL_ENV = os.environ.get("TRLQAS_SU4_PMUL", "auto")
    if _SU4_PMUL_ENV == "1":
        return True
    if _SU4_PMUL_ENV == "0":
        return False
    # auto: off until the on-chip A/B validates a win (the roll path is
    # the hardware-proven default; interpret-mode tests pin exactness of
    # the pmul path either way)
    return False


def _xor2_pair(a, b, t, c, d):
    """(a[.., i^m], b[.., i^m]) for m = 2^t ^ 2^c via one exact
    permutation matmul over both planes (stacked along rows)."""
    m = (1 << jnp.maximum(t, 0)) ^ (1 << jnp.maximum(c, 0))
    i = lax.broadcasted_iota(jnp.int32, (d, d), 0)
    j = lax.broadcasted_iota(jnp.int32, (d, d), 1)
    p = ((i ^ j) == m).astype(jnp.float32)
    ab = jnp.concatenate([a, b], axis=0)
    # uniform HIGHEST: Mosaic rejects per-operand precision tuples on
    # real TPU ("Per-operand dot precision unsupported", r5 probe); the
    # bf16x-split pass is exact for the 0/1 matrix operand regardless
    r = lax.dot_general(
        ab, p, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    h = a.shape[0]
    return r[:h], r[h:]


def _apply_u(re, im, coeffs, t, b, act):
    """One (controlled) 1q combine on re/im planes.

    coeffs: the 8 entry parts, each (B, 1); t: target qubit (runtime
    scalar); b: (1, D) target-bit; act: (1, D) control activity.
    """
    (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i) = coeffs
    d = re.shape[-1]
    pre = _xor_lane(re, t, d)
    pim = _xor_lane(im, t, d)
    dr = jnp.where(b == 0, u00r, u11r)
    di = jnp.where(b == 0, u00i, u11i)
    fr = jnp.where(b == 0, u01r, u10r)
    fi = jnp.where(b == 0, u01i, u10i)
    nre = dr * re - di * im + fr * pre - fi * pim
    nim = dr * im + di * re + fr * pim + fi * pre
    return (act * nre + (1.0 - act) * re,
            act * nim + (1.0 - act) * im, pre, pim)


def _masks(t, c, col):
    b = ((col >> t) & 1).astype(jnp.float32)
    act = jnp.where(c >= 0,
                    ((col >> jnp.maximum(c, 0)) & 1).astype(jnp.float32),
                    jnp.float32(1.0))
    return b, act


_NONE = int(GateKind.NONE)


def _gate_class(k, c):
    """Scalar dispatch index for ``_apply_gate_fast`` / ``_bwd_gate_fast``:
    0 = identity/padding, 1 = uncontrolled diagonal (RZ, Z),
    2 = permutation (X, CX), 3 = uncontrolled RX, 4 = uncontrolled RY,
    5 = generic (H, Y, and any controlled rotation/diagonal),
    6 = RZZ (diagonal two-qubit rotation, no rolls),
    7 = RXX/RYY (two-qubit rotation, double XOR-partner rolls).

    Classes 6/7 are the SU(4) action set (reference
    ``VQE_qulacs_su4.py:70-91``); for them ``c`` is the SECOND QUBIT of
    the rotation, not a control.

    Routing *controlled* 1q rotations to the generic class lets the
    rotation branches drop the control blend entirely (the CNOT+rotation
    action set never emits them; the tape format allows them, so
    semantics are preserved via the generic path)."""
    unctrl = c < 0
    return jnp.where(
        k == _NONE, 0,
        jnp.where(((k == _RZ) | (k == _Z)) & unctrl, 1,
                  jnp.where((k == _CX) | (k == _X), 2,
                            jnp.where((k == _RX) & unctrl, 3,
                                      jnp.where((k == _RY) & unctrl, 4,
                                                jnp.where(k == _RZZ, 6,
                                                          jnp.where(
                                                              (k == _RXX)
                                                              | (k == _RYY),
                                                              7, 5)))))))


def _theta_sel(xmat, s, slot_row):
    """Exact (S, 1) angle-column selection on the VPU.

    The one-hot MXU contraction needs Precision.HIGHEST (3 bf16 passes)
    to keep angles exact; a compare + masked row-sum is bit-exact in one
    VPU pass and keeps the MXU out of the per-gate critical path."""
    hit = (slot_row == s).astype(jnp.float32)          # (1, R)
    return jnp.sum(xmat * hit, axis=-1, keepdims=True)  # (S, 1)


def _apply_gate_fast(re, im, k, t, c, s, xmat, slot_row, col):
    """Gate-kind-specialized (controlled) 1q combine.

    Semantically identical to coeff-select + ``_apply_u`` but dispatches
    on the (scalar) gate kind, and each branch computes ONLY what it
    needs — angle selection, trig, masks, and rolls are all inside the
    branches (measured: the unconditional prefix was ~40% of the per-gate
    critical path).  The serial gate chain is latency-bound on the VPU,
    so this is a direct wall-clock lever:

      - identity/padding gates skip everything (tapes are padded to a
        static cap; early-training tapes are mostly padding);
      - RZ/Z skip the four XOR-partner lane rolls and the control blend;
      - X/CX skip angles/trig entirely (conditional permutation only);
      - RX/RY use their real-coefficient two-term forms, no blend;
      - H, Y, controlled rotations take the generic ``_apply_u`` path.
    """
    d = re.shape[-1]

    def cls_none(_):
        return re, im

    def cls_diag(_):
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        is_z = k == _Z
        u0r = jnp.where(is_z, 1.0, cth)
        u0i = jnp.where(is_z, 0.0, -sth)
        u1r = jnp.where(is_z, -1.0, cth)
        u1i = jnp.where(is_z, 0.0, sth)
        b = (col >> t) & 1
        dr = jnp.where(b == 0, u0r, u1r)
        di = jnp.where(b == 0, u0i, u1i)
        return dr * re - di * im, dr * im + di * re

    def cls_perm(_):
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        act = jnp.where(
            c >= 0,
            ((col >> jnp.maximum(c, 0)) & 1).astype(jnp.float32),
            jnp.float32(1.0))
        inv = 1.0 - act
        return act * pre + inv * re, act * pim + inv * im

    def cls_rx(_):
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        return cth * re + sth * pim, cth * im - sth * pre

    def cls_ry(_):
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        b = ((col >> t) & 1).astype(jnp.float32)
        fr = sth * (2.0 * b - 1.0)
        return cth * re + fr * pre, cth * im + fr * pim

    def cls_generic(_):
        th = jnp.where(s >= 0, _theta_sel(xmat, s, slot_row),
                       jnp.float32(0.0))
        coeffs = _gate_coeffs(k, th)
        b, act = _masks(t, c, col)
        nre, nim, _, _ = _apply_u(re, im, coeffs, t, b, act)
        return nre, nim

    def cls_rzz(_):
        # exp(-i th/2 Z@Z): diagonal phase by the (t, c)-bit parity
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        z = 1.0 - 2.0 * (((col >> t) ^ (col >> c)) & 1).astype(jnp.float32)
        return cth * re + sth * z * im, cth * im - sth * z * re

    def cls_r2q(_):
        # exp(-i th/2 {X@X, Y@Y}): partner = psi[i ^ 2^t ^ 2^c] via two
        # roll pairs (or ONE permutation matmul on the MXU — _su4_pmul);
        # YY carries the (-1)^(bit_t + bit_c) sign
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        if _su4_pmul(d):
            pre2, pim2 = _xor2_pair(re, im, t, c, d)
        else:
            pre2 = _xor_lane(_xor_lane(re, t, d), c, d)
            pim2 = _xor_lane(_xor_lane(im, t, d), c, d)
        z = 1.0 - 2.0 * (((col >> t) ^ (col >> c)) & 1).astype(jnp.float32)
        f = jnp.where(k == _RXX, 1.0, -z)
        return cth * re + sth * f * pim2, cth * im - sth * f * pre2

    return lax.switch(_gate_class(k, c),
                      [cls_none, cls_diag, cls_perm, cls_rx, cls_ry,
                       cls_generic, cls_rzz, cls_r2q], 0)


def _bwd_gate_fast(re, im, lre, lim, k, t, c, s, xmat, slot_row, col):
    """Gate-kind-specialized adjoint step: one reverse-pass gate.

    Returns ``(nre, nim, nlre, nlim, contrib)`` where (nre, nim) is the
    state with this gate undone (U^H), (nlre, nlim) the cotangent
    propagated through U^T, and ``contrib`` the (S, 1) angle-gradient
    row 1/2 Im[(P psi)^T lambda] (zero for gates without an angle slot —
    callers additionally mask by slot validity).

    Same dispatch classes as ``_apply_gate_fast`` and the same
    everything-in-the-branch structure: angle selection, trig, and masks
    are computed only by the classes that need them.  Beyond skipping
    work per class, the rotation classes REUSE the state's XOR-partner
    rolls between the gradient term and the U^H undo (the generic path
    computes them twice), and the diagonal class needs no rolls at all.
    """
    d = re.shape[-1]
    zero_c = jnp.zeros((re.shape[0], 1), jnp.float32)

    def grad(pr, pi):
        return 0.5 * jnp.sum(pr * lim + pi * lre, axis=-1, keepdims=True)

    def cls_none(_):
        return re, im, lre, lim, zero_c

    def cls_diag(_):
        # uncontrolled RZ / Z: diagonal, so no rolls and no blend
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        is_z = k == _Z
        b = (col >> t) & 1
        sgn = 1.0 - 2.0 * b.astype(jnp.float32)
        dr = jnp.where(is_z, sgn, cth)
        di = jnp.where(is_z, 0.0,
                       jnp.where(b == 0, -sth, sth))
        cg = grad(sgn * re, sgn * im)
        return (dr * re + di * im, dr * im - di * re,
                dr * lre - di * lim, dr * lim + di * lre, cg)

    def cls_perm(_):
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        plre = _xor_lane(lre, t, d)
        plim = _xor_lane(lim, t, d)
        act = jnp.where(
            c >= 0,
            ((col >> jnp.maximum(c, 0)) & 1).astype(jnp.float32),
            jnp.float32(1.0))
        inv = 1.0 - act
        return (act * pre + inv * re, act * pim + inv * im,
                act * plre + inv * lre, act * plim + inv * lim, zero_c)

    def cls_rx(_):
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        plre = _xor_lane(lre, t, d)
        plim = _xor_lane(lim, t, d)
        cg = grad(pre, pim)
        return (cth * re - sth * pim, cth * im + sth * pre,
                cth * lre + sth * plim, cth * lim - sth * plre, cg)

    def cls_ry(_):
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        plre = _xor_lane(lre, t, d)
        plim = _xor_lane(lim, t, d)
        b = ((col >> t) & 1).astype(jnp.float32)
        sgn = 1.0 - 2.0 * b
        cg = grad(sgn * pim, -sgn * pre)
        fr = sth * (2.0 * b - 1.0)
        return (cth * re - fr * pre, cth * im - fr * pim,
                cth * lre - fr * plre, cth * lim - fr * plim, cg)

    def cls_generic(_):
        th = jnp.where(s >= 0, _theta_sel(xmat, s, slot_row),
                       jnp.float32(0.0))
        (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i) = \
            _gate_coeffs(k, th)
        b, act = _masks(t, c, col)
        sgn = 1.0 - 2.0 * b
        pre = _xor_lane(re, t, d)
        pim = _xor_lane(im, t, d)
        is_rx = (k == _RX).astype(jnp.float32)
        is_ry = (k == _RY).astype(jnp.float32)
        is_rz = (k == _RZ).astype(jnp.float32)
        pr = is_rx * pre + is_ry * (sgn * pim) + is_rz * (sgn * re)
        pi = is_rx * pim + is_ry * (-sgn * pre) + is_rz * (sgn * im)
        cg = grad(act * pr, act * pi)
        ch = (u00r, -u00i, u10r, -u10i, u01r, -u01i, u11r, -u11i)
        nre, nim, _, _ = _apply_u(re, im, ch, t, b, act)
        ct = (u00r, u00i, u10r, u10i, u01r, u01i, u11r, u11i)
        nlr, nli, _, _ = _apply_u(lre, lim, ct, t, b, act)
        return nre, nim, nlr, nli, cg

    def cls_rzz(_):
        # diagonal: G psi = z psi; U^T = U, U^H = U(-th); no rolls
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        z = 1.0 - 2.0 * (((col >> t) ^ (col >> c)) & 1).astype(jnp.float32)
        cg = grad(z * re, z * im)
        return (cth * re - sth * z * im, cth * im + sth * z * re,
                cth * lre + sth * z * lim, cth * lim - sth * z * lre, cg)

    def cls_r2q(_):
        # XX / YY are real symmetric, so U^T = U and U^H = U(-th);
        # G psi_after = partner (XX) or -z * partner (YY)
        th = _theta_sel(xmat, s, slot_row)
        cth = jnp.cos(0.5 * th)
        sth = jnp.sin(0.5 * th)
        if _su4_pmul(d):
            pre2, pim2 = _xor2_pair(re, im, t, c, d)
            plre2, plim2 = _xor2_pair(lre, lim, t, c, d)
        else:
            pre2 = _xor_lane(_xor_lane(re, t, d), c, d)
            pim2 = _xor_lane(_xor_lane(im, t, d), c, d)
            plre2 = _xor_lane(_xor_lane(lre, t, d), c, d)
            plim2 = _xor_lane(_xor_lane(lim, t, d), c, d)
        z = 1.0 - 2.0 * (((col >> t) ^ (col >> c)) & 1).astype(jnp.float32)
        f = jnp.where(k == _RXX, 1.0, -z)
        cg = grad(f * pre2, f * pim2)
        return (cth * re - sth * f * pim2, cth * im + sth * f * pre2,
                cth * lre + sth * f * plim2, cth * lim - sth * f * plre2,
                cg)

    return lax.switch(_gate_class(k, c),
                      [cls_none, cls_diag, cls_perm, cls_rx, cls_ry,
                       cls_generic, cls_rzz, cls_r2q], 0)


def _fwd_kernel(kind_ref, tq_ref, cq_ref, slot_ref, angles_ref,
                re_ref, im_ref, ore_ref, oim_ref):
    """Grid over env replicas: program e applies ITS tape (row e of the
    prefetched scalar arrays) to its (S, D) block of states/angles."""
    e = pl.program_id(0)
    d = re_ref.shape[-1]
    n_gates = kind_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, d), 1)

    ore_ref[:] = re_ref[:]
    oim_ref[:] = im_ref[:]

    r = angles_ref.shape[-1]
    slot_row = lax.broadcasted_iota(jnp.int32, (1, r), 1)

    def body(g, _):
        k = kind_ref[e, g]
        t = tq_ref[e, g]
        c = cq_ref[e, g]
        s = slot_ref[e, g]
        nre, nim = _apply_gate_fast(ore_ref[0], oim_ref[0], k, t, c, s,
                                    angles_ref[0], slot_row, col)
        ore_ref[0] = nre
        oim_ref[0] = nim
        return 0

    lax.fori_loop(0, n_gates, body, 0)


def _bwd_kernel(kind_ref, tq_ref, cq_ref, slot_ref, angles_ref,
                ore_ref, oim_ref, gre_ref, gim_ref,
                dre_ref, dim_ref, dang_ref,
                psr_ref, psi_ref_s):
    """Adjoint pass (grid over env replicas): inputs are the forward OUTPUT
    state and the cotangent; outputs the psi0-cotangent and per-angle
    gradients (S, R) per program."""
    e = pl.program_id(0)
    d = ore_ref.shape[-1]
    n_gates = kind_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, (1, d), 1)

    psr_ref[:] = ore_ref[0]       # psi (state) scratch
    psi_ref_s[:] = oim_ref[0]
    # complex cotangent G = gre - i*gim (real-plane cotangents relate to
    # the complex one with a conjugated imaginary part under JAX's
    # dtheta = Re[(dpsi/dtheta)^T G] convention)
    dre_ref[0] = gre_ref[0]
    dim_ref[0] = -gim_ref[0]
    dang_ref[:] = jnp.zeros_like(dang_ref)

    r = angles_ref.shape[-1]
    slot_row = lax.broadcasted_iota(jnp.int32, (1, r), 1)

    def body(i, _):
        g = n_gates - 1 - i
        k = kind_ref[e, g]
        t = tq_ref[e, g]
        c = cq_ref[e, g]
        s = slot_ref[e, g]
        # one specialized step: angle-gradient row + U^H state undo + U^T
        # cotangent propagation (class-dispatched; rolls shared)
        nre, nim, nlr, nli, contrib = _bwd_gate_fast(
            psr_ref[:], psi_ref_s[:], dre_ref[0], dim_ref[0],
            k, t, c, s, angles_ref[0], slot_row, col)
        psr_ref[:] = nre
        psi_ref_s[:] = nim
        dre_ref[0] = nlr
        dim_ref[0] = nli
        # dynamic-lane stores are unsupported: scatter via one-hot row
        has_angle = (s >= 0).astype(jnp.float32)
        dang_ref[0] = dang_ref[0] + has_angle * contrib * (
            slot_row == s).astype(jnp.float32)
        return 0

    lax.fori_loop(0, n_gates, body, 0)
    # back to real-plane convention for the psi0 cotangent
    dim_ref[0] = -dim_ref[0]


def _esd_spec(s_batch, x):
    """Block spec for an (E, S, X) array: one (1, S, X) block per program.
    (index_map receives the scalar-prefetch refs as trailing args.)"""
    return pl.BlockSpec((1, s_batch, x), lambda e, *_: (e, 0, 0),
                        memory_space=pltpu.VMEM)


def _call_fwd(re, im, kind, tq, cq, slot, angles, interpret):
    n_env, s_batch, d = re.shape
    r = angles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_env,),
        in_specs=[_esd_spec(s_batch, r), _esd_spec(s_batch, d),
                  _esd_spec(s_batch, d)],
        out_specs=(_esd_spec(s_batch, d), _esd_spec(s_batch, d)),
    )
    return pl.pallas_call(
        _fwd_kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_env, s_batch, d), jnp.float32),) * 2,
        interpret=interpret,
    )(kind, tq, cq, slot, angles.astype(jnp.float32), re, im)


def _call_bwd(ore, oim, gre, gim, kind, tq, cq, slot, angles, interpret):
    n_env, s_batch, d = ore.shape
    r = angles.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_env,),
        in_specs=[_esd_spec(s_batch, r)] + [_esd_spec(s_batch, d)] * 4,
        out_specs=(_esd_spec(s_batch, d), _esd_spec(s_batch, d),
                   _esd_spec(s_batch, r)),
        scratch_shapes=[pltpu.VMEM((s_batch, d), jnp.float32),
                        pltpu.VMEM((s_batch, d), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd_kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_env, s_batch, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_env, s_batch, d), jnp.float32),
                   jax.ShapeDtypeStruct((n_env, s_batch, r), jnp.float32)),
        interpret=interpret,
    )(kind, tq, cq, slot, angles.astype(jnp.float32), ore, oim, gre, gim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def apply_tape_pallas_ri(re, im, kind, tq, cq, slot, angles,
                         interpret=False):
    """Fused multi-env multi-start tape application on re/im planes.

    re/im: (E, S, D) f32 — E env replicas (each with its own tape) x S
    angle candidates; angles: (E, S, R) f32; kind/tq/cq/slot: (E, G) int32.
    Returns (re, im) of the evolved states.
    """
    return _call_fwd(re, im, kind, tq, cq, slot, angles, interpret)


def _fwd_rule(re, im, kind, tq, cq, slot, angles, interpret):
    ore, oim = _call_fwd(re, im, kind, tq, cq, slot, angles, interpret)
    return (ore, oim), (ore, oim, kind, tq, cq, slot, angles)


def _int_zero(x):
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _bwd_rule(interpret, res, g):
    ore, oim, kind, tq, cq, slot, angles = res
    gre, gim = g
    dre, dim_, dang = _call_bwd(ore, oim, gre, gim, kind, tq, cq, slot,
                                angles, interpret)
    return (dre, dim_, _int_zero(kind), _int_zero(tq), _int_zero(cq),
            _int_zero(slot), dang)


apply_tape_pallas_ri.defvjp(_fwd_rule, _bwd_rule)


def apply_tape_pallas(psi, kind, tq, cq, slot, angles, interpret=False):
    """Compatibility wrapper: (B, D) complex batch, one tape, shared (R,)
    or per-row (B, R) angles."""
    b = psi.shape[0]
    ang = jnp.tile(angles[None, :].astype(jnp.float32), (b, 1)) \
        if angles.ndim == 1 else angles
    re, im = apply_tape_pallas_ri(
        jnp.real(psi).astype(jnp.float32)[None],
        jnp.imag(psi).astype(jnp.float32)[None],
        jnp.asarray(kind)[None], jnp.asarray(tq)[None],
        jnp.asarray(cq)[None], jnp.asarray(slot)[None], ang[None], interpret)
    return (re[0] + 1j * im[0]).astype(jnp.complex64)


def pallas_supported(n_qubits: int, kinds) -> bool:
    return ((1 << n_qubits) <= PALLAS_MAX_DIM
            and bool(np.all(np.isin(np.asarray(kinds), PALLAS_KINDS_OK))))
