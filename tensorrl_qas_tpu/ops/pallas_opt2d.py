"""Pallas mega-kernel v2: 2D-tiled statevector layout for 7 <= n <= 12.

The v1 mega-kernel (ops/pallas_opt.py) materializes a (D, D) partner-
permutation mask per gate and keeps two dense (D, D) Hamiltonian planes in
VMEM: per-gate cost scales as D^2 and the H planes alone exceed VMEM at
D = 2048 (n = 11).  This kernel removes both walls:

Layout: the (S starts, D amplitudes) state block becomes (S*R, C) with
C = 128 lanes, R = D/128 sublane rows; amplitude index i = r*C + c.  A
single-qubit gate's XOR-partner permutation becomes two pltpu.roll pairs
(lane rolls for t < 7, sublane rolls for t >= 7) with a target-bit select:
element c needs psi[c ^ 2^t] = psi[c + 2^t] when bit t of c is 0 and
psi[c - 2^t] when it is 1, i.e. a +/- cyclic shift selected per element.
Rolls are exact f32 VPU shuffles — no MXU, no bf16 rounding, no (D, D)
mask in VMEM — so per-gate cost drops from O(S*D^2) MXU FLOPs to O(S*D)
shuffles, and n = 11..12 become feasible at all.

Energy: dense H is replaced by the *flip-grouped Pauli sum*.  Terms sharing
an X-flip mask f combine into one complex coefficient plane
W_f(i) = sum_k w_k i^{p_k} (-1)^{parity(i & z_k)} (precomputed host-side;
molecular Hamiltonians have ~25-150 distinct flips, e.g. H2O 12q: 923
terms -> 142 groups), so

    (H psi)[i] = sum_f W_f(i) * psi[i ^ f]

costs one roll-based XOR permutation (one roll pair per set flip bit,
all shifts static) + one multiply-accumulate per group.
E = Re<psi|H psi> and the Adam gradient cotangent lambda = 2 conj(H psi)
reuse the same H psi (as v1).

Everything else (multi-start Adam with best-iterate tracking, angle remap
onto the post-action tape, post-action energy) matches v1 semantics;
tests/test_pallas_opt2d.py checks numerical agreement with the XLA path.

v3 extension (13 <= n <= 18, round 3): two scalability walls removed so
the same kernel covers the reference's single-box mid-band
(``README.md:29``):

- start-broadcasts use ``pltpu.repeat`` block-tiling instead of a
  ``(S*R, R)`` one-hot MXU matmul (that matrix alone is 8 MB at n = 16,
  and the per-group matmul cost dominated h_apply at large R);
- the flip-group coefficient planes can stay in HBM (``stream_w=True``)
  and are DMA'd per group into a small VMEM buffer inside h_apply — W
  residency no longer caps n (molecular 12q: 142 groups = 9 MB at n = 13).

VMEM then holds only ~8 live (S*R, 128) f32 state planes (forward state,
backward state + cotangent, H psi scratch, psi0 tiles);
``AngleOptimizer._mega2d_ready`` does the budget arithmetic.  Every
size-derived structure (roll distances, row-bit selects, start tiling,
streamed-W buffers) is generic in R, and the XOR-partner rolls never
cross start blocks (subtracting/adding 2^k from a row index whose bit k
is set/clear cannot borrow into the start-id bits).  The binding per-call
constraint is NOT the modeled planes but Mosaic's register allocator:
above S*R = MAX_SR_ROWS sublane rows it spills >100 MB of scoped VMEM
(v5e-measured at 17q S=8) — wider start counts are host-chunked across
calls of at most MAX_SR_ROWS rows each, so the band runs at full start
counts through n = 18.

Round-3 dispatch: per-gate work is class-specialized (apply_gate_fast2d /
bwd_gate_fast2d, twins of ops/pallas_apply.py's v1 versions) — the serial
gate chain is VPU-latency-bound, and measured ~40% of the per-gate
critical path was an unconditional prefix (HIGHEST one-hot angle matmuls,
the 15-where coefficient select, roll pairs) that most gate kinds don't
need.  Padding skips everything, RZ/Z skip the rolls, X/CX skip angle
select + trig, RX/RY use two-term real forms; H/Y/controlled-rotations
keep the generic path.  Angle selection itself is a VPU compare +
masked lane-sum (bit-exact) instead of 6 MXU passes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorrl_qas_tpu.ops.pallas_apply import (
    _CX,
    _NONE,
    _RX,
    _RY,
    _RZ,
    _X,
    _Z,
    _gate_class,
    _gate_coeffs,
)
from tensorrl_qas_tpu.ops.pallas_opt import MAX_ENV_PER_CALL, _chunk_env_calls

_C = 128          # lane width (fixed by hardware)
_LOG_C = 7

MAX_DIM_2D = 262144   # n <= 18: streamed W planes; VMEM holds state only
                      # (v3+ round 3: the roll/select machinery and the
                      # launch path are R-generic)
MAX_SR_ROWS = 4096    # hard per-call cap on S*R (state plane sublane
                      # rows): v5e-measured Mosaic wall — at S*R = 8192
                      # (17q S=8) the register allocator spills 149.7 MB
                      # of scoped VMEM and compilation ooms, while every
                      # S*R <= 4096 configuration (16q S=8, 17q S=4)
                      # compiles and runs.  Wider start counts are
                      # chunked across kernel calls by the host
                      # (AngleOptimizer.fused_step_batch), preserving
                      # full multi-start semantics.
MIN_DIM_2D = 128      # n >= 7: need at least one full lane row
VMEM_BUDGET = 48 * 2**20   # working-set ceiling used for engine selection
                           # (v5e scoped VMEM raised via vmem_limit_bytes;
                           # hardware-calibrated: n=16 compiles and runs
                           # at both S=4 and S=8 with streamed W planes)
W_RESIDENT_MAX = 12 * 2**20  # W planes above this stream from HBM
                             # (12q molecular = 9.3 MB stays resident —
                             # the proven round-2 configuration; 13q+
                             # molecular and 16q chains stream)
DISPATCH_MAX_ROWS = 128      # full class-specialized gate dispatch below
                             # this row-tile count (n <= 13); at n >= 14
                             # the 6-way branch boundaries cost more than
                             # the skipped work on REAL gates (+46% at
                             # n=14, hardware probe in RESULTS.md), but
                             # the padding skip stays essential (fixed
                             # tapes are mostly padding early in every
                             # episode, 6.7x there) — so large sizes drop
                             # to a 2-way padding/generic dispatch.
                             # TRLQAS_V2_DISPATCH=0/1/2 forces
                             # none/padding-only/full for probing.


def pauli_flip_groups(pauli, dtype=np.float32):
    """Host-side precompute: flip-grouped coefficient planes.

    Returns (wre (G, R, C), wim (G, R, C), flips tuple[int]) with
    W_f(i) = sum_{k: flip_k = f} w_k * iphase_k * (-1)^parity(i & sign_k),
    laid out as (row, lane) planes: i = r*C + c.
    """
    from tensorrl_qas_tpu.utils.bits import parity

    n = pauli.n_qubits
    d = 1 << n
    r_rows = d // _C
    flips_arr = np.asarray(pauli.flip)
    idx = np.arange(d, dtype=np.int64)
    groups = sorted(set(int(f) for f in flips_arr))
    wre = np.zeros((len(groups), r_rows, _C), dtype=dtype)
    wim = np.zeros_like(wre)
    for gi, f in enumerate(groups):
        w = np.zeros(d, dtype=np.complex128)
        for k in np.nonzero(flips_arr == f)[0]:
            signs = 1.0 - 2.0 * np.asarray(
                parity(idx & int(pauli.sign_mask[k])), dtype=np.float64)
            w += pauli.weights[k] * complex(pauli.iphase[k]) * signs
        wre[gi] = np.real(w).reshape(r_rows, _C)
        wim[gi] = np.imag(w).reshape(r_rows, _C)
    return wre, wim, tuple(groups)


def _make_kernel(iters: int, lr: float, s_batch: int, r_rows: int,
                 flips: tuple, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, noise=None, stream_w: bool = False,
                 dispatch: int = 2, per_env_psi0: bool = False,
                 pmul: bool = False):
    """``noise=(p1, p2)``: in-kernel depolarizing trajectories (same
    machinery as ops/pallas_opt.py v1 — TPU PRNG re-draws per Adam
    iteration, error Paulis ride the roll-based gate apply).
    ``stream_w``: W coefficient planes live in HBM and are DMA'd per
    group inside h_apply (large n / many groups).
    ``dispatch``: 2 = full 6-way class-specialized per-gate branches
    (see module docstring); 1 = padding-only (2-way: NONE skips, every
    real gate takes the unconditional generic apply — at large row-tile
    counts Mosaic loses cross-gate value reuse across the 6-way branch
    boundaries and real-gate dispatch REGRESSES the serial chain,
    measured +46% at n=14, while the padding skip stays a 6.7x win on
    the padding-dominated early-episode tapes); 0 = none (pre-dispatch
    unconditional apply, probing only)."""
    sr = s_batch * r_rows
    log_r = int(np.log2(r_rows))

    def kernel(okind, otq, ocq, oslot, nkind, ntq, ncq, nslot, mapidx,
               flip_arr, *rest):
        w_s = ()
        if noise is not None:
            (seeds, p0re_ref, p0im_ref, wre_ref, wim_ref, starts_ref,
             active_ref, xopt_ref, enew_ref,
             x_s, m_s, v_s, bx_s, be_s, hr_s, hi_s, *tail) = rest
            if stream_w:
                *w_s, nz_s = tail
            else:
                (nz_s,) = tail
        else:
            (p0re_ref, p0im_ref, wre_ref, wim_ref, starts_ref, active_ref,
             xopt_ref, enew_ref,
             x_s, m_s, v_s, bx_s, be_s, hr_s, hi_s, *w_s) = rest
        e = pl.program_id(0)
        r = x_s.shape[-1]
        n_gates = okind.shape[-1]
        active = active_ref[0]                       # (1, R)

        # --- in-register index machinery ---------------------------------
        colv = lax.broadcasted_iota(jnp.int32, (1, _C), 1)
        rr_col = lax.broadcasted_iota(jnp.int32, (sr, 1), 0)
        # start-segment maps built directly from iotas (no transposes)
        rep_s = ((rr_col >> log_r)
                 == lax.broadcasted_iota(jnp.int32, (sr, s_batch), 1)
                 ).astype(jnp.float32)                       # (SR, S)
        seg = (lax.broadcasted_iota(jnp.int32, (s_batch, sr), 0)
               == (lax.broadcasted_iota(jnp.int32, (s_batch, sr), 1)
                   >> log_r)).astype(jnp.float32)            # (S, SR)

        def tile_s(x):
            """(R, C) -> (SR, C) per-start block tile.  Exact and O(SR*C);
            replaces the old one-hot (SR, R) MXU broadcast, whose operand
            alone is 8 MB at n = 16."""
            return pltpu.repeat(x, s_batch, 0)

        slot_iota = lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        slot_row = lax.broadcasted_iota(jnp.int32, (1, r), 1)
        row_bits = rr_col & (r_rows - 1)                     # (SR, 1)

        def mm(a, b):
            # HIGHEST: default one-pass bf16 MXU multiplies cost ~5e-3 Ha
            # over a 40-gate tape (see pallas_apply._mm)
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)

        def xor_dyn(x, t):
            """x[i ^ (1<<t)] for a runtime bit index t: +/- rolls with a
            per-element bit select (exact, no MXU).  Out-of-range rolls
            degrade to identity via zero shifts."""
            s_c = jnp.where(t < _LOG_C, 1 << jnp.maximum(t, 0), 0)
            s_r = jnp.where(t >= _LOG_C, 1 << jnp.maximum(t - _LOG_C, 0), 0)
            b_c = (colv >> t) & 1                # 0 for t >= _LOG_C
            xc = jnp.where(b_c == 1, pltpu.roll(x, s_c, 1),
                           pltpu.roll(x, (_C - s_c) % _C, 1))
            b_r = (row_bits >> jnp.maximum(t - _LOG_C, 0)) & 1
            return jnp.where((b_r == 1) & (t >= _LOG_C),
                             pltpu.roll(xc, s_r, 0),
                             pltpu.roll(xc, (sr - s_r) % sr, 0))

        def permute(re, im, t):
            if pmul:
                # lane-bit exchange as ONE exact permutation matmul on the
                # otherwise-idle MXU (VERDICT r4 item 2): P[i, j] =
                # ((i ^ j) == m_lane) with m_lane = 0 (identity) for row
                # bits, both planes stacked into one product; the row-bit
                # part keeps the sublane roll select.
                m_lane = jnp.where(t < _LOG_C,
                                   1 << jnp.minimum(jnp.maximum(t, 0),
                                                    _LOG_C - 1), 0)
                ii = lax.broadcasted_iota(jnp.int32, (_C, _C), 0)
                jj = lax.broadcasted_iota(jnp.int32, (_C, _C), 1)
                p = ((ii ^ jj) == m_lane).astype(jnp.float32)
                ab = jnp.concatenate([re, im], axis=0)
                # uniform HIGHEST: Mosaic rejects per-operand precision
                # tuples on real TPU (r5 probe); exact either way
                r2 = lax.dot_general(
                    ab, p, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                xc_re, xc_im = r2[:sr], r2[sr:]
                s_r = jnp.where(t >= _LOG_C,
                                1 << jnp.maximum(t - _LOG_C, 0), 0)
                b_r = (row_bits >> jnp.maximum(t - _LOG_C, 0)) & 1
                row_hit = (b_r == 1) & (t >= _LOG_C)
                return (jnp.where(row_hit, pltpu.roll(xc_re, s_r, 0),
                                  pltpu.roll(xc_re, (sr - s_r) % sr, 0)),
                        jnp.where(row_hit, pltpu.roll(xc_im, s_r, 0),
                                  pltpu.roll(xc_im, (sr - s_r) % sr, 0)))
            return xor_dyn(re, t), xor_dyn(im, t)

        def xor_static(x, f):
            """x[i ^ f] for a static mask f: one roll pair per set bit."""
            f_lo, f_hi = f & (_C - 1), f >> _LOG_C
            for k in range(_LOG_C):
                if f_lo & (1 << k):
                    x = jnp.where(((colv >> k) & 1) == 1,
                                  pltpu.roll(x, 1 << k, 1),
                                  pltpu.roll(x, _C - (1 << k), 1))
            for k in range(max(log_r, 1)):
                if f_hi & (1 << k):
                    x = jnp.where(((row_bits >> k) & 1) == 1,
                                  pltpu.roll(x, 1 << k, 0),
                                  pltpu.roll(x, sr - (1 << k), 0))
            return x

        def bit_plane(q):
            """(SR, C)-broadcastable {0,1} plane: bit q of the index."""
            b_col = ((colv >> jnp.maximum(q, 0)) & 1).astype(jnp.float32)
            b_row = ((row_bits >> jnp.maximum(q - _LOG_C, 0)) & 1
                     ).astype(jnp.float32)
            is_col = (q < _LOG_C).astype(jnp.float32)
            return is_col * b_col + (1.0 - is_col) * b_row   # broadcast sum

        def act_plane(c):
            return jnp.where(c >= 0, bit_plane(c), 1.0)

        def theta_rows(xmat, s):
            """Angle for slot s per start, tiled to (SR, 1)."""
            onehot = (slot_iota == s).astype(jnp.float32)    # (R, 1)
            th = mm(xmat, onehot)                            # (S, 1)
            th = jnp.where(s >= 0, th, 0.0)
            return mm(rep_s, th)                             # (SR, 1)

        def apply_coeffs(rr, ii, cf, b, act, t):
            dr = jnp.where(b == 0, cf[0], cf[6])
            di = jnp.where(b == 0, cf[1], cf[7])
            fr = jnp.where(b == 0, cf[2], cf[4])
            fi = jnp.where(b == 0, cf[3], cf[5])
            prr, pii = permute(rr, ii, t)
            nre = dr * rr - di * ii + fr * prr - fi * pii
            nim = dr * ii + di * rr + fr * pii + fi * prr
            return (act * nre + (1.0 - act) * rr,
                    act * nim + (1.0 - act) * ii)

        def theta_sr(xmat, s):
            """Angle for slot s tiled to (SR, 1), VPU-exact: a compare +
            masked lane-sum replaces the HIGHEST one-hot matmul (3 MXU
            passes) and the start-tile matmul (3 more) of theta_rows —
            the per-start expansion is a static unrolled select."""
            hit = (slot_row == s).astype(jnp.float32)          # (1, R)
            th = jnp.sum(xmat * hit, axis=-1, keepdims=True)   # (S, 1)
            acc = jnp.zeros((sr, 1), jnp.float32)
            for si in range(s_batch):
                acc = acc + rep_s[:, si:si + 1] * lax.slice(
                    th, (si, 0), (si + 1, 1))
            return acc

        # --- gate-kind-specialized dispatch (see pallas_apply.py's v1
        # twins _apply_gate_fast/_bwd_gate_fast: the serial gate chain is
        # VPU-latency-bound, so each class computes ONLY what it needs —
        # padding skips everything, diagonals skip the roll pairs, X/CX
        # skip angle select + trig, RX/RY skip the 4-term blend) ----------
        def apply_gate_fast2d(re, im, k, t, c, s, xmat):
            def cls_none(_):
                return re, im

            def cls_diag(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                b = bit_plane(t)
                sgn = 1.0 - 2.0 * b
                is_z = k == _Z
                dr = jnp.where(is_z, sgn, cth)
                di = jnp.where(is_z, 0.0, jnp.where(b == 0, -sth, sth))
                return dr * re - di * im, dr * im + di * re

            def cls_perm(_):
                prr, pii = permute(re, im, t)
                act = act_plane(c)
                inv = 1.0 - act
                return act * prr + inv * re, act * pii + inv * im

            def cls_rx(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                prr, pii = permute(re, im, t)
                return cth * re + sth * pii, cth * im - sth * prr

            def cls_ry(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                prr, pii = permute(re, im, t)
                b = bit_plane(t)
                fr = sth * (2.0 * b - 1.0)
                return cth * re + fr * prr, cth * im + fr * pii

            def cls_generic(_):
                cf = _gate_coeffs(k, theta_rows(xmat, s))
                return apply_coeffs(re, im, cf, bit_plane(t),
                                    act_plane(c), t)

            if dispatch == 0:
                return cls_generic(0)
            if dispatch == 1:
                return lax.cond(k == _NONE, cls_none, cls_generic, 0)
            return lax.switch(_gate_class(k, c),
                              [cls_none, cls_diag, cls_perm, cls_rx,
                               cls_ry, cls_generic], 0)

        def bwd_gate_fast2d(re, im, lre, lim, k, t, c, s, xmat):
            """One reverse-pass gate: (state U^H undo, cotangent U^T,
            (S, 1) angle-gradient row).  Rotation classes share the
            state rolls between the gradient term and the undo."""
            zero_c = jnp.zeros((s_batch, 1), jnp.float32)

            def grad(pr, pi):
                rowsum = jnp.sum(pr * lim + pi * lre, axis=-1,
                                 keepdims=True)                # (SR, 1)
                return 0.5 * mm(seg, rowsum)                   # (S, 1)

            def cls_none(_):
                return re, im, lre, lim, zero_c

            def cls_diag(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                b = bit_plane(t)
                sgn = 1.0 - 2.0 * b
                is_z = k == _Z
                dr = jnp.where(is_z, sgn, cth)
                di = jnp.where(is_z, 0.0, jnp.where(b == 0, -sth, sth))
                cg = grad(sgn * re, sgn * im)
                return (dr * re + di * im, dr * im - di * re,
                        dr * lre - di * lim, dr * lim + di * lre, cg)

            def cls_perm(_):
                prr, pii = permute(re, im, t)
                plr, pli = permute(lre, lim, t)
                act = act_plane(c)
                inv = 1.0 - act
                return (act * prr + inv * re, act * pii + inv * im,
                        act * plr + inv * lre, act * pli + inv * lim,
                        zero_c)

            def cls_rx(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                prr, pii = permute(re, im, t)
                plr, pli = permute(lre, lim, t)
                cg = grad(prr, pii)
                return (cth * re - sth * pii, cth * im + sth * prr,
                        cth * lre + sth * pli, cth * lim - sth * plr, cg)

            def cls_ry(_):
                th = theta_sr(xmat, s)
                cth = jnp.cos(0.5 * th)
                sth = jnp.sin(0.5 * th)
                prr, pii = permute(re, im, t)
                plr, pli = permute(lre, lim, t)
                b = bit_plane(t)
                sgn = 1.0 - 2.0 * b
                cg = grad(sgn * pii, -sgn * prr)
                fr = sth * (2.0 * b - 1.0)
                return (cth * re - fr * prr, cth * im - fr * pii,
                        cth * lre - fr * plr, cth * lim - fr * pli, cg)

            def cls_generic(_):
                (u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i) = \
                    _gate_coeffs(k, theta_rows(xmat, s))
                b = bit_plane(t)
                act = act_plane(c)
                prr, pii = permute(re, im, t)
                sgn = 1.0 - 2.0 * b
                is_rx = (k == _RX).astype(jnp.float32)
                is_ry = (k == _RY).astype(jnp.float32)
                is_rz = (k == _RZ).astype(jnp.float32)
                pr = is_rx * prr + is_ry * (sgn * pii) + is_rz * (sgn * re)
                pi = is_rx * pii + is_ry * (-sgn * prr) + is_rz * (sgn * im)
                cg = grad(act * pr, act * pi)
                ch = (u00r, -u00i, u10r, -u10i, u01r, -u01i, u11r, -u11i)
                nre, nim = apply_coeffs(re, im, ch, b, act, t)
                ct = (u00r, u00i, u10r, u10i, u01r, u01i, u11r, u11i)
                nlr, nli = apply_coeffs(lre, lim, ct, b, act, t)
                return nre, nim, nlr, nli, cg

            if dispatch == 0:
                return cls_generic(0)
            if dispatch == 1:
                return lax.cond(k == _NONE, cls_none, cls_generic, 0)
            return lax.switch(_gate_class(k, c),
                              [cls_none, cls_diag, cls_perm, cls_rx,
                               cls_ry, cls_generic], 0)

        # -- depolarizing-trajectory machinery (compiled out when noise is
        # None); see ops/pallas_opt.py for the v1 twin ----------------------
        if noise is not None:
            p1, p2 = noise
            g_pad = nz_s.shape[-1]
            g_iota = lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0)

            def draw_noise(tag):
                tag32 = jnp.asarray(tag, jnp.int32)
                pltpu.prng_seed(
                    seeds[e, 0] ^ (tag32 * jnp.int32(-1640531527)),
                    seeds[e, 1])
                bits = pltpu.prng_random_bits((8, g_pad))
                u = lax.shift_right_logical(
                    bits, jnp.asarray(8, bits.dtype)).astype(jnp.float32) \
                    * jnp.float32(1.0 / (1 << 24))
                nz_s[0:1] = u[0:1]
                nz_s[1:2] = jnp.minimum(jnp.floor(u[1:2] * 3.0), 2.0) + 1.0
                nz_s[2:3] = jnp.minimum(jnp.floor(u[2:3] * 15.0), 14.0) + 1.0

            def apply_noise(g, k, t, c, re, im, transform=None):
                sel = (g_iota == g).astype(jnp.float32)
                u_g = mm(nz_s[0:1], sel)
                c3 = mm(nz_s[1:2], sel)
                c15 = mm(nz_s[2:3], sel)
                is_rot = (k >= _RX) & (k <= _RZ)
                is_cx = k == _CX
                fire1 = is_rot & (u_g < p1)
                fire2 = is_cx & (u_g < p2)
                ct = c15 - 4.0 * jnp.floor(c15 * 0.25)
                cc = jnp.floor(c15 * 0.25)
                code_t = jnp.where(fire1, c3, jnp.where(fire2, ct, 0.0))
                code_c = jnp.where(fire2, cc, 0.0)
                to_kind = lambda cd: jnp.where(  # noqa: E731
                    cd > 0.0, (_X - 1.0) + cd, 0.0)
                zcol = jnp.zeros((sr, 1), jnp.float32)
                for kk, q in ((to_kind(code_t), t),
                              (to_kind(code_c), jnp.maximum(c, 0))):
                    cf = _gate_coeffs(kk, zcol)
                    if transform == "T":
                        (u00r, u00i, u01r, u01i, u10r, u10i,
                         u11r, u11i) = cf
                        cf = (u00r, u00i, u10r, u10i, u01r, u01i,
                              u11r, u11i)
                    re, im = apply_coeffs(re, im, cf, bit_plane(q),
                                          jnp.float32(1.0), q)
                return re, im
        else:
            def apply_noise(g, k, t, c, re, im, transform=None):
                return re, im

        def forward(tape, xmat, re0, im0):
            kind_r, tq_r, cq_r, slot_r = tape

            def gate(g, carry):
                re, im = carry
                k = kind_r[e, g]
                t = tq_r[e, g]
                c = cq_r[e, g]
                s = slot_r[e, g]
                re, im = apply_gate_fast2d(re, im, k, t, c, s, xmat)
                re, im = apply_noise(g, k, t, c, re, im)
                return (re, im)

            return lax.fori_loop(0, n_gates, gate, (re0, im0))

        def xor_mask_dyn(x, f):
            """x[i ^ f] for a runtime mask f: one conditional roll pair
            per bit position (bit off => zero shift => identity)."""
            for k in range(_LOG_C):
                sh = ((f >> k) & 1) << k
                x = jnp.where(((colv >> k) & 1) == 1,
                              pltpu.roll(x, sh, 1),
                              pltpu.roll(x, (_C - sh) % _C, 1))
            for k in range(max(log_r, 1)):
                sh = ((f >> (k + _LOG_C)) & 1) << k
                x = jnp.where(((row_bits >> k) & 1) == 1,
                              pltpu.roll(x, sh, 0),
                              pltpu.roll(x, (sr - sh) % sr, 0))
            return x

        def h_apply(re, im):
            """(H psi) via flip-grouped Pauli planes.

            Few groups (spin chains): the loop unrolls with STATIC flip
            masks, skipping identity roll factors at trace time.  Many
            groups (molecular, up to ~150): a fori_loop with runtime
            masks — the unrolled form blows up the Mosaic compiler.
            ``stream_w``: the (R, C) plane of each group is DMA'd from
            HBM into a VMEM buffer just before use (W traffic is tiny
            next to the per-group roll chain over the (SR, C) state)."""
            hr_s[:] = jnp.zeros((sr, _C), jnp.float32)
            hi_s[:] = jnp.zeros((sr, _C), jnp.float32)
            if stream_w:
                wre_buf, wim_buf, sem_re, sem_im = w_s

                def group(g, _):
                    f = flip_arr[g]
                    cp_re = pltpu.make_async_copy(wre_ref.at[g], wre_buf,
                                                  sem_re)
                    cp_im = pltpu.make_async_copy(wim_ref.at[g], wim_buf,
                                                  sem_im)
                    cp_re.start()
                    cp_im.start()
                    pre = xor_mask_dyn(re, f)
                    pim = xor_mask_dyn(im, f)
                    cp_re.wait()
                    cp_im.wait()
                    wr = tile_s(wre_buf[:])                  # (SR, C)
                    wi = tile_s(wim_buf[:])
                    hr_s[:] = hr_s[:] + wr * pre - wi * pim
                    hi_s[:] = hi_s[:] + wr * pim + wi * pre
                    return 0

                lax.fori_loop(0, len(flips), group, 0)
            elif len(flips) <= 32:
                for g, f in enumerate(flips):
                    pre, pim = xor_static(re, f), xor_static(im, f)
                    wr = tile_s(wre_ref[g])                  # (SR, C)
                    wi = tile_s(wim_ref[g])
                    hr_s[:] = hr_s[:] + wr * pre - wi * pim
                    hi_s[:] = hi_s[:] + wr * pim + wi * pre
            else:
                def group(g, _):
                    f = flip_arr[g]
                    pre = xor_mask_dyn(re, f)
                    pim = xor_mask_dyn(im, f)
                    wr = tile_s(wre_ref[g])                  # (SR, C)
                    wi = tile_s(wim_ref[g])
                    hr_s[:] = hr_s[:] + wr * pre - wi * pim
                    hi_s[:] = hi_s[:] + wr * pim + wi * pre
                    return 0

                lax.fori_loop(0, len(flips), group, 0)
            return hr_s[:], hi_s[:]

        def energy_per_start(re, im, hre, him):
            # Rayleigh quotient (see ops/pallas_opt.py energy_rows): the
            # norm division cancels the O(1e-4)-Ha f32 norm-drift bias.
            rowsum = jnp.sum(re * hre + im * him, axis=-1,
                             keepdims=True)                  # (SR, 1)
            n2row = jnp.sum(re * re + im * im, axis=-1,
                            keepdims=True)                   # (SR, 1)
            return mm(seg, rowsum) / mm(seg, n2row)          # (S, 1)

        def backward(tape, xmat, re, im, lre, lim):
            kind_r, tq_r, cq_r, slot_r = tape

            def gate(i, carry):
                re, im, lre, lim, dx = carry
                g = n_gates - 1 - i
                k = kind_r[e, g]
                t = tq_r[e, g]
                c = cq_r[e, g]
                s = slot_r[e, g]
                # undo the sampled error Paulis (Hermitian) and bring the
                # cotangent to the post-gate point
                re, im = apply_noise(g, k, t, c, re, im)
                lre, lim = apply_noise(g, k, t, c, lre, lim, transform="T")

                # specialized adjoint step: d<theta> row + U^H undo + U^T
                # cotangent propagation, class-dispatched on the gate kind
                re, im, lre, lim, contrib = bwd_gate_fast2d(
                    re, im, lre, lim, k, t, c, s, xmat)
                has_angle = (s >= 0).astype(jnp.float32)
                dx = dx + has_angle * contrib * (
                    slot_row == s).astype(jnp.float32)
                return (re, im, lre, lim, dx)

            dx0 = jnp.zeros((s_batch, r), jnp.float32)
            out = lax.fori_loop(0, n_gates, gate, (re, im, lre, lim, dx0))
            return out[4]

        old_tape = (okind, otq, ocq, oslot)
        new_tape = (nkind, ntq, ncq, nslot)
        # per_env_psi0: psi0 arrives as a per-env (1, R, C) block (block-
        # coordinate trainable mode hands every env its own frozen-prefix
        # state); otherwise one (R, C) plane shared across the env grid
        re0 = tile_s(p0re_ref[0] if per_env_psi0 else p0re_ref[:])  # (SR, C)
        im0 = tile_s(p0im_ref[0] if per_env_psi0 else p0im_ref[:])

        x_s[:] = starts_ref[0]
        m_s[:] = jnp.zeros_like(m_s)
        v_s[:] = jnp.zeros_like(v_s)
        bx_s[:] = starts_ref[0]
        be_s[:] = jnp.full_like(be_s, jnp.inf)

        def adam_iter(it, _):
            if noise is not None:
                draw_noise(it)
            x = x_s[:]
            re, im = forward(old_tape, x, re0, im0)
            hre, him = h_apply(re, im)
            ev = energy_per_start(re, im, hre, him)
            better = ev < be_s[:]
            bx_s[:] = jnp.where(better, x, bx_s[:])
            be_s[:] = jnp.where(better, ev, be_s[:])
            dx = backward(old_tape, x, re, im, 2.0 * hre, -2.0 * him)
            dx = dx * active
            m = b1 * m_s[:] + (1 - b1) * dx
            v = b2 * v_s[:] + (1 - b2) * dx * dx
            t = it.astype(jnp.float32) + 1.0
            b1t = jnp.exp(t * float(np.log(b1)))   # powf unsupported
            b2t = jnp.exp(t * float(np.log(b2)))
            x_s[:] = x - lr * (m / (1 - b1t)) / (
                jnp.sqrt(v / (1 - b2t)) + eps)
            m_s[:] = m
            v_s[:] = v
            return 0

        lax.fori_loop(0, iters, adam_iter, 0)

        # final candidate may beat the tracked best
        if noise is not None:
            draw_noise(iters)
        xf = x_s[:]
        re, im = forward(old_tape, xf, re0, im0)
        hre, him = h_apply(re, im)
        ev = energy_per_start(re, im, hre, him)
        better = ev < be_s[:]
        bx_s[:] = jnp.where(better, xf, bx_s[:])
        be_s[:] = jnp.where(better, ev, be_s[:])

        best = jnp.argmin(be_s[:, 0])
        srow = lax.broadcasted_iota(jnp.int32, (1, s_batch), 1)
        sel = (srow == best).astype(jnp.float32)             # (1, S)
        x_opt = mm(sel, bx_s[:])                             # (1, R)

        def remap(j, acc):
            mj = mapidx[e, j]
            val = mm(x_opt, (slot_iota == mj).astype(jnp.float32))
            keep = (mj >= 0).astype(jnp.float32)
            return acc + keep * val * (slot_row == j).astype(jnp.float32)

        x_new = lax.fori_loop(0, r, remap, jnp.zeros((1, r), jnp.float32))

        # --- post-action energy (all starts carry the same x; read s=0) --
        if noise is not None:
            draw_noise(iters + 1)   # fresh realization for e_new
        x_pad = jnp.broadcast_to(x_new, (s_batch, r))
        reN, imN = forward(new_tape, x_pad, re0, im0)
        hreN, himN = h_apply(reN, imN)
        evN = energy_per_start(reN, imN, hreN, himN)         # (S, 1)
        e_sel = mm((srow == 0).astype(jnp.float32), evN)     # (1, 1)
        enew_ref[0] = e_sel
        xopt_ref[0] = x_opt

    return kernel


def fused_adam_step_pallas2d(old_arrs, new_arrs, map_idx, p0re, p0im,
                             wre, wim, flips, starts, active, *,
                             iters: int, lr: float, interpret: bool = False,
                             noise=None, seeds=None, stream_w: bool = False,
                             max_env_per_call: int | None = None):
    """One launch per env step, 2D-tiled layout (7 <= n <= 18).

    old/new_arrs: tuples of (E, G) int32; map_idx (E, R) int32;
    p0re/p0im (Rr, C) f32 planes of psi0; wre/wim (G, Rr, C) flip-group
    coefficient planes; flips: static tuple of G ints; starts (E, S, R)
    f32; active (E, 1, R) f32.  Returns (x_opt (E, R), e_new (E,)).

    ``noise=(p1, p2)`` + ``seeds`` (E, 2) int32 compiles the in-kernel
    depolarizing-trajectory variant.  ``stream_w=True`` keeps the W
    planes in HBM and DMA-streams them per flip group (13 <= n <= 18 or
    many-group molecular Hamiltonians; see module docstring).  Batches
    larger than ``pallas_opt.MAX_ENV_PER_CALL`` are split into
    independent launches (per-env tapes live in SMEM scalar prefetch,
    which bounds the per-launch env count).
    """
    cap = MAX_ENV_PER_CALL if max_env_per_call is None else max_env_per_call
    # resolved OUTSIDE the jitted call and passed as a static argument, so
    # probing harnesses that flip TRLQAS_V2_DISPATCH between calls get a
    # fresh executable instead of a silently reused trace
    _force = os.environ.get("TRLQAS_V2_DISPATCH")
    dispatch = ((2 if p0re.shape[-2] < DISPATCH_MAX_ROWS else 1)
                if _force is None else int(_force))
    # lane-bit partner exchanges as exact MXU permutation matmuls; off by
    # default until the on-chip A/B (scripts/probe_mxu_fusion.py) shows a
    # win — "1" forces on, "0" off
    pmul = os.environ.get("TRLQAS_V2_PMUL", "0") == "1"

    per_env = np.asarray(p0re).ndim == 3
    if per_env and starts.shape[0] > cap:
        # per-env psi0 must be sliced alongside the env chunk (the shared
        # _chunk_env_calls helper closes over psi0)
        outs = []
        for lo in range(0, starts.shape[0], cap):
            hi = min(lo + cap, starts.shape[0])
            outs.append(fused_adam_step_pallas2d(
                tuple(a[lo:hi] for a in old_arrs),
                tuple(a[lo:hi] for a in new_arrs),
                map_idx[lo:hi], p0re[lo:hi], p0im[lo:hi], wre, wim, flips,
                starts[lo:hi], active[lo:hi], iters=iters, lr=lr,
                interpret=interpret, noise=noise,
                seeds=None if seeds is None else seeds[lo:hi],
                stream_w=stream_w, max_env_per_call=max_env_per_call))
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))

    def call(o, nw, mi, *, starts, active, seeds):
        return _fused_adam_step_call2d(
            o, nw, mi, p0re, p0im, wre, wim, flips, starts, active,
            iters=iters, lr=lr, interpret=interpret, noise=noise,
            seeds=seeds, stream_w=stream_w, dispatch=dispatch, pmul=pmul)

    if starts.shape[0] > cap:
        return _chunk_env_calls(call, old_arrs, new_arrs, map_idx,
                                starts, active, seeds, cap=cap)
    return call(old_arrs, new_arrs, map_idx, starts=starts, active=active,
                seeds=seeds)


@functools.partial(jax.jit,
                   static_argnames=("flips", "iters", "lr", "interpret",
                                    "noise", "stream_w", "dispatch",
                                    "pmul"))
def _fused_adam_step_call2d(old_arrs, new_arrs, map_idx, p0re, p0im,
                            wre, wim, flips, starts, active, *,
                            iters: int, lr: float, interpret: bool = False,
                            noise=None, seeds=None, stream_w: bool = False,
                            dispatch: int = 2, pmul: bool = False):
    n_env, s_batch, r = starts.shape
    per_env_psi0 = p0re.ndim == 3
    r_rows = p0re.shape[-2]
    kernel = _make_kernel(iters, lr, s_batch, r_rows, flips, noise=noise,
                          stream_w=stream_w, dispatch=dispatch,
                          per_env_psi0=per_env_psi0, pmul=pmul)
    sr = s_batch * r_rows

    def spec(shape, mapper):
        return pl.BlockSpec(shape, mapper, memory_space=pltpu.VMEM)

    per_e3 = lambda shape: spec(shape, lambda e, *_: (e, 0, 0))  # noqa: E731
    shared2 = lambda shape: spec(shape, lambda e, *_: (0, 0))    # noqa: E731
    shared3 = lambda shape: spec(shape, lambda e, *_: (0, 0, 0))  # noqa: E731

    n_groups = wre.shape[0]
    flips_arr = jnp.asarray(np.asarray(flips, dtype=np.int32))
    scratch = [pltpu.VMEM((s_batch, r), jnp.float32),   # x
               pltpu.VMEM((s_batch, r), jnp.float32),   # m
               pltpu.VMEM((s_batch, r), jnp.float32),   # v
               pltpu.VMEM((s_batch, r), jnp.float32),   # best x
               pltpu.VMEM((s_batch, 1), jnp.float32),   # best e
               pltpu.VMEM((sr, _C), jnp.float32),       # H psi re
               pltpu.VMEM((sr, _C), jnp.float32)]       # H psi im
    if stream_w:
        scratch += [pltpu.VMEM((r_rows, _C), jnp.float32),   # W re buffer
                    pltpu.VMEM((r_rows, _C), jnp.float32),   # W im buffer
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA]
        w_specs = [pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)]
    else:
        w_specs = [shared3((n_groups, r_rows, _C)),
                   shared3((n_groups, r_rows, _C))]
    prefetch = [*old_arrs, *new_arrs, map_idx, flips_arr]
    n_prefetch = 10
    if noise is not None:
        g_pad = max(128, -(-old_arrs[0].shape[-1] // 128) * 128)
        scratch.append(pltpu.VMEM((8, g_pad), jnp.float32))  # noise rows
        prefetch.append(seeds)
        n_prefetch = 11
    p0_spec = (per_e3((1, r_rows, _C)) if per_env_psi0
               else shared2((r_rows, _C)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(n_env,),
        in_specs=[p0_spec, p0_spec,
                  *w_specs,
                  per_e3((1, s_batch, r)), per_e3((1, 1, r))],
        out_specs=(spec((1, 1, r), lambda e, *_: (e, 0, 0)),
                   spec((1, 1, 1), lambda e, *_: (e, 0, 0))),
        scratch_shapes=scratch,
    )
    if interpret and noise is not None:
        interpret = pltpu.InterpretParams()
    # the scoped-VMEM compiler default (16 MB) undercuts v5e's physical
    # VMEM; the large-n working set (live state planes + roll temporaries)
    # needs the headroom.  Harmless for small n (it is a cap, not a
    # reservation).
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    x_opt, e_new = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_env, 1, r), jnp.float32),
                   jax.ShapeDtypeStruct((n_env, 1, 1), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else compiler_params,
    )(*prefetch, p0re, p0im, wre, wim, starts, active)
    return x_opt[:, 0, :], e_new[:, 0, 0]
