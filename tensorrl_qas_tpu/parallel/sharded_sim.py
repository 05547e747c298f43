"""Amplitude-sharded statevector simulation over a device mesh.

The 2^n statevector is sharded over the ``amp`` mesh axis on its *top*
index bits: with D = 2^d devices, device r holds the block of amplitudes
whose global index = r * 2^(n-d) + local.  Qubits 0..n-d-1 are shard-local;
qubits n-d..n-1 are "device" qubits.

Gate application (see sim/apply.py for the single-chip formula):

- target on a local qubit -> pure local gather, no communication;
- target on a device qubit -> the XOR partner lives in the block of the
  neighbor device across that device bit: one pairwise ``ppermute``
  exchanges blocks, then the combine is elementwise.

Because qubit indices are *runtime* values (one compiled program serves
every circuit), and ``ppermute`` permutations must be static, we issue one
pairwise exchange per device bit (d = log2 D of them, e.g. 3 for 8 chips)
and select the right one — O(d) extra bandwidth, zero recompilation.  A
Pallas RDMA double-buffered variant can cut this to exactly one exchange.

Pauli-sum expectation: each term's flip mask splits into a local part
(in-block gather) and a device part fg (block exchange).  fg is *static*
per Hamiltonian, so terms are grouped by fg at load time and each group
costs one static ppermute; partial sums reduce with ``psum``.

This is the scale-out path past the reference's explicit 20-qubit ceiling
(``README.md:29``; its dense O(4^n) expectation, ``VQE_qulacs.py:85``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensorrl_qas_tpu.circuits.tape import GateKind
from tensorrl_qas_tpu.sim.apply import _gate_matrix
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tensorrl_qas_tpu.utils.bits import parity


class ShardedSimulator:
    """Statevector engine over a mesh with an ``amp`` axis.

    Args:
      mesh: mesh containing an ``amp`` axis (others are batch-transparent).
      n_qubits: total qubits; 2^n must be divisible by the amp axis size.
      pauli: the Hamiltonian (grouped by device-flip mask at setup).
      dtype: statevector dtype.
    """

    def __init__(self, mesh: Mesh, n_qubits: int, pauli: PauliSum,
                 dtype=jnp.complex64, enable_2q: bool = False):
        self.mesh = mesh
        self.n = n_qubits
        self.dtype = dtype
        # RXX/RYY/RZZ (the su4 action set) on the mesh: static — when off
        # (cnot gate set) the 2q-rotation exchanges are never traced and
        # per-gate collective cost is unchanged
        self.enable_2q = enable_2q
        self.D = mesh.shape["amp"]
        self.d = int(np.log2(self.D))
        assert 2 ** self.d == self.D, "amp axis size must be a power of 2"
        self.nloc = n_qubits - self.d
        assert self.nloc >= 1, "statevector too small for this mesh"
        self.block = 1 << self.nloc

        # --- group Pauli terms by device-bit flip mask (static) ----------
        # host numpy constants (embedded at trace time; complex d2h is
        # unimplemented on some TPU transports, see PauliSum.device_arrays)
        fg = (np.asarray(pauli.flip) >> self.nloc).astype(np.int32)
        self.groups = []
        rdt = np.float32 if dtype == jnp.complex64 else np.float64
        cdt = np.complex64 if dtype == jnp.complex64 else np.complex128
        for g in sorted(set(fg.tolist())):
            sel = fg == g
            self.groups.append((
                int(g),
                pauli.weights[sel].astype(rdt),
                (pauli.flip[sel] & (self.block - 1)).astype(np.int32),
                pauli.sign_mask[sel].astype(np.int32),
                pauli.iphase[sel].astype(cdt),
            ))

        self._perms = [
            [(r, r ^ (1 << k)) for r in range(self.D)] for k in range(self.d)
        ]

        self._apply = jax.jit(self._build_apply())
        self._energy = jax.jit(self._build_energy())
        self._apply_b = None   # built lazily: batched over a 'dp' mesh axis
        self._vag_b = None     # built lazily: adjoint value-and-grad
        self._energy_b = None

    # -- construction helpers -------------------------------------------------

    def zero_state(self):
        """|0...0> sharded over the amp axis."""
        sharding = NamedSharding(self.mesh, P("amp"))
        psi = np.zeros(1 << self.n, dtype=np.dtype(self.dtype))
        psi[0] = 1.0
        return jax.device_put(psi, sharding)

    # -- gate application -------------------------------------------------------

    def _flip_vals(self, arr, q, r, local_idx):
        """Values at each amplitude's q-flipped partner index.

        Local bit: an in-block take; device bit: the static pairwise
        ppermute for that bit (same machinery as the 1q partner exchange;
        composing two calls yields double-flip partners, q then q').
        """
        q_loc = jnp.minimum(q, self.nloc - 1)
        v_local = jnp.take(arr, local_idx ^ (1 << q_loc), axis=-1)
        if self.d > 0:
            ex = jnp.stack([lax.ppermute(arr, "amp", self._perms[k])
                            for k in range(self.d)])
            k_sel = jnp.clip(q - self.nloc, 0, self.d - 1)
            v_remote = jnp.take(ex, k_sel, axis=0)
            return jnp.where(q < self.nloc, v_local, v_remote)
        return v_local

    def _bit(self, q, r, local_idx):
        """Bit q of each amplitude's global index (local or device bit)."""
        b_local = (local_idx >> jnp.minimum(q, self.nloc - 1)) & 1
        b_remote = (r >> jnp.clip(q - self.nloc, 0,
                                  max(self.d - 1, 0))) & 1
        return jnp.where(q < self.nloc, b_local, b_remote)

    def _pauli_pair(self, block, kind, t, c, r, local_idx):
        """(P_t P_c) block for kind in {RXX, RYY, RZZ} (flip-and-phase:
        XX flips both bits, YY flips both with -(-1)^parity, ZZ phases
        by (-1)^parity — the single-chip conventions of
        sim/apply.py:_apply_two_pauli_rot)."""
        c_q = jnp.maximum(c, 0)
        v2 = self._flip_vals(self._flip_vals(block, t, r, local_idx),
                             c_q, r, local_idx)
        par = self._bit(t, r, local_idx) ^ self._bit(c_q, r, local_idx)
        sign = (1.0 - 2.0 * par).astype(self.dtype)
        is_xx = kind == int(GateKind.RXX)
        is_yy = kind == int(GateKind.RYY)
        return jnp.where(is_xx, v2,
                         jnp.where(is_yy, -sign * v2, sign * block))

    def _apply_one_gate(self, block, kind, t, c, theta, r, local_idx):
        """block: (B?, L) local amplitudes on device r."""
        u = _gate_matrix(kind, theta, self.dtype)
        L = self.block

        # partner values if target is local (clamp t for safety)
        t_loc = jnp.minimum(t, self.nloc - 1)
        partner_local = local_idx ^ (1 << t_loc)
        v_local = jnp.take(block, partner_local, axis=-1)

        # partner values if target is a device bit: one static pairwise
        # exchange per device bit, select the one matching t
        if self.d > 0:
            exchanged = [
                lax.ppermute(block, "amp", self._perms[k])
                for k in range(self.d)
            ]
            ex = jnp.stack(exchanged)           # (d, B?, L)
            k_sel = jnp.clip(t - self.nloc, 0, self.d - 1)
            v_remote = jnp.take(ex, k_sel, axis=0)
            partner = jnp.where(t < self.nloc, v_local, v_remote)
        else:
            partner = v_local

        # my target-bit value per amplitude
        b_local = (local_idx >> t_loc) & 1
        b_remote = (r >> jnp.clip(t - self.nloc, 0, max(self.d - 1, 0))) & 1
        b = jnp.where(t < self.nloc, b_local, b_remote)

        # control activity
        c_loc = jnp.minimum(jnp.maximum(c, 0), self.nloc - 1)
        act_local = (local_idx >> c_loc) & 1
        act_remote = (r >> jnp.clip(c - self.nloc, 0, max(self.d - 1, 0))) & 1
        act = jnp.where(c < 0, 1,
                        jnp.where(c < self.nloc, act_local, act_remote))

        diag = jnp.where(b == 0, u[0, 0], u[1, 1])
        off = jnp.where(b == 0, u[0, 1], u[1, 0])
        out = jnp.where(act == 1, diag * block + off * partner, block)
        if not self.enable_2q:
            return out
        # exp(-i theta (P_t P_c)/2): cos/sin combination with the
        # Pauli-pair action (selected out for 1q kinds)
        pp = self._pauli_pair(block, kind, t, c, r, local_idx)
        half = theta * 0.5
        out2 = (jnp.cos(half).astype(self.dtype) * block
                + jnp.array(-1j, self.dtype)
                * jnp.sin(half).astype(self.dtype) * pp)
        return jnp.where(kind >= int(GateKind.RXX), out2, out)

    def _build_apply(self):
        def apply_local(psi_block, kind, tq, cq, angle_slot, angles):
            r = lax.axis_index("amp")
            local_idx = jnp.arange(self.block, dtype=jnp.int32)
            rdt = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
            angles = angles.astype(rdt)

            def body(p, g):
                k, t, c, s = g
                theta = jnp.where(s >= 0, angles[jnp.maximum(s, 0)], 0.0)
                return self._apply_one_gate(p, k, t, c, theta, r, local_idx), None

            psi_block, _ = lax.scan(body, psi_block,
                                    (kind, tq, cq, angle_slot))
            return psi_block

        return jax.shard_map(
            apply_local, mesh=self.mesh,
            in_specs=(P("amp"), P(), P(), P(), P(), P()),
            out_specs=P("amp"), check_vma=False)

    def apply_tape(self, psi, kind, tq, cq, angle_slot, angles):
        return self._apply(psi, kind, tq, cq, angle_slot, angles)

    # -- batched over a 'dp' mesh axis ----------------------------------------

    def _build_batched(self):
        """(B, 2^n) states x (B, R) angle vectors, B sharded over 'dp' and
        amplitudes over 'amp': dp x amp joint sharding of the multi-start /
        trajectory batch."""

        def apply_local(psi_blocks, kind, tq, cq, angle_slot, angles):
            r = lax.axis_index("amp")
            local_idx = jnp.arange(self.block, dtype=jnp.int32)
            rdt = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64

            def one(psi_block, ang):
                ang = ang.astype(rdt)

                def body(p, g):
                    k, t, c, s = g
                    theta = jnp.where(s >= 0, ang[jnp.maximum(s, 0)], 0.0)
                    return (self._apply_one_gate(p, k, t, c, theta, r,
                                                 local_idx), None)

                out, _ = lax.scan(body, psi_block, (kind, tq, cq, angle_slot))
                return out

            return jax.vmap(one)(psi_blocks, angles)

        apply_b = jax.shard_map(
            apply_local, mesh=self.mesh,
            in_specs=(P("dp", "amp"), P(), P(), P(), P(), P("dp")),
            out_specs=P("dp", "amp"), check_vma=False)

        energy_local = self._energy_local_fn()
        energy_b = jax.shard_map(
            energy_local, mesh=self.mesh,
            in_specs=(P("dp", "amp"),), out_specs=P("dp"), check_vma=False)
        return jax.jit(apply_b), jax.jit(energy_b)

    def apply_tape_batched(self, psi_batch, kind, tq, cq, angle_slot,
                           angles_batch):
        if self._apply_b is None:
            self._apply_b, self._energy_b = self._build_batched()
        return self._apply_b(psi_batch, kind, tq, cq, angle_slot, angles_batch)

    def expectation_batched(self, psi_batch):
        if self._energy_b is None:
            self._apply_b, self._energy_b = self._build_batched()
        return self._energy_b(psi_batch)

    def zero_state_batched(self, batch: int):
        sharding = NamedSharding(self.mesh, P("dp", "amp"))
        psi = np.zeros((batch, 1 << self.n), dtype=np.dtype(self.dtype))
        psi[:, 0] = 1.0
        return jax.device_put(psi, sharding)

    # -- adjoint value-and-grad -------------------------------------------------

    def _hpsi_local(self, psi_block, r, local_idx):
        """Local block of the GLOBAL H|psi>: flip groups with device bits
        fetch the partner block via ppermute, then a K-term scan applies
        (H psi)[i] = sum_k w_k ip_k (1-2 parity(i & sm_k)) psi[i ^ f_k]
        (the operator form of the expectation gather) at O(block) memory."""
        gidx = (r.astype(jnp.int32) << self.nloc) | local_idx
        acc = jnp.zeros_like(psi_block)
        for g, w, flip_loc, sign_mask, iphase in self.groups:
            if g == 0:
                src = psi_block
            else:
                perm = [(rr, rr ^ g) for rr in range(self.D)]
                src = lax.ppermute(psi_block, "amp", perm)

            def term(a, wfsi):
                wk, fk, smk, ipk = wfsi
                signs = (1.0 - 2.0 * parity(gidx & smk).astype(
                    jnp.float32)).astype(psi_block.dtype)
                return a + (wk * ipk).astype(psi_block.dtype) * signs \
                    * jnp.take(src, local_idx ^ fk, axis=-1), None

            acc, _ = lax.scan(
                term, acc,
                (jnp.asarray(w), jnp.asarray(flip_loc),
                 jnp.asarray(sign_mask), jnp.asarray(iphase)))
        return acc

    def _build_vag_batched(self):
        """(B, 2^n) states x (B, R) angles -> (E (B,), dE/dx (B, R)) via
        the adjoint sweep: forward apply, lam = H psi, then un-apply each
        gate while accumulating Im<lam|P_g|psi> — O(1)-in-gates residual
        memory on every device (the single-chip sweep of sim/adjoint.py
        lifted onto the (amp, dp) mesh; sharded gates are unitary, so the
        backward pass runs the same ppermute partner exchanges in
        reverse)."""
        rdt = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        x_kind = int(GateKind.X)

        def vag_local(psi_blocks, kind, tq, cq, slot, angles):
            r = lax.axis_index("amp")
            local_idx = jnp.arange(self.block, dtype=jnp.int32)
            rev = tuple(jnp.flip(a, axis=0)
                        for a in (kind, tq, cq, slot))

            def one(psi0_block, ang):
                angf = ang.astype(rdt)

                def fwd(p, g):
                    k, t, c, s = g
                    theta = jnp.where(s >= 0, angf[jnp.maximum(s, 0)], 0.0)
                    return (self._apply_one_gate(p, k, t, c, theta, r,
                                                 local_idx), None)

                psi, _ = lax.scan(fwd, psi0_block, (kind, tq, cq, slot))
                lam = self._hpsi_local(psi, r, local_idx)
                e_loc = jnp.real(jnp.sum(jnp.conj(psi) * lam)).astype(rdt)
                n2_loc = jnp.sum(jnp.real(psi) ** 2
                                 + jnp.imag(psi) ** 2).astype(rdt)

                def bwd(carry, g):
                    p, l, grad = carry
                    k, t, c, s = g
                    theta = jnp.where(s >= 0, angf[jnp.maximum(s, 0)], 0.0)
                    # rotation generator = the bare Pauli gate (RX..RZ ->
                    # X..Z); other kinds map to NONE (grad masked anyway)
                    pk = jnp.where((k >= 1) & (k <= 3), k + x_kind - 1, 0)
                    pg = self._apply_one_gate(p, pk, t, jnp.full_like(c, -1),
                                              jnp.zeros((), rdt), r,
                                              local_idx)
                    if self.enable_2q:
                        # 2q rotation generator = the Pauli pair P_t P_c
                        # (same exp(-i theta G/2) convention, G^2 = I)
                        pg2 = self._pauli_pair(p, k, t, c, r, local_idx)
                        pg = jnp.where(k >= int(GateKind.RXX), pg2, pg)
                    gval = jnp.imag(jnp.sum(jnp.conj(l) * pg)).astype(rdt)
                    grad = grad.at[jnp.maximum(s, 0)].add(
                        jnp.where(s >= 0, gval, 0.0))
                    z = jnp.stack([p, l])
                    z = self._apply_one_gate(z, k, t, c, -theta, r,
                                             local_idx)
                    return (z[0], z[1], grad), None

                grad0 = jnp.zeros(ang.shape, rdt)
                (_, _, grad), _ = lax.scan(bwd, (psi, lam, grad0), rev)
                return e_loc, n2_loc, grad

            e_loc, n2_loc, grads = jax.vmap(one)(psi_blocks, angles)
            # Rayleigh quotient (see sim/expectation.py): cancels the f32
            # norm-drift bias; the norm is angle-independent for unitary
            # gates, so dividing the gradient by the same factor is exact.
            n2 = lax.psum(n2_loc, "amp")
            return (lax.psum(e_loc, "amp") / n2,
                    lax.psum(grads, "amp") / n2[:, None])

        return jax.shard_map(
            vag_local, mesh=self.mesh,
            in_specs=(P("dp", "amp"), P(), P(), P(), P(), P("dp")),
            out_specs=(P("dp"), P("dp")), check_vma=False)

    def value_and_grad_batched(self, psi_batch, kind, tq, cq, slot,
                               angles_batch):
        """Per-row energy and gradient of the tape, adjoint-mode."""
        if self._vag_b is None:
            self._vag_b = jax.jit(self._build_vag_batched())
        return self._vag_b(psi_batch, kind, tq, cq, slot, angles_batch)

    # -- expectation -----------------------------------------------------------

    def _energy_local_fn(self):
        def energy_local(psi_block):
            r = lax.axis_index("amp")
            local_idx = jnp.arange(self.block, dtype=jnp.int32)
            gidx = (r.astype(jnp.int32) << self.nloc) | local_idx
            total = jnp.zeros(psi_block.shape[:-1],
                              jnp.float32 if self.dtype == jnp.complex64
                              else jnp.float64)
            for g, w, flip_loc, sign_mask, iphase in self.groups:
                if g == 0:
                    src = psi_block
                else:
                    perm = [(rr, rr ^ g) for rr in range(self.D)]
                    src = lax.ppermute(psi_block, "amp", perm)

                def term(wk, fk, smk, ipk):
                    signs = 1.0 - 2.0 * parity(gidx & smk).astype(jnp.float32)
                    permuted = jnp.take(src, local_idx ^ fk, axis=-1)
                    acc = jnp.sum(jnp.conj(psi_block)
                                  * (signs.astype(psi_block.dtype) * permuted),
                                  axis=-1)
                    return wk * jnp.real(ipk * acc)

                total = total + jnp.sum(
                    jax.vmap(term)(w, flip_loc, sign_mask, iphase), axis=0)
            n2 = jnp.sum(jnp.real(psi_block) ** 2 + jnp.imag(psi_block) ** 2,
                         axis=-1).astype(total.dtype)
            # Rayleigh quotient (see sim/expectation.py)
            return lax.psum(total, "amp") / lax.psum(n2, "amp")

        return energy_local

    def _build_energy(self):
        return jax.shard_map(
            self._energy_local_fn(), mesh=self.mesh,
            in_specs=(P("amp"),), out_specs=P(), check_vma=False)

    def expectation(self, psi):
        return self._energy(psi)
