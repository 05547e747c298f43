"""Amplitude-sharded per-step angle optimization (scale-out past ~13q).

``ShardedAngleOptimizer`` is the multi-chip drop-in for the hot-path
methods of ``AngleOptimizer`` (``fused_step``/``energy``): the 2^n
statevector is sharded over the mesh's ``amp`` axis through
``ShardedSimulator`` (ppermute partner exchanges, psum expectations) and
the multi-start batch rides the ``dp`` axis.  One jitted program per env
step, exactly like the single-chip fused path.

This is the capability the reference caps at 20 qubits on one CPU
(``README.md:29``, qulacs statevector): here n is bounded by per-chip
HBM / amp-axis size (2^n * 8 bytes / n_amp per chip), not by one device.
Depolarizing trajectories ride the same sharded programs as tape
extensions (X/Y/Z error gates in reserved slots, the single-chip mega
path's encoding), with both reference 'iter' re-sampling and quenched
'step' semantics; shot noise stays single-chip.

Used by ``envs/circuit_env.py`` when ``EnvConfig.mesh_shape`` is set;
tests/test_sharded_training.py drives a 20-qubit env end-to-end on a
virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tensorrl_qas_tpu.parallel.sharded_sim import ShardedSimulator


class ShardedAngleOptimizer:
    """Fixed-iteration multi-start Adam over an (amp, dp) device mesh.

    Args:
      mesh: mesh with ``amp`` and ``dp`` axes (from parallel.mesh.make_mesh).
      n_qubits: problem size; 2^n divisible by the amp axis.
      pauli: PauliSum (grouped by device-flip mask at setup).
      iters/n_starts/lr/restart_scale: as AngleOptimizer.
      noise_mode/noise_p1/noise_p2/noise_resample: 'none' or
        'depolarizing' single-trajectory tape-extension noise (as the
        single-chip mega path; reference probabilities
        ``VQE_qulacs_noise.py:32,45``).
    """

    def __init__(self, mesh, n_qubits: int, pauli, iters: int = 100,
                 n_starts: int = 8, lr: float = 0.1,
                 restart_scale: float = 0.1, dtype=jnp.complex64,
                 noise_mode: str = "none", noise_p1: float = 0.01,
                 noise_p2: float = 0.05, noise_resample: str = "iter",
                 enable_2q: bool = False):
        if noise_mode not in ("none", "depolarizing"):
            raise NotImplementedError(
                f"sharded path supports noise_mode none/depolarizing, "
                f"got {noise_mode!r} (shot noise is single-chip only)")
        self.mesh = mesh
        self.n = n_qubits
        self.sim = ShardedSimulator(mesh, n_qubits, pauli, dtype=dtype,
                                    enable_2q=enable_2q)
        self.iters = iters
        self.noise_mode = noise_mode
        self.noise_p1 = float(noise_p1)
        self.noise_p2 = float(noise_p2)
        self.noise_resample = noise_resample
        # the starts batch rides dp; round up to a multiple of its size
        n_dp = mesh.shape.get("dp", 1)
        self.n_starts = max(n_starts, n_dp)
        if self.n_starts % n_dp:
            self.n_starts += n_dp - self.n_starts % n_dp
        if self.n_starts != n_starts:
            print(f"ShardedAngleOptimizer: n_starts {n_starts} -> "
                  f"{self.n_starts} (rounded up to dp axis {n_dp})",
                  flush=True)
        self.lr = lr
        self.restart_scale = restart_scale
        self.dtype = dtype
        self.rdtype = jnp.float32 if dtype == jnp.complex64 else jnp.float64
        self._fused_jit = jax.jit(self._fused_step)
        self._energy_jit = jax.jit(self._energy_one)
        self._psi0_cache = {}

    # -- state handling --------------------------------------------------------

    @staticmethod
    def _stamp(arr) -> tuple:
        """Cheap content fingerprint of a host array: shape + a strided
        64-sample byte digest.  Unlike ``id()`` it cannot silently alias a
        different array after garbage collection / buffer reuse."""
        a = np.asarray(arr).ravel()
        stride = max(1, a.size // 64)
        return (a.shape if a.ndim else (a.size,), a.size,
                a[::stride].tobytes())

    def _psi0_batched(self, psi0):
        """(B, 2^n) sharded initial-state batch from an (re, im) host pair
        (or None for |0...0>).  Cached: the warm-start state is fixed per
        env, and re-placing a 2^n-sized batch every step would dominate."""
        key = ((self._stamp(psi0[0]), self._stamp(psi0[1]))
               if isinstance(psi0, tuple) else None)
        cached = self._psi0_cache.get(key)
        if cached is not None:
            return cached
        b = self.n_starts
        if psi0 is None:
            out = self.sim.zero_state_batched(b)
        else:
            re, im = psi0
            psi = (np.asarray(re) + 1j * np.asarray(im)).astype(
                np.dtype(self.dtype))
            out = jax.device_put(
                np.broadcast_to(psi, (b, psi.shape[-1])),
                NamedSharding(self.mesh, P("dp", "amp")))
        self._psi0_cache = {key: out}
        return out

    # -- fused step -------------------------------------------------------------

    def _mean_and_each(self, psi0_b, arrs, xb):
        psi = self.sim.apply_tape_batched(psi0_b, *arrs, xb)
        ev = self.sim.expectation_batched(psi)
        return jnp.sum(ev), ev

    def _extend_noisy(self, arrs, key):
        """One sampled depolarizing trajectory as a 3x tape extension
        (X/Y/Z error gates in reserved slot = -1 positions); shared by the
        S starts, exactly like the single-chip mega path."""
        from tensorrl_qas_tpu.optim.angle_opt import (
            extend_tape_arrays, sample_depolarizing_kinds)

        kt, kc = sample_depolarizing_kinds(arrs[0], key, self.noise_p1,
                                           self.noise_p2)
        return extend_tape_arrays(arrs, kt, kc)

    def _fused_step(self, psi0_b, old_arrs, x0, active, new_arrs, map_idx,
                    key):
        b1, b2, eps = 0.9, 0.999, 1e-8
        kn, knz = jax.random.split(key)
        from tensorrl_qas_tpu.optim.angle_opt import make_multistarts
        starts = make_multistarts(x0, active, kn, self.n_starts,
                                  self.n_starts // 4, self.restart_scale)
        starts = jax.lax.with_sharding_constraint(
            starts, NamedSharding(self.mesh, P("dp")))

        noisy = self.noise_mode == "depolarizing"
        resample = noisy and self.noise_resample == "iter"
        if noisy and not resample:
            # quench ONE realization per env step into the tapes
            k_old, k_new = jax.random.split(jax.random.fold_in(knz, 7))
            old_arrs = self._extend_noisy(old_arrs, k_old)
            new_arrs = self._extend_noisy(new_arrs, k_new)

        def arrs_at(i):
            # 'iter' reference semantics: a fresh trajectory every
            # optimizer evaluation (VQE_qulacs_noise.py re-simulates the
            # stochastic circuit per COBYLA nfev)
            if resample:
                return self._extend_noisy(old_arrs, jax.random.fold_in(
                    knz, i))
            return old_arrs

        def val_and_grad(xb, arrs):
            # adjoint sweep on the mesh (ShardedSimulator.
            # value_and_grad_batched): no per-gate forward residuals —
            # the backward pass un-applies gates with the same ppermute
            # exchanges, keeping >20q iterations in O(statevector) HBM
            return self.sim.value_and_grad_batched(psi0_b, *arrs, xb)

        def step(carry, i):
            x, m, v, best_x, best_e = carry
            ev, g = val_and_grad(x, arrs_at(i))
            g = g * active[None, :]
            better = ev < best_e
            best_x = jnp.where(better[:, None], x, best_x)
            best_e = jnp.where(better, ev, best_e)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            t = i.astype(x.dtype) + 1.0
            x = x - self.lr * (m / (1 - b1 ** t)) / (
                jnp.sqrt(v / (1 - b2 ** t)) + eps)
            return (x, m, v, best_x, best_e), None

        init = (starts, jnp.zeros_like(starts), jnp.zeros_like(starts),
                starts, jnp.full((self.n_starts,), jnp.inf, x0.dtype))
        (x, _, _, best_x, best_e), _ = jax.lax.scan(
            step, init, jnp.arange(self.iters))
        _, ev = self._mean_and_each(psi0_b, arrs_at(self.iters), x)
        better = ev < best_e
        best_x = jnp.where(better[:, None], x, best_x)
        best_e = jnp.where(better, ev, best_e)

        sel = jnp.argmin(best_e)
        x_opt = best_x[sel]
        x_new = jnp.where(map_idx >= 0, x_opt[jnp.maximum(map_idx, 0)], 0.0)
        xb_new = jnp.broadcast_to(x_new, (self.n_starts, x_new.shape[0]))
        if resample:
            new_arrs = self._extend_noisy(
                new_arrs, jax.random.fold_in(knz, self.iters + 1))
        _, ev_new = self._mean_and_each(psi0_b, new_arrs, xb_new)
        return x_opt, ev_new[0]

    def fused_step(self, psi0, old_tape_arrays, x0, n_active_old,
                   new_tape_arrays, map_idx, key):
        """AngleOptimizer.fused_step signature: returns (x_opt (R,) numpy,
        e_new float, nfev)."""
        x0 = jnp.asarray(np.asarray(x0, dtype=self.rdtype))
        active = (jnp.arange(x0.shape[0]) < n_active_old).astype(self.rdtype)
        psi0_b = self._psi0_batched(psi0)
        x_opt, e_new = self._fused_jit(
            psi0_b, tuple(map(jnp.asarray, old_tape_arrays)), x0, active,
            tuple(map(jnp.asarray, new_tape_arrays)), jnp.asarray(map_idx),
            key)
        return np.asarray(x_opt), float(e_new), self.iters * self.n_starts

    def fused_step_batch(self, psi0, old_arrs_b, x0_b, n_active_b,
                         new_arrs_b, map_idx_b, keys):
        """AngleOptimizer.fused_step_batch signature, so VectorCircuitEnv
        works on the sharded path.

        Envs run sequentially: each env carries its own tape, and a
        gate's implementation on the amp-sharded statevector depends on
        which qubit it hits (local rotation vs ppermute exchange), so
        heterogeneous tapes cannot share one sharded program the way the
        single-chip mega-kernel batches envs on its grid.  Each per-env
        call already saturates the mesh (dp carries the n_starts batch);
        the vectorized trainer still amortizes its host-side act/replay
        work across the B replicas.
        """
        xs, es = [], []
        for i in range(x0_b.shape[0]):
            x_opt, e_new, _ = self.fused_step(
                psi0, tuple(a[i] for a in old_arrs_b), x0_b[i],
                int(n_active_b[i]), tuple(a[i] for a in new_arrs_b),
                map_idx_b[i], keys[i])
            xs.append(x_opt)
            es.append(e_new)
        return np.stack(xs), np.asarray(es), self.iters * self.n_starts

    # -- single energy ----------------------------------------------------------

    def _energy_one(self, psi0_b, arrs, x, key):
        if self.noise_mode == "depolarizing":
            arrs = self._extend_noisy(arrs, key)
        xb = jnp.broadcast_to(x, (self.n_starts, x.shape[0]))
        _, ev = self._mean_and_each(psi0_b, arrs, xb)
        return ev[0]

    def energy(self, psi0, tape_arrays, x, key=None) -> float:
        """<H> of the tape at angles ``x``: exact when noiseless; one
        sampled depolarizing trajectory (keyed by ``key``) when
        ``noise_mode='depolarizing'`` — the same single-trajectory
        semantics as the single-chip path (shot noise stays single-chip
        only)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.asarray(x, dtype=self.rdtype))
        psi0_b = self._psi0_batched(psi0)
        return float(self._energy_jit(psi0_b,
                                      tuple(map(jnp.asarray, tape_arrays)),
                                      x, key))
