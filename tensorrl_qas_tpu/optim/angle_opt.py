"""Per-step variational angle optimization.

The reference re-optimizes *all* circuit angles with host-side COBYLA after
every environment step (``environment_qulacs.py:220-225, 417-445``,
``maxiter = global_iters``).  That is sequential, variable-length, and pays
a Python->C++ qulacs boundary per function evaluation.

TPU-native default (``method='adam'``): the simulator is differentiable, so
we run a *fixed-iteration, multi-start* Adam on the device — one jitted
``lax.scan`` evaluating a batch of angle vectors in parallel
(``vmap`` over starts).  Fixed iteration counts keep shapes static; the
batch replaces qulacs' OpenMP with on-chip parallelism.  Start 0 is the
incoming angle vector (COBYLA's warm start); the rest are Gaussian
perturbations to escape local minima.

Parity mode (``method='cobyla'``): scipy's COBYLA driving the jitted energy
— identical semantics to the reference (scipy is the same Fortran COBYLA),
but each evaluation is a single compiled XLA call instead of a per-gate
Python loop.

Noise models (reference capability matrix, SURVEY.md section 2.3):
``noise_mode='depolarizing'`` evaluates stochastic Pauli-trajectory
energies (mean of ``n_traj`` trajectories; ``n_traj=1`` = reference
single-sample semantics); ``'shot'`` adds per-term Gaussian sampling noise.

``nfev`` reporting matches the reference's role for it (optimizer work per
env step, the paper's headline metric, ``image/result2.png``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tensorrl_qas_tpu.circuits.tape import GateKind
from tensorrl_qas_tpu.sim.apply import apply_tape
from tensorrl_qas_tpu.sim.expectation import pauli_expectation
from tensorrl_qas_tpu.sim.noise import apply_tape_depolarizing, shot_noise

_RX, _RZ = int(GateKind.RX), int(GateKind.RZ)
_CX, _X = int(GateKind.CX), int(GateKind.X)
_NONE = int(GateKind.NONE)


def sample_depolarizing_kinds(kind, key, p1, p2):
    """Per-gate depolarizing draw as *gate kinds* for the two noise slots
    that follow each real gate (target slot, control slot).

    Same distribution as ``sim.noise.apply_tape_depolarizing``: after a
    rotation, prob ``p1`` of a uniform Pauli on the target; after a CX,
    prob ``p2`` of one of the 15 non-identity Pauli pairs (qulacs
    TwoQubitDepolarizingNoise convention).  Returns int32 kind arrays
    shaped like ``kind`` (NONE = no error).  Shared by the single-chip
    optimizer and ``optim.sharded_opt`` (trajectory noise on the mesh).
    """
    ku, k1, kj = jax.random.split(key, 3)
    u = jax.random.uniform(ku, kind.shape)
    is_rot = (kind >= _RX) & (kind <= _RZ)
    is_cx = kind == _CX
    fire1 = is_rot & (u < p1)
    fire2 = is_cx & (u < p2)
    code1 = jax.random.randint(k1, kind.shape, 1, 4)
    j = jax.random.randint(kj, kind.shape, 1, 16)

    def pk(code):       # 0 -> NONE, 1..3 -> X/Y/Z
        return jnp.where(code == 0, _NONE, _X + code - 1)

    kt = jnp.where(fire1, pk(code1),
                   jnp.where(fire2, pk(j % 4), _NONE))
    kc = jnp.where(fire2, pk(j // 4), _NONE)
    return kt.astype(kind.dtype), kc.astype(kind.dtype)


def extend_tape_arrays(arrs, kt, kc):
    """Interleave sampled noise-slot kinds into a 3x-length tape:
    position 3g = real gate, 3g+1 = Pauli-on-target slot, 3g+2 =
    Pauli-on-control slot (NONE when the draw didn't fire).  Works for
    (G,) tapes and any leading batch dims."""
    kind, tq, cq, slot = arrs
    g = kind.shape[-1]
    out_shape = kind.shape[:-1] + (3 * g,)
    neg1 = jnp.full_like(kind, -1)
    ext_kind = jnp.stack([kind, kt, kc], axis=-1).reshape(out_shape)
    ext_tq = jnp.stack([tq, tq, jnp.maximum(cq, 0)],
                       axis=-1).reshape(out_shape)
    ext_cq = jnp.stack([cq, neg1, neg1], axis=-1).reshape(out_shape)
    ext_slot = jnp.stack([slot, neg1, neg1], axis=-1).reshape(out_shape)
    return ext_kind, ext_tq, ext_cq, ext_slot


def make_multistarts(x0, active, kn, n_starts, fresh_starts, restart_scale,
                     lead_shape=()):
    """Multi-start batch: start 0 = exact warm start, middle starts =
    warm + Gaussian, and the last ``fresh_starts`` centered at ZERO
    (one exactly zero).  Zero-centered starts cover basins the
    warm-started family can miss (the round-3 structure search found
    its deep minima exclusively from zero starts); the reference's
    COBYLA warm-starts exclusively (``environment_qulacs.py:436-441``),
    so this widens basin coverage at identical evaluation budget while
    start 0 keeps exact reference parity.

    One definition shared by the single-chip ``AngleOptimizer`` and the
    amplitude-sharded ``ShardedAngleOptimizer`` — the start policy must
    not drift between the two paths."""
    s = n_starts
    f = fresh_starts
    shape = (*lead_shape, s, x0.shape[-1])
    noise = jax.random.normal(kn, shape, dtype=x0.dtype) * restart_scale
    noise = noise.at[..., 0, :].set(0.0)
    starts = x0[..., None, :] + noise
    if f:
        fresh = noise[..., s - f:, :]
        fresh = fresh.at[..., 0, :].set(0.0)
        starts = starts.at[..., s - f:, :].set(fresh)
    return starts * active[..., None, :]


class AngleOptimizer:
    """Compiled per-step angle optimizer bound to one problem + tape shape.

    Args:
      pauli_arrays: host arrays from ``PauliSum.device_arrays``.
      method: 'adam' (TPU-native) or 'cobyla' (host parity mode).
      iters: optimizer iterations (adam) or maxiter (COBYLA); reference
        config key ``global_iters``.
      n_starts: multi-start batch width (adam only).
      lr: adam learning rate.
      restart_scale: stddev of Gaussian perturbation for starts 1..B-1.
      dtype: statevector dtype.
      noise_mode: 'none' | 'depolarizing' | 'shot'.
      noise_p1/noise_p2: depolarizing probabilities after rotations / CNOTs
        (reference hardcodes 0.01 / 0.05, ``VQE_qulacs_noise.py:32,45``).
      n_shots: shot-noise sample count (0 disables).
      n_traj: trajectories averaged per depolarizing energy evaluation.
    """

    def __init__(self, pauli_arrays, method: str = "adam", iters: int = 100,
                 n_starts: int = 8, lr: float = 0.1,
                 restart_scale: float = 0.1, dtype=jnp.complex64,
                 noise_mode: str = "none", noise_p1: float = 0.01,
                 noise_p2: float = 0.05, n_shots: int = 0, n_traj: int = 1,
                 use_pallas: bool = False, enable_2q: bool = False):
        self.pauli = pauli_arrays
        self.method = method
        self.iters = iters
        self.n_starts = n_starts
        # see _make_starts: zero-centered starts that escape the greedy
        # warm-start basin (0 when too few starts to spare)
        self.fresh_starts = n_starts // 4
        self.lr = lr
        self.restart_scale = restart_scale
        self.dtype = dtype
        self.noise_mode = noise_mode
        self.noise_p1 = noise_p1
        self.noise_p2 = noise_p2
        self.n_shots = n_shots
        self.n_traj = n_traj
        self.enable_2q = enable_2q    # RXX/RYY/RZZ (su4 gate set)
        self.use_pallas = use_pallas
        # depolarizing sampling cadence on the pallas paths:
        # 'iter' (default) re-draws the trajectory every Adam iteration
        # (reference semantics: qulacs re-samples per COBYLA nfev) and runs
        # the composed kernels; 'step' quenches ONE realization per env
        # step into the extended tape, unlocking the single-launch
        # mega-kernels for noisy training (the optimizer then sees a fixed
        # sampled circuit; the post-action energy uses a fresh draw).
        self.noise_resample = "iter"
        self.pallas_interpret = False   # tests set True to run on CPU
        # mega-kernel engine: 'auto' = v1 dense-H for D<=1024, v2 2D-tiled
        # for 1024 < D <= 262144 (n <= 18; W planes HBM-streamed above
        # W_RESIDENT_MAX); 'v1'/'v2' force one (v2 needs D >= 128)
        self.pallas_engine = "auto"
        self._w2d = None
        self._w2d_stream = False
        # cached VMEM-budget rejection: _pick_engine runs every env step
        # and must not rebuild (and discard) the W planes each time.
        # Valid because _pauli_obj is assigned once per optimizer
        # (circuit_env.py creates a fresh optimizer per problem).
        self._w2d_rejected = False
        self._energy_jit = jax.jit(self._energy)
        self._opt_jit = jax.jit(self._optimize_multistart)
        self._fused_jit = jax.jit(self._fused_step)
        self._fused_pallas_jit = jax.jit(self._fused_step_pallas)
        # batched fused step over a leading env-replica axis; psi0 shared
        self._fused_batch_jit = jax.jit(jax.vmap(
            self._fused_step, in_axes=(None, 0, 0, 0, 0, 0, 0)))
        # per-env psi0 twin (block-coordinate trainable mode: every env
        # carries its own frozen-prefix statevector)
        self._fused_batch_jit_ppsi = jax.jit(jax.vmap(
            self._fused_step, in_axes=(0, 0, 0, 0, 0, 0, 0)))
        self._host_key = jax.random.PRNGKey(0xC0B)
        self._host_body_jit = None   # host-stepped Adam body (large-n path)
        self._csim = None
        self._csim_tried = False
        self._adjoint_slice = None   # built lazily per problem (slice engine)
        self._pauli_obj = None  # set by callers (csim + dense-H mega path)
        self._hre_t = None
        self._him_t = None

    def _mega_ready(self) -> bool:
        """Prepare the dense H^T planes for the single-launch kernel.

        D < 128 (n <= 6) is zero-padded to the TPU's 128-lane minimum
        (Mosaic rejects unaligned pltpu.roll shapes): active lanes never
        read padding (c ^ 2^t < D for c < D, t < n), and the zero H block
        keeps padded-lane garbage out of energies and gradients.
        """
        if self._hre_t is not None:
            return True
        if self._pauli_obj is None:
            return False
        d = 1 << self._pauli_obj.n_qubits
        if d > 1024:
            return False
        ht = self._pauli_obj.to_dense().T
        dpad = max(d, 128)
        if dpad != d:
            pad = np.zeros((dpad, dpad), dtype=complex)
            pad[:d, :d] = ht
            ht = pad
        self._hre_t = jnp.asarray(np.real(ht), jnp.float32)
        self._him_t = jnp.asarray(np.imag(ht), jnp.float32)
        return True

    def _mega2d_ready(self) -> bool:
        """Prepare flip-grouped Pauli planes for the 2D-tiled mega-kernel
        (ops/pallas_opt2d.py); usable for 128 <= D <= 262144 (n <= 18).

        Decides W-plane placement: VMEM-resident below W_RESIDENT_MAX,
        HBM-streamed above; rejects configurations whose live state
        planes (~8 f32 (S*R, 128) blocks through the backward pass)
        exceed the VMEM budget.  S here is the PER-CALL start count:
        start counts above the per-call cap (MAX_SR_ROWS, the measured
        v5e Mosaic register-spill wall) are chunked across kernel calls
        by ``fused_step_batch``, so e.g. 17q S=8 runs as 2x S=4 calls
        rather than being rejected."""
        if self._w2d is not None:
            return True
        if self._pauli_obj is None or self._w2d_rejected:
            return False
        from tensorrl_qas_tpu.ops.pallas_opt2d import (
            MAX_DIM_2D,
            MAX_SR_ROWS,
            MIN_DIM_2D,
            VMEM_BUDGET,
            W_RESIDENT_MAX,
            pauli_flip_groups,
        )

        d = 1 << self._pauli_obj.n_qubits
        if not (MIN_DIM_2D <= d <= MAX_DIM_2D):
            self._w2d_rejected = True
            return False
        r_rows = d // 128
        s_eff = min(self.n_starts, max(1, MAX_SR_ROWS // r_rows))
        state_bytes = 8 * s_eff * r_rows * 128 * 4
        # cheap pre-plane rejection: the state planes alone bust the
        # budget even with fully streamed W (one (R, C) buffer pair) —
        # don't build (and then discard) the W planes every env step
        if state_bytes + 2 * r_rows * 128 * 4 > VMEM_BUDGET:
            self._w2d_rejected = True
            return False
        wre, wim, flips = pauli_flip_groups(self._pauli_obj)
        w_bytes = 2 * len(flips) * r_rows * 128 * 4
        # stream when the planes are big OR at n=16 where the state
        # planes alone dominate — both cutoffs hardware-probed (resident:
        # 12q molecular 9.3 MB, 13-15q chains; streamed: 16q, and any
        # many-group molecular case past 12q)
        stream = w_bytes > W_RESIDENT_MAX or d > 32768
        resident = (2 * r_rows * 128 * 4) if stream else w_bytes
        if state_bytes + resident > VMEM_BUDGET:
            self._w2d_rejected = True   # cache: _pick_engine runs per step
            return False
        self._w2d_stream = stream
        self._w2d = (jnp.asarray(wre), jnp.asarray(wim), flips)
        return True

    def _pick_engine(self) -> str:
        """Select the mega-kernel variant for the current problem."""
        if self.enable_2q:
            # RXX/RYY/RZZ exist only in the composed kernel's gate
            # dispatch (double XOR-partner rolls, ops/pallas_apply.py);
            # the single-launch mega-kernels stay 1q+CX
            return "composed"
        if self.pallas_engine == "v1":
            return "v1" if self._mega_ready() else "composed"
        if self.pallas_engine == "v2":
            return "v2" if self._mega2d_ready() else "composed"
        # v1 (flat lane layout + dense-H MXU energy) is fastest up to
        # D = 512; v2 (2D-tiled + flip-grouped Pauli energy) covers
        # 1024 <= D <= 4096.  Both are exact f32 (roll-based partners).
        # The complementary cases (v1 at D >= 1024, v2 at D <= 512) hit a
        # Mosaic compiler crash on v5e and are excluded here.
        if self._pauli_obj is not None \
                and (1 << self._pauli_obj.n_qubits) <= 512 \
                and self._mega_ready():
            return "v1"
        if self._mega2d_ready():
            return "v2"
        if self._mega_ready():
            return "v1"
        return "composed"

    def _csim_engine(self):
        """Native host engine for the COBYLA inner loop (no device round
        trips per scipy iterate); None when unavailable."""
        if self._csim_tried:
            return self._csim
        self._csim_tried = True
        if self._pauli_obj is None:
            return None
        try:
            from tensorrl_qas_tpu import native

            if native.available():
                self._csim = native.CsimEngine(self._pauli_obj)
        except Exception:
            self._csim = None
        return self._csim

    # -- energy ---------------------------------------------------------------

    def _as_complex(self, psi0):
        """Statevectors cross jit boundaries as (re, im) real pairs on some
        TPU transports (complex transfers are unimplemented); combine inside
        the trace.  Plain complex arrays are accepted too (CPU paths)."""
        if isinstance(psi0, tuple):
            re, im = psi0
            return (re + 1j * im).astype(self.dtype)
        return psi0

    def _xla_slice(self, dim: int) -> bool:
        """Gather-free slice engine for the XLA path at large D.

        TPU gathers of 2^n elements run on the scalar core; the slice
        engine (lax.switch over static reshapes, sim/apply.py) turns
        gate application and H|psi> into block copies.  Hardware-probed
        crossover: the gather path is fine through ~n=13 and pathological
        by n=20 (36 s/iter, worker crashes); default to slices from
        D = 2^14.  ``TRLQAS_XLA_APPLY=gather|slice`` forces one.
        """
        force = os.environ.get("TRLQAS_XLA_APPLY")
        if force is not None:
            return force == "slice"
        return dim >= (1 << 14)

    def _energy(self, psi0, kind, tq, cq, slot, x, key):
        psi0 = self._as_complex(psi0)
        if self.noise_mode == "depolarizing":
            def one(k):
                psi = apply_tape_depolarizing(
                    psi0, kind, tq, cq, slot, x, k, self.noise_p1,
                    self.noise_p2)
                return pauli_expectation(psi, *self.pauli)

            if self.n_traj == 1:
                return one(key)
            return jnp.mean(jax.vmap(one)(jax.random.split(key, self.n_traj)))

        if self._xla_slice(psi0.shape[-1]):
            from tensorrl_qas_tpu.sim.expectation import (
                pauli_expectation_static,
            )

            psi = apply_tape(psi0, kind, tq, cq, slot, x,
                             enable_2q=self.enable_2q, engine="slice")
            e = pauli_expectation_static(psi, *self.pauli)
        else:
            psi = apply_tape(psi0, kind, tq, cq, slot, x,
                             enable_2q=self.enable_2q)
            e = pauli_expectation(psi, *self.pauli)
        if self.noise_mode == "shot" and self.n_shots:
            e = e + shot_noise(jnp.asarray(self.pauli[0]), self.n_shots, key)
        return e

    def energy(self, psi0, tape_arrays, x, key=None) -> float:
        kind, tq, cq, slot = tape_arrays
        if key is None:
            self._host_key, key = jax.random.split(self._host_key)
        return float(self._energy_jit(psi0, kind, tq, cq, slot,
                                      jnp.asarray(x), key))

    # -- adam (on-device) -------------------------------------------------------

    def _energy_for_grad(self, psi0, kind, tq, cq, slot, x, key):
        """Energy as used inside gradient loops.

        Unitary cases (noiseless / shot) go through the adjoint-mode VJP
        (sim/adjoint.py): O(1)-in-gates residual memory instead of one
        stored statevector per gate per Adam iteration — the difference
        between fitting and 33 GB of residuals at 14q.  Depolarizing
        keeps the stored-residual autodiff (its gates are sampled inside
        ``apply_tape_depolarizing``)."""
        if self.noise_mode == "depolarizing":
            return self._energy(psi0, kind, tq, cq, slot, x, key)
        psi0c = self._as_complex(psi0)
        if self._xla_slice(psi0c.shape[-1]):
            if self._adjoint_slice is None:
                from tensorrl_qas_tpu.sim.adjoint import (
                    make_adjoint_energy_slice,
                )

                self._adjoint_slice = make_adjoint_energy_slice(
                    self.enable_2q, self.pauli)
            e = self._adjoint_slice(psi0c, kind, tq, cq, slot, x)
        else:
            from tensorrl_qas_tpu.sim.adjoint import adjoint_energy

            e = adjoint_energy(self.enable_2q, psi0c, kind,
                               tq, cq, slot, x, *self.pauli)
        if self.noise_mode == "shot" and self.n_shots:
            e = e + shot_noise(jnp.asarray(self.pauli[0]), self.n_shots, key)
        return e

    def _adam_single(self, psi0, kind, tq, cq, slot, x0, active, key):
        """Fixed-iteration Adam tracking the best iterate seen."""
        b1, b2, eps = 0.9, 0.999, 1e-8
        val_and_grad = jax.value_and_grad(
            lambda x, k: self._energy_for_grad(psi0, kind, tq, cq, slot,
                                               x, k))

        def step(carry, i):
            x, m, v, best_x, best_e = carry
            e, g = val_and_grad(x, jax.random.fold_in(key, i))
            g = g * active
            better = e < best_e
            best_x = jnp.where(better, x, best_x)
            best_e = jnp.where(better, e, best_e)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            t = i.astype(x.dtype) + 1.0
            mhat = m / (1 - b1 ** t)
            vhat = v / (1 - b2 ** t)
            x = x - self.lr * mhat / (jnp.sqrt(vhat) + eps)
            return (x, m, v, best_x, best_e), None

        init = (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), x0,
                jnp.asarray(jnp.inf, x0.dtype))
        (x, _, _, best_x, best_e), _ = jax.lax.scan(
            step, init, jnp.arange(self.iters))
        e_final = val_and_grad(x, jax.random.fold_in(key, self.iters))[0]
        better = e_final < best_e
        return jnp.where(better, x, best_x), jnp.where(better, e_final, best_e)

    def _make_starts(self, x0, active, kn, lead_shape=()):
        return make_multistarts(x0, active, kn, self.n_starts,
                                self.fresh_starts, self.restart_scale,
                                lead_shape=lead_shape)

    def _optimize_multistart(self, psi0, kind, tq, cq, slot, x0, active, key):
        kn, ko = jax.random.split(key)
        starts = self._make_starts(x0, active, kn)
        xs, es = jax.vmap(
            lambda s, k: self._adam_single(psi0, kind, tq, cq, slot, s,
                                           active, k)
        )(starts, jax.random.split(ko, self.n_starts))
        best = jnp.argmin(es)
        return xs[best], es[best]

    def _fused_step(self, psi0, old_arrs, x0, active, new_arrs, map_idx, key):
        """One env step's device work in a single XLA program (one host
        round trip): optimize the pre-action circuit, remap the optimized
        angles onto the post-action tape (``map_idx``, host-precomputed
        insertion permutation; the freshly placed rotation enters at 0), and
        evaluate the post-action energy."""
        ko, ke = jax.random.split(key)
        x_opt, e_opt = self._optimize_multistart(psi0, *old_arrs, x0, active,
                                                 ko)
        x_new = jnp.where(map_idx >= 0, x_opt[jnp.maximum(map_idx, 0)], 0.0)
        e_new = self._energy(psi0, *new_arrs, x_new, ke)
        return x_opt, e_new

    def fused_step(self, psi0, old_tape_arrays, x0, n_active_old,
                   new_tape_arrays, map_idx, key):
        """Returns (x_opt numpy (R,), e_new float, nfev)."""
        rdtype = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        x0 = jnp.asarray(np.asarray(x0, dtype=rdtype))
        active = (jnp.arange(x0.shape[0]) < n_active_old).astype(rdtype)
        if self.use_pallas:
            x_opt, e_new, nfev = self.fused_step_batch(
                psi0, tuple(np.asarray(a)[None] for a in old_tape_arrays),
                np.asarray(x0)[None], np.asarray([n_active_old]),
                tuple(np.asarray(a)[None] for a in new_tape_arrays),
                np.asarray(map_idx)[None], key[None])
            return x_opt[0], float(e_new[0]), nfev
        if self._host_stepped(psi0):
            return self._fused_step_hostloop(
                psi0, old_tape_arrays, x0, active, new_tape_arrays,
                jnp.asarray(map_idx), key)
        x_opt, e_new = self._fused_jit(psi0, old_tape_arrays, x0, active,
                                       new_tape_arrays,
                                       jnp.asarray(map_idx), key)
        return np.asarray(x_opt), float(e_new), self.iters * self.n_starts

    # -- host-stepped fused step (very large n) -----------------------------

    def _host_stepped(self, psi0) -> bool:
        """Whole-optimization-in-one-XLA-program is the default, but at
        n >= 19 the program (iters-scan over a custom-VJP adjoint under a
        starts-vmap) overflows the TPU AOT compiler itself — at n=20 the
        remote tpu_compile_helper is SIGKILLed while the plain forward
        energy compiles fine.  Above the threshold the Adam recursion runs
        on host around a jitted value+grad body (one adjoint fwd+bwd, the
        minimal compile unit); per-iteration dispatch (~30 ms tunnel RTT)
        is noise against multi-second 20q device work.
        ``TRLQAS_FUSED_HOST=1/0`` forces it on/off."""
        env = os.environ.get("TRLQAS_FUSED_HOST")
        if env in ("0", "1"):
            return env == "1"
        dim = psi0[0].size if isinstance(psi0, tuple) else psi0.size
        return dim >= (1 << 19)

    def _fused_step_hostloop(self, psi0, old_arrs, x0, active, new_arrs,
                             map_idx, key):
        b1, b2, eps = 0.9, 0.999, 1e-8
        if self._host_body_jit is None:
            def body(psi0_, kind, tq, cq, slot, active_, xs, m, v,
                     best_x, best_e, keys, i):
                def one(x, m_, v_, bx, be, k):
                    e, g = jax.value_and_grad(
                        lambda xx, kk: self._energy_for_grad(
                            psi0_, kind, tq, cq, slot, xx, kk)
                    )(x, jax.random.fold_in(k, i))
                    g = g * active_
                    better = e < be
                    bx = jnp.where(better, x, bx)
                    be = jnp.where(better, e, be)
                    m2 = b1 * m_ + (1 - b1) * g
                    v2 = b2 * v_ + (1 - b2) * g * g
                    t = i.astype(x.dtype) + 1.0
                    mhat = m2 / (1 - b1 ** t)
                    vhat = v2 / (1 - b2 ** t)
                    x2 = x - self.lr * mhat / (jnp.sqrt(vhat) + eps)
                    return x2, m2, v2, bx, be

                return jax.vmap(one)(xs, m, v, best_x, best_e, keys)

            self._host_body_jit = jax.jit(body)

        # mirror the fused path's RNG stream exactly (_fused_step splits
        # key -> (ko, ke); _optimize_multistart splits ko -> (kn, ko2))
        ko, ke = jax.random.split(key)
        kn, ko2 = jax.random.split(ko)
        xs = self._make_starts(x0, active, kn)
        keys = jax.random.split(ko2, self.n_starts)
        m = jnp.zeros_like(xs)
        v = jnp.zeros_like(xs)
        best_x = xs
        best_e = jnp.full((self.n_starts,), jnp.inf, x0.dtype)
        # iters+1 body calls: the extra one evaluates (and best-tracks)
        # the post-final-update iterate, matching _adam_single's trailing
        # e_final probe at fold_in(key, iters); its x update is discarded.
        for i in range(self.iters + 1):
            xs, m, v, best_x, best_e = self._host_body_jit(
                psi0, *old_arrs, active, xs, m, v, best_x, best_e, keys,
                jnp.asarray(i, jnp.int32))
        best_e = np.asarray(best_e)
        x_opt = np.asarray(best_x)[int(np.argmin(best_e))]
        x_new = np.where(np.asarray(map_idx) >= 0,
                         x_opt[np.maximum(np.asarray(map_idx), 0)],
                         0.0).astype(x_opt.dtype)
        e_new = float(self._energy_jit(psi0, *new_arrs,
                                       jnp.asarray(x_new), ke))
        return x_opt, e_new, self.iters * self.n_starts

    # -- pallas fast path: whole multi-env multi-start optimization with
    # O(iters) kernel launches instead of O(iters * gates) -----------------

    def _sample_noise_kinds(self, kind, key):
        return sample_depolarizing_kinds(kind, key, self.noise_p1,
                                         self.noise_p2)

    @staticmethod
    def _extend_arrs(arrs, kt, kc):
        return extend_tape_arrays(arrs, kt, kc)

    def _fused_step_pallas(self, psi0_ri, old_arrs, x0, active, new_arrs,
                           map_idx, key):
        """(E, ...) batched fused step through the Pallas kernels.

        psi0_ri: (re, im) each (D,); old/new_arrs: tuples of (E, G) int32;
        x0/active/map_idx: (E, R); key: PRNGKey.
        Returns (x_opt (E, R), e_new (E,)).

        Noise modes ride the same kernels: depolarizing trajectories are
        *tape extensions* (sampled Pauli error gates in reserved noise
        slots, re-drawn every Adam iteration — one realization shared by
        the S starts of a replica, fresh ones across iterations/replicas);
        shot mode adds the Gaussian per-term term to the exact energy.
        """
        from tensorrl_qas_tpu.ops.pallas_apply import apply_tape_pallas_ri

        re0, im0 = psi0_ri
        e_env = x0.shape[0]
        s = self.n_starts
        d = re0.shape[-1]
        re_b = jnp.broadcast_to(re0, (e_env, s, d))
        im_b = jnp.broadcast_to(im0, (e_env, s, d))
        re_1 = jnp.broadcast_to(re0, (e_env, 1, d))
        im_1 = jnp.broadcast_to(im0, (e_env, 1, d))
        kn, ko, knz = jax.random.split(key, 3)

        starts = self._make_starts(x0, active, kn, lead_shape=(e_env,))

        def energy_once(xb, arrs, re_in, im_in, k):
            if self.noise_mode == "depolarizing":
                kt, kc = self._sample_noise_kinds(arrs[0], k)
                arrs = self._extend_arrs(arrs, kt, kc)
            ore, oim = apply_tape_pallas_ri(re_in, im_in, *arrs, xb,
                                            self.pallas_interpret)
            psi = (ore + 1j * oim).astype(self.dtype)
            ev = pauli_expectation(psi.reshape(-1, d), *self.pauli)
            return ev.reshape(xb.shape[0], xb.shape[1])

        def energy_sum(xb, arrs, re_in, im_in, k):
            if self.noise_mode == "depolarizing" and self.n_traj > 1:
                ev = jnp.mean(jnp.stack(
                    [energy_once(xb, arrs, re_in, im_in,
                                 jax.random.fold_in(k, t))
                     for t in range(self.n_traj)]), axis=0)
            else:
                ev = energy_once(xb, arrs, re_in, im_in, k)
            if self.noise_mode == "shot" and self.n_shots:
                w = jnp.asarray(self.pauli[0])
                eps_n = jax.random.normal(k, ev.shape + (w.shape[0],),
                                          dtype=w.dtype)
                ev = ev + (eps_n @ w) * (self.n_shots ** -0.5)
            return jnp.sum(ev), ev

        val_and_grad = jax.value_and_grad(energy_sum, has_aux=True)
        b1, b2, eps = 0.9, 0.999, 1e-8
        act_b = active[:, None, :]

        def step(carry, i):
            x, m, v, best_x, best_e = carry
            (_, ev), g = val_and_grad(x, old_arrs, re_b, im_b,
                                      jax.random.fold_in(knz, i))
            g = g * act_b
            better = ev < best_e
            best_x = jnp.where(better[..., None], x, best_x)
            best_e = jnp.where(better, ev, best_e)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            t = i.astype(x.dtype) + 1.0
            mhat = m / (1 - b1 ** t)
            vhat = v / (1 - b2 ** t)
            x = x - self.lr * mhat / (jnp.sqrt(vhat) + eps)
            return (x, m, v, best_x, best_e), None

        init = (starts, jnp.zeros_like(starts), jnp.zeros_like(starts),
                starts, jnp.full((e_env, s), jnp.inf, x0.dtype))
        (x, _, _, best_x, best_e), _ = jax.lax.scan(
            step, init, jnp.arange(self.iters))
        (_, ev), _ = val_and_grad(x, old_arrs, re_b, im_b,
                                  jax.random.fold_in(knz, self.iters))
        better = ev < best_e
        best_x = jnp.where(better[..., None], x, best_x)
        best_e = jnp.where(better, ev, best_e)

        sel = jnp.argmin(best_e, axis=1)                        # (E,)
        x_opt = jnp.take_along_axis(best_x, sel[:, None, None],
                                    axis=1)[:, 0, :]            # (E, R)
        x_new = jnp.where(map_idx >= 0,
                          jnp.take_along_axis(
                              x_opt, jnp.maximum(map_idx, 0), axis=1), 0.0)
        _, e_new = energy_sum(x_new[:, None, :], new_arrs, re_1, im_1,
                              jax.random.fold_in(knz, self.iters + 1))
        return x_opt, e_new[:, 0]

    def fused_step_batch(self, psi0, old_arrs_b, x0_b, n_active_b,
                         new_arrs_b, map_idx_b, keys):
        """Batched fused step over B env replicas in ONE device call.

        old_arrs_b/new_arrs_b: tuples of (B, G) arrays; x0_b (B, R);
        n_active_b (B,); map_idx_b (B, R); keys (B, 2).
        Returns (x_opt (B, R) numpy, e_new (B,) numpy, nfev).
        """
        rdtype = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        x0_b = jnp.asarray(np.asarray(x0_b, dtype=rdtype))
        r = x0_b.shape[1]
        active = (jnp.arange(r)[None, :]
                  < jnp.asarray(n_active_b)[:, None]).astype(rdtype)
        # mega engines serve noiseless runs and single-trajectory
        # depolarizing runs (v1 AND v2 both support in-kernel TPU-PRNG
        # per-iteration re-sampling at full reference semantics, and the
        # quenched per-step tape extension); everything else composes
        mega_ok = self.noise_mode == "none" or (
            self.noise_mode == "depolarizing" and self.n_traj == 1)
        engine = (self._pick_engine()
                  if self.use_pallas and mega_ok else "off")
        # per-env psi0 (block-coordinate trainable mode) is wired through
        # the v2 kernel and the vmapped XLA path; v1 keeps its shared
        # broadcast plane, so batched psi0 drops it to the XLA path
        psi0_batched = np.asarray(psi0[0]).ndim == 2
        if psi0_batched and engine == "v1":
            engine = "off"
        kernel_noise, kernel_seeds = None, None
        if engine in ("v1", "v2") and self.noise_mode == "depolarizing":
            kq = jax.random.fold_in(keys[0] if keys.ndim > 1 else keys, 7)
            if self.noise_resample == "iter":
                kernel_noise = (float(self.noise_p1), float(self.noise_p2))
                kernel_seeds = jax.random.randint(
                    kq, (len(n_active_b), 2), 0, 2**31 - 1, dtype=jnp.int32)
            else:
                # quench one trajectory per env step into the tapes; the
                # extended arrays ride the normal mega path (X/Y/Z are in
                # the kernel gate set, slot = -1 keeps them out of the
                # gradient)
                k_old, k_new = jax.random.split(kq)
                old_arrs_b = tuple(map(jnp.asarray, old_arrs_b))
                new_arrs_b = tuple(map(jnp.asarray, new_arrs_b))
                old_arrs_b = self._extend_arrs(
                    old_arrs_b,
                    *self._sample_noise_kinds(old_arrs_b[0], k_old))
                new_arrs_b = self._extend_arrs(
                    new_arrs_b,
                    *self._sample_noise_kinds(new_arrs_b[0], k_new))
        if engine in ("v1", "v2"):
            # single-launch path: the whole multi-start Adam runs inside
            # one Pallas kernel (ops/pallas_opt.py or pallas_opt2d.py)
            kn = keys[0] if keys.ndim > 1 else keys
            starts = self._make_starts(x0_b, active, kn,
                                       lead_shape=x0_b.shape[:1])
            re0, im0 = psi0
            if engine == "v1":
                from tensorrl_qas_tpu.ops.pallas_opt import \
                    fused_adam_step_pallas

                re0p, im0p = jnp.asarray(re0), jnp.asarray(im0)
                dpad = self._hre_t.shape[-1]
                if re0p.shape[-1] < dpad:   # n <= 6: lane-minimum padding
                    pad = dpad - re0p.shape[-1]
                    re0p = jnp.pad(re0p, (0, pad))
                    im0p = jnp.pad(im0p, (0, pad))
                x_opt, e_new = fused_adam_step_pallas(
                    tuple(map(jnp.asarray, old_arrs_b)),
                    tuple(map(jnp.asarray, new_arrs_b)),
                    jnp.asarray(map_idx_b), re0p[None],
                    im0p[None], self._hre_t, self._him_t,
                    starts, active[:, None, :], iters=self.iters,
                    lr=self.lr, interpret=self.pallas_interpret,
                    noise=kernel_noise, seeds=kernel_seeds)
            else:
                from tensorrl_qas_tpu.ops.pallas_opt2d import (
                    MAX_SR_ROWS,
                    fused_adam_step_pallas2d,
                )

                wre, wim, flips = self._w2d
                r_rows = wre.shape[1]
                # per-env psi0 (block-coordinate trainable mode): (B, D)
                # planes reshape to (B, R, C) per-env blocks; shared psi0
                # keeps the broadcast (R, C) plane
                if np.asarray(re0).ndim == 2:
                    b_env = np.asarray(re0).shape[0]
                    re0_k = jnp.asarray(re0).reshape(b_env, r_rows, -1)
                    im0_k = jnp.asarray(im0).reshape(b_env, r_rows, -1)
                else:
                    re0_k = jnp.asarray(re0).reshape(r_rows, -1)
                    im0_k = jnp.asarray(im0).reshape(r_rows, -1)

                def call2d(starts_chunk, seeds_chunk):
                    return fused_adam_step_pallas2d(
                        tuple(map(jnp.asarray, old_arrs_b)),
                        tuple(map(jnp.asarray, new_arrs_b)),
                        jnp.asarray(map_idx_b),
                        re0_k, im0_k,
                        wre, wim, flips, starts_chunk, active[:, None, :],
                        iters=self.iters, lr=self.lr,
                        interpret=self.pallas_interpret,
                        noise=kernel_noise, seeds=seeds_chunk,
                        stream_w=getattr(self, "_w2d_stream", False))

                s_cap = max(1, MAX_SR_ROWS // r_rows)
                if starts.shape[1] <= s_cap:
                    x_opt, e_new = call2d(starts, kernel_seeds)
                else:
                    # start-chunking past the per-call S*R wall: each
                    # chunk runs its full multi-start Adam; the winner is
                    # the chunk with the lower post-action energy (with
                    # one chunk this is exactly the unchunked result).
                    # Pad S up to a multiple of s_cap by repeating the
                    # first start so all chunks share one executable.
                    s = starts.shape[1]
                    n_chunks = -(-s // s_cap)
                    pad = n_chunks * s_cap - s
                    if pad:
                        starts = jnp.concatenate(
                            [starts, starts[:, :pad]], axis=1)
                    x_opt = e_new = None
                    for ci in range(n_chunks):
                        sc = starts[:, ci * s_cap:(ci + 1) * s_cap]
                        # same per-env noise seeds for every chunk: chunks
                        # differ only in their start slices, so cross-chunk
                        # winner selection compares energies under one
                        # noise realization — exactly the unchunked
                        # per-env-stream semantics (ADVICE round 4)
                        x_c, e_c = call2d(sc, kernel_seeds)
                        if x_opt is None:
                            x_opt, e_new = x_c, e_c
                        else:
                            better = e_c < e_new
                            x_opt = jnp.where(better[:, None], x_c, x_opt)
                            e_new = jnp.where(better, e_c, e_new)
        elif self.use_pallas and (self.pallas_interpret
                                  or 128 <= psi0[0].shape[-1] <= 65536):
            # composed kernels need the 128-lane minimum on real hardware
            # (pltpu.roll rejects unaligned shapes); interpret mode (CPU
            # tests) has no such floor.  The upper bound is the composed
            # path's hardware-validated ceiling: the v3+ band (n = 17/18)
            # is only validated through the v2 mega-kernel, so
            # configurations it rejects (shot noise, n_traj > 1, starts
            # above the VMEM budget) drop to the XLA path instead of an
            # unvalidated full-state composed launch
            if psi0_batched:
                x_opt, e_new = self._fused_batch_jit_ppsi(
                    psi0, tuple(map(jnp.asarray, old_arrs_b)), x0_b, active,
                    tuple(map(jnp.asarray, new_arrs_b)),
                    jnp.asarray(map_idx_b), keys)
            else:
                x_opt, e_new = self._fused_pallas_jit(
                    psi0, tuple(map(jnp.asarray, old_arrs_b)), x0_b, active,
                    tuple(map(jnp.asarray, new_arrs_b)),
                    jnp.asarray(map_idx_b), keys[0])
        else:
            batch_jit = (self._fused_batch_jit_ppsi if psi0_batched
                         else self._fused_batch_jit)
            x_opt, e_new = batch_jit(
                psi0, tuple(map(jnp.asarray, old_arrs_b)), x0_b, active,
                tuple(map(jnp.asarray, new_arrs_b)), jnp.asarray(map_idx_b),
                keys)
        return (np.asarray(x_opt), np.asarray(e_new),
                self.iters * self.n_starts)

    # -- public entry -------------------------------------------------------------

    def optimize(self, psi0, tape_arrays, x0, n_active: int, key):
        """Optimize the angle vector.

        Args:
          psi0: (2^n,) initial statevector (host or device).
          tape_arrays: (kind, tq, cq, slot) padded tape arrays.
          x0: (R,) warm-start angle vector (padded).
          n_active: number of live rotation slots (<= R); padding stays 0.
          key: PRNG key (adam restarts + noise).

        Returns (x_opt (R,) numpy, energy float, nfev int).
        """
        kind, tq, cq, slot = tape_arrays
        rdtype = jnp.float32 if self.dtype == jnp.complex64 else jnp.float64
        x0 = jnp.asarray(np.asarray(x0, dtype=rdtype))
        active = (jnp.arange(x0.shape[0]) < n_active).astype(rdtype)

        if self.method == "adam":
            x, e = self._opt_jit(psi0, kind, tq, cq, slot, x0, active, key)
            nfev = self.iters * self.n_starts
            return np.asarray(x), float(e), nfev

        if self.method == "cobyla":
            import scipy.optimize

            x0_np = np.asarray(x0)
            xa = x0_np.copy()
            csim = self._csim_engine() if self.noise_mode == "none" else None
            if csim is not None:
                psi0_np = np.asarray(self._as_complex(psi0)).astype(
                    np.complex128)
                kind_np, tq_np = np.asarray(kind), np.asarray(tq)
                cq_np, slot_np = np.asarray(cq), np.asarray(slot)

                def cost(xs):
                    xa[:n_active] = xs
                    return csim.tape_energy(psi0_np, kind_np, tq_np, cq_np,
                                            slot_np, xa)
            else:
                def cost(xs):
                    self._host_key, k = jax.random.split(self._host_key)
                    xa[:n_active] = xs
                    return float(self._energy_jit(psi0, kind, tq, cq, slot,
                                                  jnp.asarray(xa), k))

            if n_active == 0:
                e = self.energy(psi0, tape_arrays, x0)
                return x0_np, e, 0
            res = scipy.optimize.minimize(cost, x0=x0_np[:n_active],
                                          method="COBYLA",
                                          options={"maxiter": self.iters})
            out = x0_np.copy()
            out[:n_active] = res["x"]
            e = self.energy(psi0, tape_arrays, out)
            return out, e, int(res["nfev"])

        raise ValueError(f"unknown method {self.method!r}")
