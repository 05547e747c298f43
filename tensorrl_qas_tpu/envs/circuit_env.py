"""The RL circuit-construction environment.

One parameterized implementation replacing the reference's five ~600-line
env clones (``environments/environment_qulacs*.py``); the axes

- ``tn_placement``: ``'fixed'`` (warm-start circuit compiled once into the
  simulator's initial statevector, ``environment_qulacs_TN_notin_agent.py:158``)
  vs ``'in_state'`` (warm-start gates embedded in the RL state tensor and
  re-optimized each step, ``environment_qulacs.py:285-328``),
- ``zero_param_init``: StructureRL (keep structure, zero the angles,
  ``environment_qulacs.py:299-302``),
- ``noise_mode``: none / depolarizing-trajectory / shot,
- ``topology``: all-to-all vs heavy-hex restricted action space,
- ``gate_set``: ``'cnot'`` vs ``'su4'`` (the reference's unwired RXX/RYY/
  RZZ action set, ``environments/VQAs/VQE_qulacs_su4.py``),
- ``mesh_shape``: amplitude-sharded multi-chip simulation (scale-out past
  the reference's 20-qubit single-machine ceiling),

are flags, not files.

Step semantics are reproduced faithfully, including a subtle ordering of
the reference (``environment_qulacs.py:169-267``): the per-step angle
optimizer runs on the circuit *before* the new gate is appended
(``scipy_optim`` reads ``self.state`` at L419, which is assigned the new
tensor only at L226), so a freshly placed rotation enters this step's
energy evaluation at angle 0 and only gets optimized from the next step on.

The hot path — per-step angle optimization + energy — runs entirely on
device as compiled XLA (see optim/angle_opt.py); the episode bookkeeping
(gate placement, masks, curricula) is cheap host logic.
"""

from __future__ import annotations

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrl_qas_tpu.circuits.actions import action_dictionary
from tensorrl_qas_tpu.circuits.qasm import load_circuit_tape
from tensorrl_qas_tpu.circuits.tensor_ir import (
    StateTensor,
    SU4StateTensor,
    embed_tape,
)
from tensorrl_qas_tpu.envs.curricula import make_curriculum
from tensorrl_qas_tpu.envs.illegal import IllegalActionTracker
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.problems.hamiltonians import (
    load_problem,
    resolve_warmstart_qasm,
)
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state


@dataclasses.dataclass
class EnvConfig:
    """Typed environment configuration (superset of the reference [env]/
    [problem]/[non_local_opt] sections plus TPU-specific knobs)."""

    num_qubits: int
    num_layers: int
    ham_type: str
    geometry: str = ""
    mapping: str = "jordan_wigner"
    tn_placement: str = "fixed"           # 'fixed' | 'in_state'
    tn_init: int = 1
    tn_bond: int = 2
    zero_param_init: int = 0
    rand_halt: int = 0
    accept_err: float = 1.6e-3
    fn_type: str = "incremental_with_fixed_ends"
    fake_min_energy: float | None = None
    cnot_rwd_weight: float = 1.0
    curriculum_type: str = "VanillaCurriculum"
    curriculum_conf: dict = dataclasses.field(default_factory=dict)
    state_with_angles: int = 0
    noise_mode: str = "none"              # 'none' | 'depolarizing' | 'shot'
    noise_values: tuple = ()
    n_shots: int = 0
    n_traj: int = 1                       # trajectories per noisy energy
    noise_resample: str = "iter"          # 'iter' (reference parity) |
    #                                       'step' (quenched; mega-kernel)
    err_mitig: int = 0
    topology: str = "all_to_all"
    gate_set: str = "cnot"                # 'cnot' | 'su4' (RXX/RYY/RZZ)
    # block-coordinate trainable mode (beyond the reference): with
    # tn_placement='in_state', re-optimize the embedded TN block's angles
    # only every K-th step; in between, the prefix is frozen into a cached
    # statevector and the device call carries only the RL correction tape
    # (prefix gates masked to padding — same compiled kernel, the padding
    # class skips their work).  0/1 = off (reference joint optimization
    # every step).  Noiseless only: gate noise must fire on prefix gates.
    block_coord_k: int = 0
    # per-step angle optimization
    optim_method: str | None = "scipy_each_step"
    optim_alg: str = "adam"               # 'adam' | 'cobyla' (reference: COBYLA)
    global_iters: int = 100
    n_starts: int = 8
    adam_lr: float = 0.1
    restart_scale: float = 0.1
    # numerics
    sim_dtype: str = "auto"               # 'auto' | 'complex64' | 'complex128'
    use_pallas: str = "auto"              # 'auto' | 'on' | 'off'
    # multi-chip: (n_amp, n_dp) mesh for amplitude-sharded simulation
    # (ShardedAngleOptimizer; the scale-out path past single-chip sizes)
    mesh_shape: tuple | None = None
    seed: int = 0

    @classmethod
    def from_conf(cls, conf: dict, tn_placement: str | None = None,
                  noise_mode: str | None = None, seed: int = 0,
                  optim_alg: str | None = None) -> "EnvConfig":
        """Build from a reference-format config dict (see train/config.py)."""
        env = conf["env"]
        prob = conf["problem"]
        agent = conf.get("agent", {})
        nlo = conf.get("non_local_opt", {})
        noise_vals = env.get("noise_values", 0)
        if isinstance(noise_vals, str) and noise_vals != "0":
            vals = tuple(float(x) for x in noise_vals.strip("[]() ").split(","))
        else:
            vals = ()
        if noise_mode is None:
            noise_mode = "depolarizing" if vals else "none"
        alg = optim_alg
        if alg is None:
            ref_alg = str(nlo.get("optim_alg", "adam")).lower()
            # map the reference's COBYLA configs onto the TPU-native default;
            # pass optim_alg='cobyla' explicitly for host-parity runs.
            alg = "adam" if ref_alg in ("cobyla", "adam") else ref_alg
        return cls(
            num_qubits=env["num_qubits"],
            num_layers=env["num_layers"],
            ham_type=prob["ham_type"],
            geometry=prob.get("geometry", ""),
            mapping=prob.get("mapping", "jordan_wigner"),
            tn_placement=tn_placement or env.get("tn_placement", "fixed"),
            tn_init=int(env.get("tn_init", 1)),
            tn_bond=int(env.get("tn_bond", 0)),
            zero_param_init=int(env.get("zero_param_init", 0)),
            rand_halt=int(env.get("rand_halt", 0)),
            accept_err=float(env.get("accept_err", 1.6e-3)),
            fn_type=env.get("fn_type", "incremental_with_fixed_ends"),
            fake_min_energy=env.get("fake_min_energy"),
            cnot_rwd_weight=float(env.get("cnot_rwd_weight", 1.0)),
            curriculum_type=env.get("curriculum_type", "VanillaCurriculum"),
            curriculum_conf=dict(env),
            state_with_angles=int(agent.get("angles", 0)),
            noise_mode=noise_mode,
            noise_values=vals,
            n_shots=int(env.get("n_shots", 0)),
            noise_resample=env.get("noise_resample", "iter"),
            err_mitig=int(env.get("err_mitig", 0)),
            topology=env.get("topology", "all_to_all"),
            gate_set=env.get("gate_set", "cnot"),
            block_coord_k=int(env.get("block_coord_k", 0)),
            optim_method=nlo.get("method", None),
            optim_alg=alg,
            global_iters=int(nlo.get("global_iters", 100)),
            n_starts=int(env.get("n_starts", 8)),
            adam_lr=float(env.get("adam_lr", 0.1)),
            restart_scale=float(env.get("restart_scale", 0.1)),
            seed=seed,
        )


# warm-start statevectors keyed by (qasm path, dtype) — see the memo
# note inside CircuitEnv.__init__
_TN_PSI_CACHE: dict = {}


class CircuitEnv:
    """Gym-style episodic environment: one gate per step, energy reward."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        n = cfg.num_qubits
        self.num_qubits = n
        self.num_layers = cfg.num_layers

        if cfg.sim_dtype == "auto":
            from tensorrl_qas_tpu.configx import default_complex_dtype
            self.dtype = default_complex_dtype()
        else:
            self.dtype = jnp.dtype(cfg.sim_dtype)

        self.problem = load_problem(cfg.ham_type, n, cfg.geometry, cfg.mapping)
        self.min_eig = (cfg.fake_min_energy if cfg.fake_min_energy is not None
                        else self.problem.min_eig)
        self.max_eig = self.problem.max_eig

        # --- warm-start circuit -------------------------------------------
        self.tn_tape = None
        self.tn_depth = 0
        self._tn_psi = None
        if cfg.tn_init and cfg.tn_bond:
            # su4 episodes want the RXX/RYY/RZZ-basis warm start
            # (reference dmrg_to_qc.py's SU4 flag, whose output no
            # upstream env ever consumed); the basis/fallback rule lives
            # in resolve_warmstart_qasm, shared with the analysis tools.
            qasm_path = resolve_warmstart_qasm(
                cfg.ham_type, n, cfg.tn_bond, cfg.geometry, cfg.mapping,
                gate_set=cfg.gate_set, tn_placement=cfg.tn_placement)
            self.tn_tape = load_circuit_tape(qasm_path)
            self.tn_depth = self.tn_tape.depth()
            if cfg.tn_placement == "fixed":
                # compile once to a statevector; episodes start from it
                # (reference: Statevector(tenor_circ).data,
                #  environment_qulacs_TN_notin_agent.py:158).  Fetched as
                # (re, im) f32 pairs and kept as HOST numpy: complex device
                # arrays cannot cross jit boundaries on some TPU transports.
                rdt = (np.float32 if self.dtype == jnp.complex64
                       else np.float64)

                # Memoized process-wide: a 64-replica VectorCircuitEnv
                # builds 64 envs over the SAME warm-start file, and each
                # jax.jit(_tn) wrapper would otherwise recompile the
                # whole tape remotely (the axon backend does not serve
                # the persistent compilation cache) — ~30-60 s x B of
                # pure compile wait at 10q+.
                memo_key = (str(qasm_path), str(self.dtype))
                cached = _TN_PSI_CACHE.get(memo_key)
                if cached is not None:
                    self._tn_psi = cached
                else:
                    def _tn(x):
                        psi = apply_tape(
                            zero_state(n, self.dtype),
                            *map(jnp.asarray, self.tn_tape.arrays()), x)
                        return jnp.real(psi), jnp.imag(psi)

                    re, im = jax.jit(_tn)(self.tn_tape.x0().astype(rdt))
                    self._tn_psi = (np.asarray(re) + 1j * np.asarray(im)
                                    ).astype(np.dtype(self.dtype))
                    _TN_PSI_CACHE[memo_key] = self._tn_psi
        self.num_layers_termination = cfg.num_layers - self.tn_depth

        # --- action space ---------------------------------------------------
        self.action_dict = action_dictionary(n, cfg.topology,
                                             gate_set=cfg.gate_set)
        if cfg.gate_set == "su4":
            self.action_size = 3 * n * n
            self.state_size = cfg.num_layers * n * (6 * n + 6)
        elif cfg.topology == "all_to_all":
            self.action_size = n * (n + 2)
            self.state_size = cfg.num_layers * n * (n + 6)
        else:
            self.action_size = len(action_dictionary(n, cfg.topology,
                                                     reverted=True))
            self.state_size = cfg.num_layers * n * (n + 6)

        # --- tape capacities (static shapes: one XLA compile per env) -------
        embedded_rots = (self.tn_tape.n_rots
                         if (self.tn_tape and cfg.tn_placement == "in_state")
                         else 0)
        embedded_gates = (self.tn_tape.n_gates
                          if (self.tn_tape and cfg.tn_placement == "in_state")
                          else 0)
        max_steps = self.num_layers_termination + 1
        self.tape_capacity = embedded_gates + max_steps
        self.rot_capacity = (self.tape_capacity if cfg.gate_set == "su4"
                             else embedded_rots + max_steps)

        noise_p1, noise_p2 = 0.01, 0.05  # reference VQE_qulacs_noise.py:32,45
        if len(cfg.noise_values) >= 2:
            noise_p1, noise_p2 = cfg.noise_values[0], cfg.noise_values[1]
        # Pallas fused kernels: O(iters) launches instead of
        # O(iters x gates); TPU-only (CPU runs the XLA path), n <= 10
        if cfg.gate_set == "su4":
            # RXX/RYY/RZZ ride the COMPOSED Pallas kernel (double
            # XOR-partner rolls, ops/pallas_apply.py; the single-launch
            # mega-kernels stay 1q+CX — AngleOptimizer._pick_engine
            # forces 'composed' when enable_2q)
            if cfg.use_pallas == "on":
                use_pallas = True
            elif cfg.use_pallas == "off":
                use_pallas = False
            else:
                from tensorrl_qas_tpu.ops.pallas_apply import PALLAS_MAX_DIM
                use_pallas = (jax.default_backend() not in ("cpu",)
                              and (1 << n) <= PALLAS_MAX_DIM)
            if cfg.noise_mode != "none":
                raise NotImplementedError(
                    "su4 gate set is noiseless-only (as in the reference, "
                    "whose su4 noise variants were never wired)")
        elif cfg.use_pallas == "on":
            use_pallas = True
        elif cfg.use_pallas == "off":
            use_pallas = False
        else:
            # v1 mega-kernel covers D <= 1024; the 2D-tiled v2/v3 extends
            # the fast path to D <= 262144 (n <= 18, ops/pallas_opt2d.py —
            # W planes HBM-streamed past n = 12; at n = 16 both 4 and 8
            # starts fit the VMEM budget, but 4 halves the per-env fused
            # step (529 vs 1024 ms — the 16q configs set n_starts = 4;
            # n = 17 needs n_starts <= 8 and n = 18 needs <= 4, enforced
            # by the optimizer's budget arithmetic with a composed-kernel
            # fallback).  Noise modes run in-kernel (v1/v2) or via the
            # composed kernels (shot / n_traj > 1).
            from tensorrl_qas_tpu.ops.pallas_opt2d import MAX_DIM_2D
            use_pallas = (jax.default_backend() not in ("cpu",)
                          and (1 << n) <= MAX_DIM_2D)
        if cfg.mesh_shape:
            # amplitude-sharded scale-out path over an (amp, dp) mesh;
            # depolarizing trajectories ride it as tape extensions
            # (optim/sharded_opt.py), shot noise stays single-chip
            if cfg.noise_mode not in ("none", "depolarizing"):
                raise NotImplementedError(
                    "sharded path supports noise none/depolarizing "
                    "(shot noise is single-chip only)")
            if cfg.noise_mode == "depolarizing" and cfg.n_traj != 1:
                raise NotImplementedError(
                    "sharded depolarizing runs single-trajectory "
                    "(n_traj=1), like the mega-kernel path")
            from tensorrl_qas_tpu.optim.sharded_opt import \
                ShardedAngleOptimizer
            from tensorrl_qas_tpu.parallel.mesh import make_mesh

            n_amp, n_dp = cfg.mesh_shape
            self.mesh = make_mesh(n_amp=n_amp, n_dp=n_dp)
            self.optimizer = ShardedAngleOptimizer(
                self.mesh, n, self.problem.pauli, iters=cfg.global_iters,
                n_starts=cfg.n_starts, lr=cfg.adam_lr,
                restart_scale=cfg.restart_scale, dtype=self.dtype,
                noise_mode=cfg.noise_mode, noise_p1=noise_p1,
                noise_p2=noise_p2, noise_resample=cfg.noise_resample,
                enable_2q=cfg.gate_set == "su4")
        else:
            self.mesh = None
            self.optimizer = AngleOptimizer(
                self.problem.pauli.device_arrays(self.dtype),
                method=cfg.optim_alg,
                iters=cfg.global_iters, n_starts=cfg.n_starts,
                lr=cfg.adam_lr, restart_scale=cfg.restart_scale,
                dtype=self.dtype, noise_mode=cfg.noise_mode,
                noise_p1=noise_p1, noise_p2=noise_p2, n_shots=cfg.n_shots,
                n_traj=cfg.n_traj, use_pallas=use_pallas,
                enable_2q=cfg.gate_set == "su4")
            self.optimizer.noise_resample = cfg.noise_resample
            # enable the native host engine for the COBYLA parity path
            self.optimizer._pauli_obj = self.problem.pauli
        self._psi0_pair = None   # cached (re, im): stable identity for
        #                          the sharded optimizer's placement cache
        # block-coordinate trainable mode state (see EnvConfig.block_coord_k)
        if cfg.block_coord_k > 1 and cfg.noise_mode != "none":
            raise ValueError(
                "block_coord_k requires noise_mode='none': depolarizing/"
                "shot noise must fire on the embedded prefix gates, which "
                "the frozen-prefix transform masks out")
        self._bc_frozen = False
        self._bc_n_gates = 0
        self._bc_n_rots = 0
        self._bc_cache = None
        self._bc_apply = None

        self.curriculum_dict = {
            cfg.ham_type: make_curriculum(cfg.curriculum_type,
                                          cfg.curriculum_conf,
                                          target_energy=self.min_eig)
        }
        self.done_threshold = cfg.accept_err
        self.tracker = IllegalActionTracker(n, self.action_dict)

        self._np_rng = np.random.default_rng(cfg.seed)
        self._key = jax.random.PRNGKey(cfg.seed)

        # per-step observables read by the driver
        self.energy = 0.0
        self.error = 0.0
        self.error_noiseless = 0.0
        self.prev_energy = None
        self.nfev = 0
        self.opt_ang_save = 0
        self.rwd = 0.0
        self.save_circ = 0
        self.current_number_of_cnots = 0
        self.step_counter = -1
        self.current_bond_distance = 0

    # -- helpers --------------------------------------------------------------

    def _psi0(self):
        """Initial statevector as an (re, im) real pair — complex arrays
        cannot cross jit boundaries on some TPU transports.  Cached: the
        warm-start state is fixed per env, and the sharded optimizer keys
        its device placement on the pair's identity."""
        if self._psi0_pair is None:
            rdt = np.float32 if self.dtype == jnp.complex64 else np.float64
            psi = (self._tn_psi if self._tn_psi is not None
                   else zero_state(self.num_qubits, self.dtype))
            self._psi0_pair = (
                np.ascontiguousarray(np.real(psi), dtype=rdt),
                np.ascontiguousarray(np.imag(psi), dtype=rdt))
        return self._psi0_pair

    # -- block-coordinate trainable mode (EnvConfig.block_coord_k) ---------

    def _bc_active(self) -> bool:
        return (self.cfg.block_coord_k > 1
                and self.cfg.tn_placement == "in_state"
                and self.tn_tape is not None and self.layer_offset > 0)

    def _bc_mask_prefix(self, arrs):
        kind, tq, cq, slot = arrs
        kind = np.asarray(kind).copy()
        kind[: self._bc_n_gates] = 0          # GateKind.NONE
        return (kind, tq, cq, slot)

    def step_psi0(self):
        """psi0 for THIS step's device call: the warm-start state (fixed
        mode / joint steps) or the cached frozen-prefix state (frozen
        block-coordinate steps)."""
        if not self._bc_frozen:
            return self._psi0()
        if self._bc_cache is None:
            self._bc_cache = self._bc_prefix_psi()
        return self._bc_cache

    def _bc_prefix_psi(self):
        """Apply the embedded prefix (current angles) to |0...0> once; the
        result replaces psi0 on frozen steps.  Refreshed whenever a joint
        step may have moved the prefix angles."""
        from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state

        tape = self._tape(self.state)
        kind = np.asarray(tape.kind).copy()
        kind[self._bc_n_gates:] = 0           # embedded prefix only
        rdt = np.float32 if self.dtype == jnp.complex64 else np.float64
        if self._bc_apply is None:
            engine = "slice" if self.num_qubits >= 13 else "gather"
            enable_2q = self.cfg.gate_set == "su4"

            @jax.jit
            def _apply(kind, tq, cq, slot, x):
                psi = apply_tape(
                    jnp.asarray(zero_state(self.num_qubits, self.dtype)),
                    kind, tq, cq, slot, x, enable_2q=enable_2q,
                    engine=engine)
                return jnp.real(psi), jnp.imag(psi)

            self._bc_apply = _apply
        re, im = self._bc_apply(jnp.asarray(kind), jnp.asarray(tape.tq),
                                jnp.asarray(tape.cq),
                                jnp.asarray(tape.angle_slot),
                                jnp.asarray(tape.x0().astype(rdt)))
        return (np.ascontiguousarray(np.asarray(re), dtype=rdt),
                np.ascontiguousarray(np.asarray(im), dtype=rdt))

    def _tape(self, state: StateTensor):
        return state.to_tape(self.tape_capacity, self.rot_capacity)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _energy_of_state(self, state: StateTensor) -> float:
        tape = self._tape(state)
        return self.optimizer.energy(self._psi0(),
                                     tuple(map(jnp.asarray, tape.arrays())),
                                     tape.x0(), key=self._next_key())

    def _observation(self, state: StateTensor) -> np.ndarray:
        return state.observation(bool(self.cfg.state_with_angles))

    def _angle_map(self, old_state: StateTensor,
                   new_state: StateTensor) -> np.ndarray:
        """Host-precomputed mapping from old-tape angle slots to new-tape
        slots (the new gate, if a rotation, maps from -1 -> angle 0).
        Fixed length = rot_capacity so the fused jit never recompiles."""
        old_pos = {pos: i for i, pos in
                   enumerate(zip(*old_state.rot_positions()))}
        new_pos = list(zip(*new_state.rot_positions()))
        out = np.full(self.rot_capacity, -1, dtype=np.int32)
        for i, pos in enumerate(new_pos):
            out[i] = old_pos.get(pos, -1)
        return out

    # -- API --------------------------------------------------------------------

    def reset(self) -> np.ndarray:
        cfg = self.cfg
        state_cls = SU4StateTensor if cfg.gate_set == "su4" else StateTensor
        self.state = state_cls(cfg.num_layers, cfg.num_qubits)
        self.layer_offset = 0
        if self.tn_tape is not None and cfg.tn_placement == "in_state":
            self.layer_offset = embed_tape(
                self.state, self.tn_tape,
                zero_params=bool(cfg.zero_param_init))

        self._bc_frozen = False
        self._bc_cache = None
        if self._bc_active():
            # the freshly-reset state holds exactly the embedded block, and
            # to_tape is layer-major, so the block is a strict tape prefix
            # with rotation slots [0, n_rots_e)
            ptape = self._tape(self.state)
            self._bc_n_gates = ptape.n_gates
            self._bc_n_rots = ptape.n_rots

        if cfg.rand_halt:
            # episode-length statistics matched to the reference's
            # clip(NegBinom(70, 0.573), 25, 70) draw
            # (environment_qulacs.py:330-332)
            self.halting_step = int(np.clip(
                self._np_rng.negative_binomial(70, 0.573), 25, 70))

        self.current_number_of_cnots = 0
        self.current_action = [self.num_qubits] * 4
        self.tracker.reset()
        self.step_counter = -1
        self.moments = [0] * self.num_qubits
        self.current_prob = cfg.ham_type
        self.curriculum = copy.deepcopy(self.curriculum_dict[self.current_prob])
        self.done_threshold = copy.deepcopy(
            self.curriculum.get_current_threshold())
        self.prev_energy = self._energy_of_state(self.state)
        return self._observation(self.state)

    def illegal_action_new(self) -> list[int]:
        """Mask query; mirrors the reference's calling convention of
        re-observing ``current_action`` at the top of each driver iteration."""
        return self.tracker.observe(self.current_action)

    # The step is split into a host phase (gate placement, masks, tape
    # construction) and a device phase (fused optimize+energy) so that a
    # vectorized wrapper can batch the device phase of many env replicas
    # into one XLA call (envs/vector_env.py).

    def step_begin(self, action):
        """Host phase: mutate episode bookkeeping, return the device-call
        payload (old/new tape arrays, warm start, angle remap)."""
        n = self.num_qubits
        old_state = self.state
        next_state = self.state.copy()
        self.step_counter += 1

        ctrl, offset, rot_qubit, rot_axis = action
        targ = (ctrl + offset) % n

        if rot_qubit < n:
            gate_layer = self.moments[rot_qubit]
        elif ctrl < n:
            gate_layer = max(self.moments[ctrl], self.moments[targ])

        if ctrl < n:
            if self.cfg.gate_set == "su4":
                # 2q Pauli rotation: rot_axis 1/2/3 = XX/YY/ZZ
                next_state.place_two_rotation(self.layer_offset + gate_layer,
                                              rot_axis - 1, ctrl, targ, 0.0)
            else:
                next_state.place_cnot(self.layer_offset + gate_layer, ctrl,
                                      targ)
            m = max(self.moments[ctrl], self.moments[targ]) + 1
            self.moments[ctrl] = m
            self.moments[targ] = m
            self.current_number_of_cnots += 1
        elif rot_qubit < n:
            next_state.place_rotation(self.layer_offset + gate_layer,
                                      rot_axis - 1, rot_qubit, 0.0)
            self.moments[rot_qubit] += 1

        self.current_action = list(action)
        self.tracker.observe(self.current_action)

        old_tape = self._tape(old_state)
        new_tape = self._tape(next_state)
        map_idx = self._angle_map(old_state, next_state)
        self._pending = (old_state, next_state, old_tape)
        old_arrs, new_arrs = old_tape.arrays(), new_tape.arrays()
        self._bc_frozen = (self._bc_active()
                           and self.step_counter % self.cfg.block_coord_k
                           != 0)
        if self._bc_frozen:
            # frozen step: mask the embedded prefix to padding (the kernel's
            # padding class skips its work) — the device call then starts
            # from the cached prefix statevector (see step_psi0) and
            # optimizes only the RL correction angles.  Same tape shapes,
            # same compiled kernel.
            old_arrs = self._bc_mask_prefix(old_arrs)
            new_arrs = self._bc_mask_prefix(new_arrs)
        return (old_arrs, old_tape.x0(), old_tape.n_rots,
                new_arrs, map_idx)

    def step_finish(self, x_opt, energy, nfev, train_flag: bool = True):
        """Apply device results; compute reward/done/curriculum."""
        cfg = self.cfg
        old_state, next_state, old_tape = self._pending
        self._pending = None
        if x_opt is not None:
            opt_angles = np.asarray(x_opt)[: old_tape.n_rots].copy()
            if self._bc_frozen:
                # frozen step: the masked prefix's angles saw no gradient
                # but multi-start perturbation still moved the returned
                # vector — restore the (untouched) embedded-block angles
                opt_angles[: self._bc_n_rots] = \
                    old_tape.x0()[: self._bc_n_rots]
            elif self._bc_active():
                # joint step moved the prefix angles: drop the cached
                # frozen-prefix state
                self._bc_cache = None
            old_state.set_rot_angles(opt_angles)
            next_state.thetas = old_state.thetas
            self.opt_ang_save = np.asarray(opt_angles)
        self.state = next_state
        energy_noiseless = energy  # noisy modes report the noisy value twice

        self.energy = energy
        if train_flag and energy < self.curriculum.lowest_energy:
            self.curriculum.lowest_energy = float(energy)

        self.error = float(abs(self.min_eig - energy))
        self.error_noiseless = float(abs(self.min_eig - energy_noiseless))
        rwd = self.reward_fn(energy)
        self.prev_energy = float(energy)
        self.rwd = rwd
        self.nfev = nfev
        self.save_circ = 0

        energy_done = int(self.error < self.done_threshold)
        layers_done = self.step_counter == (self.num_layers_termination - 1)
        done = int(energy_done or layers_done)
        if cfg.rand_halt and self.step_counter == self.halting_step:
            done = 1
        if done:
            self.curriculum.update_threshold(energy_done=energy_done)
            self.done_threshold = self.curriculum.get_current_threshold()
            self.curriculum_dict[self.current_prob] = copy.deepcopy(
                self.curriculum)

        return self._observation(self.state), float(rwd), done

    def step(self, action, train_flag: bool = True):
        cfg = self.cfg
        payload = self.step_begin(action)
        old_arrs, x0, n_rots_old, new_arrs, map_idx = payload

        if cfg.optim_method in ("scipy_each_step",) and cfg.optim_alg == "adam":
            # fused fast path: optimize pre-action circuit + post-action
            # energy in ONE device round trip (reference ordering kept —
            # see module docstring)
            x_opt, energy, nfev = self.optimizer.fused_step(
                self.step_psi0(), tuple(map(jnp.asarray, old_arrs)), x0,
                n_rots_old, tuple(map(jnp.asarray, new_arrs)), map_idx,
                self._next_key())
            return self.step_finish(x_opt, energy, nfev, train_flag)

        if cfg.optim_method in ("scipy_each_step",):
            # host COBYLA parity path
            x_opt, _, nfev = self.optimizer.optimize(
                self.step_psi0(), tuple(map(jnp.asarray, old_arrs)), x0,
                n_rots_old, self._next_key())
            # energy of the post-action circuit with remapped angles
            x_new = np.where(map_idx >= 0,
                             np.asarray(x_opt)[np.maximum(map_idx, 0)], 0.0)
            energy = self.optimizer.energy(
                self.step_psi0(), tuple(map(jnp.asarray, new_arrs)), x_new,
                key=self._next_key())
            return self.step_finish(x_opt, energy, nfev, train_flag)

        # no per-step optimization configured: energy only
        x_new = np.where(np.asarray(map_idx) >= 0,
                         np.asarray(x0)[np.maximum(map_idx, 0)], 0.0)
        energy = self.optimizer.energy(
            self._psi0(), tuple(map(jnp.asarray, new_arrs)), x_new,
            key=self._next_key())
        return self.step_finish(None, energy, 0, train_flag)

    def reward_fn(self, energy: float) -> float:
        """Reference ``incremental_with_fixed_ends``
        (``environment_qulacs.py:447-459``): +5 at success, -5 at max depth,
        else the clipped relative improvement."""
        if self.cfg.fn_type != "incremental_with_fixed_ends":
            raise NotImplementedError(
                f"reward fn_type {self.cfg.fn_type!r} not implemented")
        max_depth = self.step_counter == (self.num_layers_termination - 1)
        if self.error < self.done_threshold:
            return 5.0
        if max_depth:
            return -5.0
        denom = abs(self.prev_energy - self.min_eig)
        if denom == 0.0:
            return 0.0
        return float(np.clip((self.prev_energy - energy) / denom, -1.0, 1.0))

    # -- checkpointing ------------------------------------------------------------

    def curriculum_state(self):
        return {k: c.state_dict() for k, c in self.curriculum_dict.items()}

    def load_curriculum_state(self, d):
        for k, s in d.items():
            self.curriculum_dict[k].load_state_dict(s)
