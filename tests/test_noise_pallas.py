"""Noisy fast path: depolarizing trajectories / shot noise through the
composed Pallas kernels (interpret mode on CPU).

The depolarizing path encodes each sampled trajectory as a *tape
extension* — Pauli error gates in reserved noise slots after every real
gate (``optim/angle_opt.py:_extend_arrs``) — so the noiseless kernels
apply it unchanged.  Statistical parity target: the exact Kraus channel
(same oracle as tests/test_noise.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.ops.pallas_apply import apply_tape_pallas_ri
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation

I2 = np.eye(2)
PAULIS = [I2,
          np.array([[0, 1], [1, 0]], dtype=complex),
          np.array([[0, -1j], [1j, 0]], dtype=complex),
          np.array([[1, 0], [0, -1]], dtype=complex)]


def kron_1q(u, q, n):
    ops = [I2] * n
    ops[n - 1 - q] = u
    out = ops[0]
    for o in ops[1:]:
        out = np.kron(out, o)
    return out


def depolarize_1q(rho, q, p, n):
    out = (1 - p) * rho
    for k in range(1, 4):
        m = kron_1q(PAULIS[k], q, n)
        out = out + (p / 3) * (m @ rho @ m.conj().T)
    return out


def depolarize_2q(rho, qa, qb, p, n):
    out = (1 - p) * rho
    for ka in range(4):
        for kb in range(4):
            if ka == 0 and kb == 0:
                continue
            m = kron_1q(PAULIS[ka], qa, n) @ kron_1q(PAULIS[kb], qb, n)
            out = out + (p / 15) * (m @ rho @ m.conj().T)
    return out


def cnot_matrix(ctrl, targ, n):
    dim = 1 << n
    m = np.zeros((dim, dim), dtype=complex)
    for i in range(dim):
        j = i ^ (1 << targ) if (i >> ctrl) & 1 else i
        m[j, i] = 1.0
    return m


def _test_tape(n):
    tape = GateTape(n, 4, 4)
    tape.add(GateKind.RY, target=0, angle=0.7)
    tape.add_cx(0, 1)
    tape.add(GateKind.RX, target=2, angle=-1.1)
    tape.add_cx(1, 2)
    return tape


def _kraus_expectation(tape, ps, p1, p2, n):
    """Exact density-matrix evolution of the test tape + channels."""
    dim = 1 << n
    rho = np.zeros((dim, dim), dtype=complex)
    rho[0, 0] = 1.0
    for g in range(tape.n_gates):
        k, t, c = int(tape.kind[g]), int(tape.tq[g]), int(tape.cq[g])
        if k == int(GateKind.CX):
            u = cnot_matrix(c, t, n)
            rho = u @ rho @ u.conj().T
            rho = depolarize_2q(rho, c, t, p2, n)
        else:
            th = tape.angles[tape.angle_slot[g]]
            axis = {int(GateKind.RX): 1, int(GateKind.RY): 2,
                    int(GateKind.RZ): 3}[k]
            u1 = np.cos(th / 2) * I2 - 1j * np.sin(th / 2) * PAULIS[axis]
            u = kron_1q(u1, t, n)
            rho = u @ rho @ u.conj().T
            rho = depolarize_1q(rho, t, p1, n)
    h = np.asarray(ps.to_dense())
    return float(np.real(np.trace(h @ rho)))


@pytest.mark.slow
def test_extended_tape_matches_xla_apply():
    """Kernel on the extended tape == XLA apply_tape on the same arrays
    (deterministic: one fixed noise draw)."""
    n = 3
    tape = _test_tape(n)
    opt = AngleOptimizer((jnp.zeros(1), jnp.zeros((1, n), jnp.int32),
                          jnp.zeros((1, n), jnp.int32)),
                         noise_mode="depolarizing", noise_p1=0.5,
                         noise_p2=0.5, use_pallas=True)
    arrs = tuple(jnp.asarray(a)[None] for a in tape.arrays())   # (1, G)
    kt, kc = opt._sample_noise_kinds(arrs[0], jax.random.PRNGKey(3))
    ext = opt._extend_arrs(arrs, kt, kc)
    assert int(jnp.sum(ext[0] >= int(GateKind.X))) > 0  # some errors fired

    x = jnp.asarray(tape.x0(), jnp.float32)
    psi0 = zero_state(n, jnp.complex64)
    re, im = apply_tape_pallas_ri(
        jnp.real(psi0).astype(jnp.float32)[None, None],
        jnp.imag(psi0).astype(jnp.float32)[None, None],
        *ext, x[None, None], True)
    psi_pallas = np.asarray(re[0, 0] + 1j * im[0, 0])

    psi_xla = np.asarray(apply_tape(psi0, *(a[0] for a in ext),
                                    x.astype(jnp.float32)))
    np.testing.assert_allclose(psi_pallas, psi_xla, atol=2e-6)


def test_pallas_trajectory_mean_matches_kraus():
    """Mean energy over many kernel-path trajectories must converge to the
    exact Kraus channel (5 sigma)."""
    n = 3
    p1, p2 = 0.15, 0.25
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    exact = _kraus_expectation(tape, ps, p1, p2, n)

    opt = AngleOptimizer(ps.device_arrays(jnp.complex64),
                         noise_mode="depolarizing", noise_p1=p1,
                         noise_p2=p2, use_pallas=True)
    opt.pallas_interpret = True

    n_samp = 1500
    arrs = tuple(jnp.tile(jnp.asarray(a)[None], (n_samp, 1))
                 for a in tape.arrays())                        # (N, G)
    kt, kc = opt._sample_noise_kinds(arrs[0], jax.random.PRNGKey(11))
    ext = opt._extend_arrs(arrs, kt, kc)

    x = jnp.tile(jnp.asarray(tape.x0(), jnp.float32)[None, None],
                 (n_samp, 1, 1))                                # (N, 1, R)
    psi0 = zero_state(n, jnp.complex64)
    d = 1 << n
    re0 = jnp.broadcast_to(jnp.real(psi0).astype(jnp.float32),
                           (n_samp, 1, d))
    im0 = jnp.broadcast_to(jnp.imag(psi0).astype(jnp.float32),
                           (n_samp, 1, d))
    re, im = apply_tape_pallas_ri(re0, im0, *ext, x, True)
    psi = (re[:, 0] + 1j * im[:, 0]).astype(jnp.complex64)
    es = np.asarray(pauli_expectation(psi, *ps.device_arrays(jnp.complex64)))
    sigma = es.std() / np.sqrt(n_samp)
    assert abs(es.mean() - exact) < 5 * sigma + 1e-3


@pytest.mark.slow
def test_fused_step_batch_depolarizing_pallas_vs_xla():
    """The full noisy fused step through the composed kernels lands where
    the XLA noisy path lands (stochastic: loose tolerance)."""
    n = 3
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    arrs_b = tuple(np.asarray(a)[None] for a in tape.arrays())
    x0_b = tape.x0().astype(np.float32)[None]
    map_idx = np.arange(x0_b.shape[1], dtype=np.int32)[None]
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(5), 1)

    common = dict(iters=30, n_starts=3, dtype=jnp.complex64,
                  noise_mode="depolarizing", noise_p1=0.01, noise_p2=0.05)
    opt_x = AngleOptimizer(ps.device_arrays(jnp.complex64), **common)
    opt_p = AngleOptimizer(ps.device_arrays(jnp.complex64), use_pallas=True,
                           **common)
    opt_p.pallas_interpret = True

    x1, e1, _ = opt_x.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                       arrs_b, map_idx, keys)
    x2, e2, _ = opt_p.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                       arrs_b, map_idx, keys)
    assert np.isfinite(e2).all()
    # both optimize the same stochastic objective; energies are single
    # trajectory samples at p<=0.05, so allow the channel's spread
    assert e2[0] == pytest.approx(e1[0], abs=0.5)
    # noiseless energy at the pallas solution must be near the optimum of
    # the noiseless landscape reached by the xla solution
    clean = AngleOptimizer(ps.device_arrays(jnp.complex64))
    ec1 = clean.energy(psi0_ri, tuple(map(jnp.asarray, tape.arrays())), x1[0])
    ec2 = clean.energy(psi0_ri, tuple(map(jnp.asarray, tape.arrays())), x2[0])
    assert ec2 == pytest.approx(ec1, abs=0.3)


@pytest.mark.slow
def test_vector_env_noise_through_kernels():
    """End-to-end: vectorized env stepping with depolarizing noise through
    the composed Pallas kernels (interpret mode)."""
    from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
    from tensorrl_qas_tpu.envs import EnvConfig
    from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
    except FileNotFoundError:
        pytest.skip("no data")
    cfg = EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=10, n_starts=2,
        sim_dtype="complex64", seed=11, noise_mode="depolarizing",
        use_pallas="on")
    venv = VectorCircuitEnv(cfg, n_envs=2)
    venv.optimizer.pallas_interpret = True
    venv.reset_all()
    acts = all_to_all_actions(5)
    obs, rewards, dones, infos = venv.step_all([acts[20], acts[0]])
    assert all(np.isfinite(i["energy"]) for i in infos)
    assert venv.envs[0].error == venv.envs[0].error_noiseless


@pytest.mark.slow
def test_mega_kernel_quenched_trajectory():
    """noise_resample='step' quenches one sampled trajectory per env step
    into the extended tape and runs the single-launch mega-kernel."""
    n = 3
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    arrs_b = tuple(np.asarray(a)[None] for a in tape.arrays())
    x0_b = tape.x0().astype(np.float32)[None]
    map_idx = np.arange(x0_b.shape[1], dtype=np.int32)[None]
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(21), 1)

    opt = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                         n_starts=3, dtype=jnp.complex64,
                         noise_mode="depolarizing", noise_p1=0.3,
                         noise_p2=0.5, use_pallas=True)
    opt.noise_resample = "step"
    opt.pallas_interpret = True
    opt._pauli_obj = ps
    assert opt._pick_engine() == "v1"   # mega engine available at D=8

    x2, e2, _ = opt.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                     arrs_b, map_idx, keys)
    assert np.isfinite(e2).all()
    # high noise probabilities: the reported post-action energy comes from
    # a sampled trajectory, so it should (almost surely, with these fixed
    # keys) DIFFER from the exact noiseless energy at the same angles
    clean = AngleOptimizer(ps.device_arrays(jnp.complex64))
    ec = clean.energy(psi0_ri, tuple(map(jnp.asarray, tape.arrays())), x2[0])
    assert abs(float(e2[0]) - ec) > 1e-6
    # and with zero probabilities the quenched path must equal noiseless
    opt0 = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                          n_starts=3, dtype=jnp.complex64,
                          noise_mode="depolarizing", noise_p1=0.0,
                          noise_p2=0.0, use_pallas=True)
    opt0.noise_resample = "step"
    opt0.pallas_interpret = True
    opt0._pauli_obj = ps
    optc = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                          n_starts=3, dtype=jnp.complex64, use_pallas=True)
    optc.pallas_interpret = True
    optc._pauli_obj = ps
    xq, eq, _ = opt0.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                      arrs_b, map_idx, keys)
    xn, en, _ = optc.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                      arrs_b, map_idx, keys)
    assert eq[0] == pytest.approx(en[0], abs=1e-5)
    np.testing.assert_allclose(xq, xn, atol=1e-5)


def _inkernel_opt(ps, p1_, p2_, mode, interpret=True):
    o = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=1,
                       n_starts=1, lr=0.0, dtype=jnp.complex64,
                       noise_mode=mode, noise_p1=p1_, noise_p2=p2_,
                       use_pallas=True)
    o.noise_resample = "iter"
    o.pallas_interpret = interpret
    o._pauli_obj = ps
    return o


def _tiled_inputs(tape, n_env):
    arrs_b = tuple(np.tile(np.asarray(a)[None], (n_env, 1))
                   for a in tape.arrays())
    x0_b = np.tile(tape.x0().astype(np.float32)[None], (n_env, 1))
    map_idx = np.tile(np.arange(x0_b.shape[1], dtype=np.int32)[None],
                      (n_env, 1))
    return arrs_b, x0_b, map_idx


@pytest.mark.slow
def test_mega_kernel_inkernel_noise_p0_is_noiseless():
    """noise_resample='iter' on the v1 mega-kernel at p=0 must equal the
    noiseless kernel exactly (the in-kernel-PRNG variant, safe to check
    under the TPU interpreter where random bits are stubbed to 0)."""
    n = 3
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    n_env = 4
    arrs_b, x0_b, map_idx = _tiled_inputs(tape, n_env)
    keys = jax.random.split(jax.random.PRNGKey(2), n_env)
    nact = [tape.n_rots] * n_env
    o0 = _inkernel_opt(ps, 0.0, 0.0, "depolarizing")
    oc = _inkernel_opt(ps, 0.0, 0.0, "none")
    _, e0, _ = o0.fused_step_batch(psi0_ri, arrs_b, x0_b, nact, arrs_b,
                                   map_idx, keys)
    _, ec, _ = oc.fused_step_batch(psi0_ri, arrs_b, x0_b, nact, arrs_b,
                                   map_idx, keys)
    np.testing.assert_allclose(e0, ec, atol=1e-6)


def test_mega_kernel_inkernel_noise_matches_kraus():
    """Statistical parity of the in-kernel TPU-PRNG trajectory draws with
    the exact Kraus channel.  Requires real TPU hardware: the CPU-side
    Mosaic interpreter stubs prng_random_bits to zeros."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        pytest.skip("in-kernel PRNG needs a real TPU "
                    "(run scripts/validate_inkernel_noise.py)")
    # n = 7 => D = 128: the TPU lane minimum (the CPU tests use n = 3,
    # which Mosaic rejects as an unaligned dynamic_rotate shape)
    n = 7
    p1, p2 = 0.15, 0.25
    tape = _test_tape(n)

    def pad(s):
        return s + "I" * (n - len(s))

    ps = PauliSum.from_strings(
        [pad("Z"), pad("IZ"), pad("IIZ"), pad("XX"), pad("IYY")],
        [1.0, 0.5, -0.7, 0.9, 1.3], n)
    exact = _kraus_expectation(tape, ps, p1, p2, n)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    # pooled calls of 64 programs each (larger grids exhaust SMEM with
    # per-program prefetch); lr=0 and identity map keep x_new = x0, so
    # e_new is a pure trajectory sample per in-kernel PRNG stream
    n_env = 64
    arrs_b, x0_b, map_idx = _tiled_inputs(tape, n_env)
    on = _inkernel_opt(ps, p1, p2, "depolarizing", interpret=False)
    es = []
    for rep in range(10):
        keys = jax.random.split(jax.random.PRNGKey(1000 + rep), n_env)
        _, e_b, _ = on.fused_step_batch(psi0_ri, arrs_b, x0_b,
                                        [tape.n_rots] * n_env, arrs_b,
                                        map_idx, keys)
        es.append(np.asarray(e_b))
    es = np.concatenate(es)
    n_env = es.size
    sigma = es.std() / np.sqrt(n_env)
    assert es.std() > 0.0   # streams must actually differ
    assert abs(es.mean() - exact) < 5 * sigma + 1e-3


@pytest.mark.slow
def test_fused_step_batch_shot_pallas():
    """Shot mode through the kernels: huge n_shots ==> noiseless energies."""
    n = 3
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    arrs_b = tuple(np.asarray(a)[None] for a in tape.arrays())
    x0_b = tape.x0().astype(np.float32)[None]
    map_idx = np.arange(x0_b.shape[1], dtype=np.int32)[None]
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(9), 1)

    opt_c = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=2, dtype=jnp.complex64)
    opt_s = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=2, dtype=jnp.complex64,
                           noise_mode="shot", n_shots=10**10,
                           use_pallas=True)
    opt_s.pallas_interpret = True

    x2, e2, _ = opt_s.fused_step_batch(psi0_ri, arrs_b, x0_b, [tape.n_rots],
                                       arrs_b, map_idx, keys)
    # at n_shots=1e10 the sampling term is ~1e-5: the reported energy must
    # equal the exact energy at the pallas solution (map_idx = identity)
    e_clean = opt_c.energy(psi0_ri, tuple(map(jnp.asarray, tape.arrays())),
                           x2[0])
    assert e2[0] == pytest.approx(e_clean, abs=1e-3)


@pytest.mark.slow
def test_v2_mega_kernel_inkernel_noise_p0_is_noiseless():
    """The 2D-tiled mega-kernel's in-kernel noise variant at p=0 must
    equal the noiseless v2 kernel (n=7: the v2 minimum size)."""
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from test_pallas_apply import random_tape

    n = 7
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape = random_tape(n, 10, seed=2)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))

    def opt_for(mode):
        o = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=5,
                           n_starts=2, dtype=jnp.complex64,
                           noise_mode=mode, noise_p1=0.0, noise_p2=0.0,
                           use_pallas=True)
        o.noise_resample = "iter"
        o.pallas_interpret = True
        o.pallas_engine = "v2"
        o._pauli_obj = ps
        return o

    arrs_b, x0_b, map_idx = _tiled_inputs(tape, 2)
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    nact = [tape.n_rots] * 2
    _, e0, _ = opt_for("depolarizing").fused_step_batch(
        psi0_ri, arrs_b, x0_b, nact, arrs_b, map_idx, keys)
    _, ec, _ = opt_for("none").fused_step_batch(
        psi0_ri, arrs_b, x0_b, nact, arrs_b, map_idx, keys)
    np.testing.assert_allclose(e0, ec, atol=1e-5)
