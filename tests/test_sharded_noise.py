"""Depolarizing noise on the amplitude-sharded path (VERDICT r2 item 3).

Trajectories ride the sharded simulator as tape extensions — the same
X/Y/Z-in-reserved-slots encoding as the single-chip mega path
(optim/angle_opt.py:sample_depolarizing_kinds) — so the reference's noisy
training modes (environment_qulacs_TN_notin_agent_noise*.py) are no
longer capped at single-chip sizes.  Runs on the virtual 8-device CPU
mesh (conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.optim.angle_opt import (
    AngleOptimizer,
    extend_tape_arrays,
    sample_depolarizing_kinds,
)
from tensorrl_qas_tpu.optim.sharded_opt import ShardedAngleOptimizer
from tensorrl_qas_tpu.parallel.mesh import make_mesh
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tests.test_noise_pallas import _kraus_expectation, _test_tape
from tests.test_pallas_apply import random_tape

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _psi0_ri(n):
    psi0 = zero_state(n, jnp.complex64)
    return (np.real(psi0).astype(np.float32),
            np.imag(psi0).astype(np.float32))


@pytest.mark.slow
def test_sharded_noisy_energy_matches_single_chip_extension():
    """energy() with a fixed key == the single-chip noiseless energy of
    the identically-extended tape (deterministic trajectory parity)."""
    n = 4
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    mesh = make_mesh(n_amp=2, n_dp=4)
    opt_s = ShardedAngleOptimizer(mesh, n, ps, iters=5, n_starts=4,
                                  noise_mode="depolarizing", noise_p1=0.5,
                                  noise_p2=0.5, dtype=jnp.complex64)
    opt_x = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=5,
                           n_starts=4, dtype=jnp.complex64)
    tape = random_tape(n, 10, seed=5)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = tape.x0().astype(np.float32)
    key = jax.random.PRNGKey(11)

    e_sharded = opt_s.energy(_psi0_ri(n), arrs, x, key=key)

    kt, kc = sample_depolarizing_kinds(arrs[0], key, 0.5, 0.5)
    ext = extend_tape_arrays(arrs, kt, kc)
    assert int(jnp.sum(kt != 0) + jnp.sum(kc != 0)) > 0  # errors fired
    e_ref = opt_x.energy(_psi0_ri(n), ext, x)
    assert e_sharded == pytest.approx(e_ref, abs=1e-4)


@pytest.mark.slow
def test_sharded_trajectory_mean_matches_kraus():
    """Mean sharded-trajectory energy converges to the exact Kraus
    channel (5 sigma), like the single-chip tiers."""
    n = 3
    p1, p2 = 0.15, 0.25
    tape = _test_tape(n)
    ps = PauliSum.from_strings(["ZII", "IZI", "IIZ", "XXI", "IYY"],
                               [1.0, 0.5, -0.7, 0.9, 1.3], n)
    exact = _kraus_expectation(tape, ps, p1, p2, n)

    mesh = make_mesh(n_amp=2, n_dp=4)
    opt = ShardedAngleOptimizer(mesh, n, ps, iters=1, n_starts=4,
                                noise_mode="depolarizing", noise_p1=p1,
                                noise_p2=p2, dtype=jnp.complex64)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = tape.x0().astype(np.float32)
    psi0 = _psi0_ri(n)
    m = 400
    vals = np.array([opt.energy(psi0, arrs, x, key=jax.random.PRNGKey(s))
                     for s in range(m)])
    sem = vals.std(ddof=1) / np.sqrt(m)
    assert abs(vals.mean() - exact) < 5 * sem + 1e-6


@pytest.mark.slow
def test_sharded_fused_step_zero_noise_equals_noiseless():
    """p1=p2=0 extensions are all NONE gates: the noisy program must
    reproduce the noiseless fused step exactly (both resample modes)."""
    n = 5
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    mesh = make_mesh(n_amp=2, n_dp=4)
    tape = random_tape(n, 12, seed=7)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = _psi0_ri(n)
    key = jax.random.PRNGKey(3)

    opt0 = ShardedAngleOptimizer(mesh, n, ps, iters=10, n_starts=4,
                                 dtype=jnp.complex64)
    xr, er, _ = opt0.fused_step(psi0, arrs, x0, tape.n_rots, arrs,
                                map_idx, key)
    for resample in ("iter", "step"):
        optn = ShardedAngleOptimizer(mesh, n, ps, iters=10, n_starts=4,
                                     noise_mode="depolarizing",
                                     noise_p1=0.0, noise_p2=0.0,
                                     noise_resample=resample,
                                     dtype=jnp.complex64)
        xn, en, _ = optn.fused_step(psi0, arrs, x0, tape.n_rots, arrs,
                                    map_idx, key)
        np.testing.assert_allclose(xn, xr, atol=1e-5)
        assert en == pytest.approx(er, abs=1e-5)


def _env_cfg(**kw):
    base = dict(
        num_qubits=8, num_layers=25, ham_type="heisenberg",
        tn_placement="in_state", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=3, n_starts=2,
        sim_dtype="complex64", mesh_shape=(2, 4), seed=0)
    base.update(kw)
    return EnvConfig(**base)


@pytest.mark.slow
def test_env_step_sharded_depolarizing():
    """CircuitEnv accepts mesh_shape + depolarizing and takes real noisy
    training steps on the mesh (the reference's noisy modes at scale-out
    sizes)."""
    env = CircuitEnv(_env_cfg(noise_mode="depolarizing",
                              noise_values=(0.01, 0.05),
                              noise_resample="iter"))
    assert env.mesh is not None
    env.reset()
    assert np.isfinite(env.prev_energy)
    rng = np.random.default_rng(2)
    for _ in range(2):
        ill = set(env.illegal_action_new())
        legal = [k for k in env.action_dict if k not in ill]
        a = env.action_dict[int(rng.choice(legal))]
        _, reward, _ = env.step(a)
        assert np.isfinite(env.energy)
        assert np.isfinite(reward)
        assert env.nfev > 0


def test_env_rejects_shot_noise_on_mesh():
    with pytest.raises(NotImplementedError):
        CircuitEnv(_env_cfg(noise_mode="shot", n_shots=128))
