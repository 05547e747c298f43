"""Environment semantics tests (heisenberg 5q slice, golden data)."""

import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
from tensorrl_qas_tpu.circuits.tensor_ir import StateTensor
from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file


def _have_data():
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _have_data(),
                                reason="reference data not available")


def make_env(tn_placement="fixed", optim_alg="adam", iters=30, **kw):
    cfg = EnvConfig(
        num_qubits=5, num_layers=40, ham_type="heisenberg",
        tn_placement=tn_placement, tn_init=1, tn_bond=2,
        accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg=optim_alg, global_iters=iters, n_starts=4,
        sim_dtype="complex128", seed=3, **kw)
    return CircuitEnv(cfg)


def test_reset_fixed_mode_starts_from_tn_energy():
    env = make_env("fixed")
    obs = env.reset()
    # observation without angles: L * n * (n+3)
    assert obs.shape == (40 * 5 * 8,)
    assert np.all(obs == 0)  # no agent gates yet, TN not in state
    # initial energy = warm-start circuit energy (either the reference's
    # shipped circuit at -8.4975 or our generated one at -8.4986)
    assert -8.6 < env.prev_energy < -8.4
    assert env.num_layers_termination == 40 - env.tn_depth


def test_reset_in_state_mode_embeds_tn():
    env = make_env("in_state")
    obs = env.reset()
    assert np.any(obs != 0)  # TN one-hots present
    assert env.layer_offset == env.tn_depth > 0
    # energy of the embedded circuit equals the fixed-mode psi0 energy
    assert -8.6 < env.prev_energy < -8.4


def test_structure_rl_zeroes_angles():
    env = make_env("in_state", zero_param_init=1)
    env.reset()
    assert np.all(env.state.thetas == 0)
    # zeroed brickwork structure applied to |0..0>: energy = <0|H|0>
    # (all rotations identity, CNOTs act trivially on |0>)
    prob = env.problem
    e00 = float(np.real(prob.dense[0, 0]))
    assert env.prev_energy == pytest.approx(e00, abs=1e-9)


def test_step_places_gate_and_rewards():
    env = make_env("fixed", optim_alg="adam", iters=20)
    env.reset()
    e0 = env.prev_energy
    acts = all_to_all_actions(5)
    # take a rotation action (id >= 20 are rotations for n=5)
    obs, rwd, done = env.step(acts[20])
    assert env.step_counter == 0
    assert isinstance(rwd, float) and -5.0 <= rwd <= 5.0
    # exactly one one-hot placed
    st = env.state.data
    assert np.sum(st[:, :5] == 1) + np.sum(st[:, 5:8] == 1) == 1
    # energy should not be worse than start by much (optimizer ran)
    assert env.energy <= e0 + 0.3


def test_full_episode_terminates():
    env = make_env("fixed", iters=10)
    env.reset()
    acts = all_to_all_actions(5)
    rng = np.random.default_rng(0)
    done = 0
    for itr in range(env.num_layers + 1):
        ill = env.illegal_action_new()
        legal = [a for a in range(env.action_size) if a not in ill]
        a = int(rng.choice(legal))
        obs, rwd, done = env.step(acts[a])
        if done:
            break
    assert done == 1
    assert env.step_counter <= env.num_layers_termination - 1


@pytest.mark.slow
def test_optimizer_improves_energy_over_steps():
    env = make_env("fixed", iters=60)
    env.reset()
    e_start = env.prev_energy
    acts = all_to_all_actions(5)
    rng = np.random.default_rng(1)
    best = e_start
    for _ in range(6):
        ill = env.illegal_action_new()
        legal = [a for a in range(env.action_size) if a not in ill]
        _, _, done = env.step(acts[int(rng.choice(legal))])
        best = min(best, env.energy)
        if done:
            break
    assert best < e_start + 1e-9


def test_angle_roundtrip_tape_vs_tensor_order():
    """Tape rotation order must equal the tensor rot-position scan order."""
    st = StateTensor(4, 3)
    st.place_rotation(0, 2, 1, 0.11)   # layer0 RZ q1
    st.place_rotation(0, 0, 2, 0.22)   # layer0 RX q2
    st.place_cnot(1, 0, 1)
    st.place_rotation(1, 1, 0, 0.33)   # layer1 RY q0
    tape = st.to_tape(8, 8)
    # tensor scan order: (layer, axis, qubit) row-major
    np.testing.assert_allclose(st.rot_angles(), [0.22, 0.11, 0.33])
    np.testing.assert_allclose(tape.x0()[:3], [0.22, 0.11, 0.33])
    st.set_rot_angles(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(st.to_tape(8, 8).x0()[:3], [1.0, 2.0, 3.0])


@pytest.mark.slow
def test_hexagon_restricted_env():
    """Heavy-hex restricted mode: CNOT-only action space (reference filter
    quirk) on the 8q benchmark problem with shot noise."""
    from tensorrl_qas_tpu.circuits.actions import hexagon_actions_reverted

    geom = ("H -0.021 -0.002 0.000; O 0.835 0.452 0.000; "
            "H 1.477 -0.273 0.000")
    try:
        resolve_data_file("mol_data/H2O_8q_geom_H_-0.021_-0.002_0.000;"
                          "_O_0.835_0.452_0.000;_H_1.477_-0.273_0.000"
                          "_jordan_wigner.npz")
    except FileNotFoundError:
        pytest.skip("H2O data not available")
    cfg = EnvConfig(
        num_qubits=8, num_layers=47, ham_type="H2O", geometry=geom,
        tn_placement="fixed", tn_init=1, tn_bond=2, accept_err=1.6e-3,
        curriculum_conf={"thresholds": [1.6e-3], "switch_episodes": [100000],
                         "accept_err": 1.6e-3},
        optim_alg="adam", global_iters=10, n_starts=2,
        noise_mode="shot", n_shots=1024, topology="hexagon",
        sim_dtype="complex128", use_pallas="off", seed=2)
    env = CircuitEnv(cfg)
    # reference: action_size = len(reverted hexagon dict)
    assert env.action_size == len(hexagon_actions_reverted(8))
    env.reset()
    ill = env.illegal_action_new()
    legal = [a for a in range(env.action_size) if a not in ill]
    _, rwd, done = env.step(env.action_dict[legal[0]])
    assert np.isfinite(env.energy)


def test_pallas_auto_gate_covers_v3_sizes(monkeypatch):
    """The use_pallas='auto' gate must keep the fast path on through the
    v3+ kernel ceiling (n <= 18) on TPU backends; round-3 regression — the
    stale D <= 4096 cap silently dropped 13-16q benches to the XLA path."""
    import jax as _jax

    import tensorrl_qas_tpu.envs.circuit_env as ce

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    for n, expect in [(10, True), (14, True), (16, True), (18, True),
                      (20, False)]:
        cfg = EnvConfig(
            num_qubits=n, num_layers=10, ham_type="heisenberg",
            tn_placement="fixed", tn_init=0, tn_bond=2,
            fake_min_energy=-1.0, accept_err=1e-3,
            curriculum_conf={"thresholds": [1e-3],
                             "switch_episodes": [100000],
                             "accept_err": 1e-3},
            optim_alg="adam", global_iters=2, n_starts=2, seed=0)
        env = ce.CircuitEnv(cfg)
        assert env.optimizer.use_pallas is expect, (n, expect)
