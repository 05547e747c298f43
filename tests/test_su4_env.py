"""SU(4) gate-set mode: action space, state tensor, env, agent.

The reference ships this action set only as unimported simulator code
(``environments/VQAs/VQE_qulacs_su4.py``) plus stale agent bytecode; here
it is a first-class env/agent mode (``gate_set='su4'``) with the state
layout taken from the reference's construct_ansatz scan (rows 0..3n-1 =
XX/YY/ZZ one-hots [targ, ctrl], 3n..3n+2 = 1q one-hots, matching angle
rows after).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.actions import action_dictionary, su4_actions
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.circuits.tensor_ir import SU4StateTensor, embed_tape
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state


def test_su4_action_dictionary():
    n = 5
    d = su4_actions(n)
    assert len(d) == 3 * n * n
    two_q = [a for a in d.values() if a[0] < n]
    one_q = [a for a in d.values() if a[0] == n]
    assert len(two_q) == 3 * n * (n - 1)
    assert len(one_q) == 3 * n
    for a in two_q:
        assert a[2] == n and a[3] in (1, 2, 3) and 1 <= a[1] < n
    for a in one_q:
        assert a[2] < n and a[3] in (1, 2, 3)
    # entry point + guards
    assert action_dictionary(n, gate_set="su4") == d
    with pytest.raises(ValueError):
        action_dictionary(n, topology="hexagon", gate_set="su4")


def test_su4_state_tensor_to_tape_order_and_state():
    """Within a layer the tape order is XX < YY < ZZ < 1q (reference
    construct_ansatz scan) and the lowered tape reproduces the statevector
    of a hand-built tape."""
    n = 3
    st = SU4StateTensor(4, n)
    st.place_two_rotation(0, 2, ctrl=0, targ=1, angle=0.3)   # ZZ(0,1)
    st.place_two_rotation(0, 0, ctrl=1, targ=2, angle=-0.4)  # XX(1,2)
    st.place_rotation(0, 1, qubit=0, angle=0.9)              # RY(0)
    st.place_two_rotation(1, 1, ctrl=2, targ=0, angle=1.1)   # YY(2,0)
    st.place_rotation(1, 0, qubit=1, angle=-0.2)             # RX(1)

    tape = st.to_tape(8, 8)
    kinds = [GateKind(k) for k in tape.kind[: tape.n_gates]]
    assert kinds == [GateKind.RXX, GateKind.RZZ, GateKind.RY,
                     GateKind.RYY, GateKind.RX]
    assert tape.n_rots == 5  # every su4 gate is parametric

    ref = GateTape(n, 8, 8)
    ref.add(GateKind.RXX, target=2, control=1, angle=-0.4)
    ref.add(GateKind.RZZ, target=1, control=0, angle=0.3)
    ref.add(GateKind.RY, target=0, angle=0.9)
    ref.add(GateKind.RYY, target=0, control=2, angle=1.1)
    ref.add(GateKind.RX, target=1, angle=-0.2)

    psi_a = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, tape.arrays()),
                       jnp.asarray(tape.x0()))
    psi_b = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, ref.arrays()),
                       jnp.asarray(ref.x0()))
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b),
                               atol=1e-12)


def test_su4_embed_round_trip():
    n = 3
    tape = GateTape(n, 6, 6)
    tape.add(GateKind.RXX, target=1, control=0, angle=0.5)
    tape.add(GateKind.RZ, target=0, angle=-0.3)
    tape.add(GateKind.RYY, target=2, control=1, angle=0.8)
    st = SU4StateTensor(6, n)
    depth = embed_tape(st, tape)
    assert depth == 2  # XX(0,1), then RZ(0) and YY(1,2) share layer 1
    out = st.to_tape(8, 8)
    psi_a = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, out.arrays()),
                       jnp.asarray(out.x0()))
    psi_b = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, tape.arrays()),
                       jnp.asarray(tape.x0()))
    np.testing.assert_allclose(np.asarray(psi_a), np.asarray(psi_b),
                               atol=1e-12)
    # structure-only embedding zeroes angles
    st0 = SU4StateTensor(6, n)
    embed_tape(st0, tape, zero_params=True)
    assert np.all(st0.to_tape(8, 8).x0() == 0.0)


def _su4_env(n_starts=2, iters=8):
    from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
    except FileNotFoundError:
        pytest.skip("no data")
    cfg = EnvConfig(
        num_qubits=5, num_layers=20, ham_type="heisenberg",
        tn_placement="fixed", tn_init=0, tn_bond=0, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=iters, n_starts=n_starts,
        sim_dtype="complex128", seed=3, gate_set="su4")
    return CircuitEnv(cfg)


def test_su4_env_end_to_end():
    env = _su4_env()
    n = 5
    assert env.action_size == 3 * n * n
    obs = env.reset()
    # state_size is the full (with-angles) encoding; the default observation
    # strips the (3n+3)-row angle block (agent subtracts the same amount)
    assert env.state_size == 20 * n * (6 * n + 6)
    assert obs.shape == (env.state_size - 20 * n * (3 * n + 3),)
    e0 = env.prev_energy

    acts = env.action_dict
    # one 2q rotation, one 1q rotation
    two_q_id = next(k for k, a in acts.items() if a[0] < n)
    one_q_id = next(k for k, a in acts.items() if a[0] == n)
    _, r1, d1 = env.step(acts[two_q_id])
    assert np.isfinite(env.energy)
    _, r2, d2 = env.step(acts[one_q_id])
    assert np.isfinite(env.energy)
    # the optimizer must STRICTLY improve on the empty-circuit energy
    # (guards the enable_2q wiring: without it the RXX/RYY/RZZ angles are
    # silently ignored and the energy freezes at e0)
    assert env.energy < e0 - 1e-6
    # replaying the exact same action must be masked
    illegal = env.illegal_action_new()
    assert one_q_id in illegal


@pytest.mark.slow
def test_su4_agent_wiring():
    from tensorrl_qas_tpu.agents.dqn import make_agent

    env = _su4_env()
    conf = {"env": {"num_qubits": 5, "num_layers": 20, "gate_set": "su4"},
            "agent": {"batch_size": 8, "memory_size": 64, "neurons": [32],
                      "dropout": 0.0, "learning_rate": 1e-3, "angles": 0,
                      "en_state": 0, "priotitized_replay": 0,
                      "update_target_net": 5, "final_gamma": 0.05,
                      "epsilon_decay": 0.9, "epsilon_min": 0.05,
                      "agent_class": "DQN"}}
    agent = make_agent(conf, env.action_size, env.state_size, seed=0)
    assert agent.translate == env.action_dict
    obs = env.reset()
    a, _ = agent.act(obs, illegal=[0, 1, 2])
    assert 0 <= a < env.action_size and a not in (0, 1, 2)
    env.step(agent.translate[int(a)])
    assert np.isfinite(env.energy)


def test_su4_basis_synthesis_matches_cnot_basis():
    """decompose_su4_pauli: same unitary as the CNOT-basis synthesis, via
    3 RXX/RYY/RZZ rotations + locals (reference dmrg_to_qc.py SU4 flag)."""
    from scipy.stats import unitary_group

    from tensorrl_qas_tpu.tn.pipeline import su4_circuit_to_tape

    rng = np.random.default_rng(5)
    n = 3
    params = [unitary_group.rvs(4, random_state=rng) for _ in range(2)]
    pairs = [(1, 0), (2, 1)]   # (q_hi, q_lo)

    t_cnot = su4_circuit_to_tape(params, pairs, n, basis="cnot")
    t_su4 = su4_circuit_to_tape(params, pairs, n, basis="su4")
    assert t_cnot.cnot_count == 6
    assert t_su4.cnot_count == 0
    assert t_su4.gate_count(GateKind.RXX) == 2

    psi_a = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, t_cnot.arrays()),
                       jnp.asarray(t_cnot.x0()))
    psi_b = apply_tape(zero_state(n, jnp.complex128),
                       *map(jnp.asarray, t_su4.arrays()),
                       jnp.asarray(t_su4.x0()), enable_2q=True)
    # same state up to global phase
    ov = abs(np.vdot(np.asarray(psi_a), np.asarray(psi_b)))
    assert ov == pytest.approx(1.0, abs=1e-9)


@pytest.mark.slow
def test_su4_vectorized_env():
    """su4 gate set under the vectorized wrapper (batched XLA fused step)."""
    from tensorrl_qas_tpu.envs import EnvConfig
    from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
    except FileNotFoundError:
        pytest.skip("no data")
    cfg = EnvConfig(
        num_qubits=5, num_layers=20, ham_type="heisenberg",
        tn_placement="fixed", tn_init=0, tn_bond=0, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=6, n_starts=2,
        sim_dtype="complex64", seed=7, gate_set="su4")
    venv = VectorCircuitEnv(cfg, n_envs=3)
    venv.reset_all()
    acts = list(venv.envs[0].action_dict.values())
    e0 = venv.envs[0].prev_energy
    obs, rewards, dones, infos = venv.step_all([acts[0], acts[40], acts[70]])
    assert np.isfinite([i["energy"] for i in infos]).all()
    obs, rewards, dones, infos = venv.step_all([acts[5], acts[0], acts[12]])
    # replicas advance independently and optimize 2q-rotation angles
    assert venv.envs[0].energy < e0 + 1e-9


H2O_GEOM = ("H -0.021 -0.002 0.000; O 0.835 0.452 0.000; "
            "H 1.477 -0.273 0.000")


@pytest.mark.slow
def test_su4_in_state_warmstart_resolution_and_embedding():
    """gate_set='su4' + tn_placement='in_state' resolves the su4-basis
    warm start (init_*_su4.qasm, the consumer of the reference
    dmrg_to_qc.py SU4 flag that no upstream env ever wired) and embeds
    its RXX/RYY/RZZ + 1q rotations into the SU4StateTensor."""
    from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    try:
        resolve_data_file(
            "init_state_circ/init_H2O_8q_geom_H_-0.021_-0.002_0.000;"
            "_O_0.835_0.452_0.000;_H_1.477_-0.273_0.000_jordan_wigner"
            "_TNbond2_su4.qasm")
    except FileNotFoundError:
        pytest.skip("no su4 warm-start data")
    cfg = EnvConfig(
        num_qubits=8, num_layers=47, ham_type="H2O", geometry=H2O_GEOM,
        tn_placement="in_state", tn_init=1, tn_bond=2, accept_err=1.6e-3,
        curriculum_conf={"thresholds": [1.6e-3],
                         "switch_episodes": [100000],
                         "accept_err": 1.6e-3},
        optim_alg="adam", global_iters=4, n_starts=2,
        sim_dtype="complex64", seed=3, gate_set="su4")
    env = CircuitEnv(cfg)
    # the su4-basis warm start is pure Pauli rotations (no CNOTs)
    assert env.tn_tape.cnot_count == 0
    assert env.tn_tape.n_rots > 0
    env.reset()
    n = 8
    # embedded two-qubit rotation one-hots live in rows 0..3n-1
    assert np.sum(env.state.data[:, : 3 * n] == 1) > 0
    # warm-start energy must sit near the cnot-basis warm start's error
    assert env.error < 5e-3
    # an episode step on top of the embedded tape works end-to-end
    aid, act = next(iter(env.action_dict.items()))
    env.step(act)
    assert np.isfinite(env.energy)


def test_su4_in_state_requires_su4_basis_warmstart():
    """A cnot-basis-only warm start must fail fast for su4 in_state."""
    from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
    except FileNotFoundError:
        pytest.skip("no data")
    cfg = EnvConfig(
        num_qubits=5, num_layers=20, ham_type="heisenberg",
        tn_placement="in_state", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=4, n_starts=2,
        sim_dtype="complex64", seed=3, gate_set="su4")
    with pytest.raises(FileNotFoundError, match="su4-basis warm start"):
        CircuitEnv(cfg)

@pytest.mark.slow
def test_su4_env_on_mesh():
    """su4 gate set on a (2 amp x 4 dp) sharded mesh (round 4: the
    single-chip-only guard is lifted; ShardedSimulator carries the
    RXX/RYY/RZZ exchanges + adjoint generator pair)."""
    import jax

    from tensorrl_qas_tpu.envs import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.problems.hamiltonians import resolve_data_file

    if len(jax.devices()) < 8:
        pytest.skip("need 8 devices")
    try:
        resolve_data_file("mol_data/heisenberg_5q.npz")
    except FileNotFoundError:
        pytest.skip("no data")
    cfg = EnvConfig(
        num_qubits=5, num_layers=20, ham_type="heisenberg",
        tn_placement="fixed", tn_init=0, tn_bond=0, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=8, n_starts=2,
        sim_dtype="complex64", seed=3, gate_set="su4", mesh_shape=(2, 4))
    env = CircuitEnv(cfg)
    assert env.mesh is not None
    env.reset()
    e0 = env.prev_energy
    acts = env.action_dict
    two_q_id = next(k for k, a in acts.items() if a[0] < 5)
    one_q_id = next(k for k, a in acts.items() if a[0] == 5)
    env.step(acts[two_q_id])
    assert np.isfinite(env.energy)
    env.step(acts[one_q_id])
    assert np.isfinite(env.energy)
    # the sharded optimizer must strictly improve on the empty-circuit
    # energy through the 2q-rotation angles
    assert env.energy < e0 - 1e-6
