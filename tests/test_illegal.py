"""Illegal-action tracker property tests.

The distilled spec (``environment_qulacs.py:466-591``): after playing an
action it becomes illegal; it stays illegal until a later action touches one
of its qubits (for rotations: a different-axis rotation on the same qubit or
any CNOT touching the qubit; for CNOTs: any overlap of {ctrl,targ}).
"""

import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
from tensorrl_qas_tpu.envs.illegal import IllegalActionTracker


def make(n=4):
    acts = all_to_all_actions(n)
    return IllegalActionTracker(n, acts), acts


def ids_for(acts, pred):
    return {k for k, v in acts.items() if pred(v)}


def test_played_action_becomes_illegal():
    tr, acts = make(4)
    a = acts[0]  # CNOT(0, 1)
    ill = tr.observe(a)
    assert 0 in ill


def test_rotation_masks_same_qubit_same_axis_only():
    tr, acts = make(4)
    # rotation actions for n=4 start at id 12: [n,0,q,axis]
    rot_q1_x = next(k for k, v in acts.items() if v == [4, 0, 1, 1])
    ill = tr.observe(acts[rot_q1_x])
    assert rot_q1_x in ill
    # different axis on same qubit is legal
    rot_q1_y = next(k for k, v in acts.items() if v == [4, 0, 1, 2])
    assert rot_q1_y not in ill


def test_cnot_clears_rotation_on_shared_qubit():
    tr, acts = make(4)
    rot_q1_x = next(k for k, v in acts.items() if v == [4, 0, 1, 1])
    tr.observe(acts[rot_q1_x])
    cnot_01 = next(k for k, v in acts.items()
                   if v[0] == 0 and (v[0] + v[1]) % 4 == 1 and v[2] == 4)
    ill = tr.observe(acts[cnot_01])
    assert rot_q1_x not in ill      # cleared: CNOT touched qubit 1
    assert cnot_01 in ill           # the CNOT itself now illegal


def test_disjoint_actions_accumulate():
    tr, acts = make(6)
    rot_q0 = next(k for k, v in acts.items() if v == [6, 0, 0, 1])
    rot_q3 = next(k for k, v in acts.items() if v == [6, 0, 3, 2])
    tr.observe(acts[rot_q0])
    ill = tr.observe(acts[rot_q3])
    assert rot_q0 in ill and rot_q3 in ill


def test_noop_action_is_noop():
    tr, acts = make(4)
    a = acts[5]
    before = tr.observe(a)
    after = tr.observe([4, 4, 4, 4])  # reset marker [n]*4
    assert before == after


def test_mask_never_blocks_everything():
    """Random play: there must always be a legal action (the agent loops
    until it samples a legal one, ``agents/DeepQ.py:82-84``)."""
    rng = np.random.default_rng(0)
    for n in (4, 5):
        tr, acts = make(n)
        tr = IllegalActionTracker(n, all_to_all_actions(n))
        for _ in range(200):
            ill = set(tr.observe([n] * 4))
            legal = [k for k in acts if k not in ill]
            assert legal, "mask blocked the whole action space"
            a = int(rng.choice(legal))
            tr.observe(all_to_all_actions(n)[a])


def test_repeated_observe_is_stable():
    """The driver re-observes current_action at each iteration top; the
    mask must stay stable under repeated observation."""
    tr, acts = make(4)
    tr.observe(acts[0])
    m1 = sorted(tr.observe(acts[0]))
    m2 = sorted(tr.observe(acts[0]))
    assert m1 == m2


def test_hexagon_full_actions_extension():
    """Bug-fixed heavy-hex space (extension): hex-edge CNOTs PLUS all
    rotations — unlike the reference-parity 'hexagon' quirk dict, which
    is CNOT-only and (with the frozen notin_agent warm start) can never
    improve on the warm-start energy."""
    from tensorrl_qas_tpu.circuits.actions import (
        _HEX_EDGES_FWD,
        action_dictionary,
        hexagon_full_actions,
    )

    for n in (6, 8, 10):
        d = hexagon_full_actions(n)
        cnots = [a for a in d.values() if a[0] < n]
        rots = [a for a in d.values() if a[0] == n]
        assert len(cnots) == len(_HEX_EDGES_FWD[n])
        assert len(rots) == 3 * n
        for a in cnots:
            assert (a[0], (a[0] + a[1]) % n) in set(_HEX_EDGES_FWD[n])
        # keys are dense 0..N-1 (agent indexing contract)
        assert sorted(d.keys()) == list(range(len(d)))
        # dispatch + reverted alias
        assert action_dictionary(n, "hexagon_full") == d
        assert action_dictionary(n, "hexagon_full", reverted=True) == d


@pytest.mark.slow
def test_hexagon_full_env_steps_and_improves():
    """A trainable env on the fixed-up restricted space must be able to
    place rotations (the parity 'hexagon' space cannot)."""
    import numpy as np

    from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig

    cfg = EnvConfig(
        num_qubits=8, num_layers=25, ham_type="heisenberg",
        tn_placement="in_state", tn_init=1, tn_bond=2, accept_err=1e-3,
        curriculum_conf={"thresholds": [1e-3], "switch_episodes": [100000],
                         "accept_err": 1e-3},
        optim_alg="adam", global_iters=5, n_starts=2,
        topology="hexagon_full", sim_dtype="complex64", seed=0)
    env = CircuitEnv(cfg)
    assert env.action_size == len(env.action_dict)
    rot_actions = [k for k, a in env.action_dict.items() if a[0] == 8]
    assert rot_actions, "rotations must be available"
    env.reset()
    _, r, _ = env.step(env.action_dict[rot_actions[0]])
    assert np.isfinite(env.energy)
