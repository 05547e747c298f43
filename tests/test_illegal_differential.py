"""Randomized differential test of IllegalActionTracker.

``_ReferenceOracle`` is a deliberate line-by-line behavioral port of the
reference's ``illegal_action_new`` (``environments/environment_qulacs.py:
466-591``) — kept verbatim-ugly on purpose so it can't silently diverge
from upstream. The production tracker (envs/illegal.py) is a refactored
re-implementation; this test drives both through thousands of random action
sequences (including repeated observations, the no-op marker, and the
restricted hexagon action space) and demands identical slot lists and
identical decoded illegal-id sets at every step.

SURVEY "hard parts" #3: the slot-overflow and dedup edge cases are exactly
where hand-picked examples miss.
"""

import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.actions import action_dictionary
from tensorrl_qas_tpu.envs.illegal import IllegalActionTracker


class _ReferenceOracle:
    """Transliteration of environment_qulacs.py:466-591 (no qulacs needed)."""

    def __init__(self, num_qubits, action_dict):
        self.num_qubits = num_qubits
        self.illegal_actions = [[] for _ in range(num_qubits)]
        self.action_dict = action_dict

    def illegal_action_new(self, action):
        illegal_action = self.illegal_actions
        ctrl, targ = action[0], (action[0] + action[1]) % self.num_qubits
        rot_qubit, rot_axis = action[2], action[3]

        if ctrl < self.num_qubits:
            are_you_empty = sum([sum(l) for l in illegal_action])  # noqa: E741
            if are_you_empty != 0:
                for ill_ac_no, ill_ac in enumerate(illegal_action):
                    if len(ill_ac) != 0:
                        ill_ac_targ = (ill_ac[0] + ill_ac[1]) % self.num_qubits
                        if ill_ac[2] == self.num_qubits:
                            if ctrl == ill_ac[0] or ctrl == ill_ac_targ:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            elif targ == ill_ac[0] or targ == ill_ac_targ:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            else:
                                self._insert(action)
                        else:
                            if ctrl == ill_ac[2]:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            elif targ == ill_ac[2]:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            else:
                                self._insert(action)
            else:
                illegal_action[0] = action

        if rot_qubit < self.num_qubits:
            are_you_empty = sum([sum(l) for l in illegal_action])  # noqa: E741
            if are_you_empty != 0:
                for ill_ac_no, ill_ac in enumerate(illegal_action):
                    if len(ill_ac) != 0:
                        ill_ac_targ = (ill_ac[0] + ill_ac[1]) % self.num_qubits
                        if ill_ac[0] == self.num_qubits:
                            if rot_qubit == ill_ac[2] and rot_axis != ill_ac[3]:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            elif rot_qubit != ill_ac[2]:
                                self._insert(action)
                        else:
                            if rot_qubit == ill_ac[0]:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            elif rot_qubit == ill_ac_targ:
                                illegal_action[ill_ac_no] = []
                                self._insert(action)
                            else:
                                self._insert(action)
            else:
                illegal_action[0] = action

        for indx in range(self.num_qubits):
            for jndx in range(indx + 1, self.num_qubits):
                if illegal_action[indx] == illegal_action[jndx]:
                    if jndx != indx + 1:
                        illegal_action[indx] = []
                    else:
                        illegal_action[jndx] = []
                    break

        for indx in range(self.num_qubits - 1):
            if len(illegal_action[indx]) == 0:
                illegal_action[indx] = illegal_action[indx + 1]
                illegal_action[indx + 1] = []

        illegal_action_decode = []
        for key, contain in self.action_dict.items():
            for ill_action in illegal_action:
                if ill_action == contain:
                    illegal_action_decode.append(key)
        self.illegal_actions = illegal_action
        return illegal_action_decode

    def _insert(self, action):
        # reference insertion loop: first empty slot among 1..n-1
        for i in range(1, self.num_qubits):
            if len(self.illegal_actions[i]) == 0:
                self.illegal_actions[i] = action
                break


def _run_differential(n, topology, n_steps, seed, reobserve_prob=0.3):
    reverted = topology != "all_to_all"
    acts = action_dictionary(n, topology, reverted=reverted) \
        if reverted else action_dictionary(n, topology)
    tracker = IllegalActionTracker(n, acts)
    oracle = _ReferenceOracle(n, acts)
    rng = np.random.default_rng(seed)
    keys = list(acts.keys())
    current = [n] * 4  # reference reset marker
    for step in range(n_steps):
        if rng.random() > reobserve_prob:
            current = list(acts[keys[int(rng.integers(len(keys)))]])
        got = sorted(tracker.observe(current))
        want = sorted(oracle.illegal_action_new(current))
        assert got == want, (
            f"step {step} (n={n}, {topology}): ids {got} != oracle {want}")
        assert tracker.slots == oracle.illegal_actions, (
            f"step {step} (n={n}, {topology}): slot lists diverged\n"
            f"  tracker: {tracker.slots}\n  oracle:  {oracle.illegal_actions}")


@pytest.mark.parametrize("n", [4, 6, 8])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_differential_all_to_all(n, seed):
    _run_differential(n, "all_to_all", 400, seed)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_differential_hexagon_restricted(seed):
    # restricted space exists for n=8 (heavy-hex patch) — reference
    # restricted agents consume the reverted dict
    _run_differential(8, "hexagon", 400, seed)


def test_differential_noop_heavy():
    """The sequential driver re-observes current_action every iteration —
    stress the repeated-observation path."""
    _run_differential(5, "all_to_all", 600, seed=7, reobserve_prob=0.8)
