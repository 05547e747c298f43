"""The shared su4 warm-start resolution rule (problems/hamiltonians.py
resolve_warmstart_qasm) and the generalized rotation-slot keys used by
the analysis tools' angle remapping (analyze_longrun._rot_keys).

One resolver serves CircuitEnv, analyze_longrun and polish_best — these
tests pin its fallback semantics so the rule cannot drift between
training and analysis (reference counterpart: dmrg_to_qc.py's SU4 flag,
whose output no upstream env ever consumed).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "scripts"))

from analyze_longrun import _rot_keys  # noqa: E402

from tensorrl_qas_tpu.circuits.tensor_ir import SU4StateTensor, StateTensor
from tensorrl_qas_tpu.problems.hamiltonians import resolve_warmstart_qasm

H2O_GEOM = ("H -0.021 -0.002 0.000; O 0.835 0.452 0.000; "
            "H 1.477 -0.273 0.000")


def test_cnot_resolution_is_plain():
    path = resolve_warmstart_qasm("heisenberg", 5, 2)
    assert path.endswith("init_heisenberg_5q_TNbond2.qasm")


def test_su4_prefers_su4_basis_when_present():
    path = resolve_warmstart_qasm("H2O", 8, 2, H2O_GEOM,
                                  gate_set="su4", tn_placement="in_state")
    assert path.endswith("_su4.qasm")


def test_su4_fixed_falls_back_to_cnot_basis():
    # no su4-basis qasm exists for the heisenberg chains; fixed placement
    # only compiles the warm start to a statevector (basis-independent)
    path = resolve_warmstart_qasm("heisenberg", 5, 2,
                                  gate_set="su4", tn_placement="fixed")
    assert path.endswith("init_heisenberg_5q_TNbond2.qasm")


def test_su4_in_state_requires_su4_basis():
    with pytest.raises(FileNotFoundError, match="su4-basis warm start"):
        resolve_warmstart_qasm("heisenberg", 5, 2,
                               gate_set="su4", tn_placement="in_state")


def test_rot_keys_cnot_order_matches_rot_positions():
    n = 4
    st = StateTensor(6, n)
    st.place_rotation(0, 1, 2, angle=0.3)   # RY q2
    st.place_cnot(1, 0, 1)
    st.place_rotation(2, 0, 0, angle=0.7)   # RX q0
    keys = _rot_keys(st, n)
    assert len(keys) == 2
    angles = st.rot_angles()
    np.testing.assert_allclose(sorted(angles), [0.3, 0.7])
    # slot order == rot_positions scan order (row-major layer, row, col)
    ls = [k[0] for k in keys]
    assert ls == sorted(ls)


def test_rot_keys_su4_covers_two_qubit_rotations():
    """The su4 parametric block (2q XX/YY/ZZ + 1q) all enters the slot
    map — the cnot-era implementation read only the 1q axis rows and
    would silently drop the 2q angles."""
    n = 3
    st = SU4StateTensor(5, n)
    st.place_two_rotation(0, 0, 0, 1, angle=0.5)   # RXX(0,1)
    st.place_rotation(1, 2, 2, angle=0.2)          # RZ q2
    st.place_two_rotation(2, 2, 1, 2, angle=0.9)   # RZZ(1,2)
    keys = _rot_keys(st, n)
    assert len(keys) == 3
    angles = st.rot_angles()
    np.testing.assert_allclose(sorted(angles), [0.2, 0.5, 0.9])
    # remap by identity: every key maps to exactly one stored angle
    ang_of = dict(zip(keys, angles))
    assert len(ang_of) == 3
