"""Published-table metric extraction (scripts/analyze_longrun.py)."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "scripts"))

from analyze_longrun import analyze, circuit_stats  # noqa: E402

from tensorrl_qas_tpu.circuits.actions import all_to_all_actions
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.circuits.qasm import load_qasm_tape  # noqa: F401


def test_circuit_stats_counts_and_depth():
    n = 4
    acts = all_to_all_actions(n)
    rev = {tuple(v): k for k, v in acts.items()}
    # CX(0,1), RX(2), CX(2,3), RY(2): depth: q0/q1 at 1; q2: cx+2 rots = 3
    ids = [rev[(0, 1, n, 0)], rev[(n, 0, 2, 1)], rev[(2, 1, n, 0)],
           rev[(n, 0, 2, 2)]]
    out = circuit_stats(ids, n, 10, acts)
    assert out == {"depth": 3, "cnots": 2, "rots": 2}


def test_circuit_stats_with_embedded_tape():
    n = 3
    acts = all_to_all_actions(n)
    rev = {tuple(v): k for k, v in acts.items()}
    tn = GateTape(n, 4, 4)
    tn.add_cx(0, 1)
    tn.add(GateKind.RY, target=2, angle=0.3)
    out = circuit_stats([rev[(n, 0, 0, 1)]], n, 10, acts, tn_tape=tn)
    assert out["cnots"] == 1 and out["rots"] == 2


def test_analyze_summary_roundtrip(tmp_path):
    """analyze() picks the best (episode, step) and scores its circuit."""
    n = 4
    acts = all_to_all_actions(n)
    rev = {tuple(v): k for k, v in acts.items()}
    summary = {"train": {
        0: {"errors": [0.5, 0.2], "reward": [0.0, 0.1],
            "actions": [rev[(0, 1, n, 0)], rev[(n, 0, 2, 1)]]},
        1: {"errors": [0.4, 1e-4], "reward": [0.0, 5.0],
            "actions": [rev[(1, 1, n, 0)], rev[(n, 0, 0, 3)]]},
    }, "test": {}}
    p = tmp_path / "summary_7.npy"
    np.save(p, summary, allow_pickle=True)
    conf = {"env": {"num_qubits": n, "num_layers": 10, "accept_err": 1.6e-3,
                    "tn_init": 0},
            "problem": {"ham_type": "x"}}
    out = analyze(p, conf, tn_placement="fixed")
    assert out["episodes"] == 2
    assert out["successes"] == 1
    assert out["best"]["episode"] == 1
    assert out["best"]["error"] == 1e-4
    assert out["best"]["cnots"] == 1 and out["best"]["rots"] == 1
    assert out["best_done"]["episode"] == 1
