"""Definitive complex128 polish of a structure-search champion circuit.

``scripts/structure_search.py`` artifacts carry ``best_err``/
``polished_err`` evaluated at the search's run dtype (complex64 on
chip); this re-optimizes the SAME structure at complex128 with a large
multi-start Adam budget and reports the f64 error — the number the
published-table comparison wants (the reference evaluates with qulacs
float64, ``VQE_qulacs.py:47-86``).

The circuit is exactly what the RL env plays: the config's TN warm
start as the fixed initial state, then the champion's (kind, target,
control) gate list with all rotation angles re-optimized jointly.

Usage:
  python scripts/polish_champion.py results_extracts/structure_search_10q_legal.json
      [--iters 3000] [--n_starts 8] [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tensorrl_qas_tpu.circuits.qasm import load_qasm_tape  # noqa: E402
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape  # noqa: E402
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer  # noqa: E402
from tensorrl_qas_tpu.problems.hamiltonians import (  # noqa: E402
    load_problem,
    resolve_warmstart_qasm,
)
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state  # noqa: E402
from tensorrl_qas_tpu.train.config import get_config  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("artifact")
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--n_starts", type=int, default=8)
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args()

    art = json.load(open(args.artifact))
    cfg_name = art["config"]
    conf = get_config("TensorRL_fixed/", cfg_name + ".cfg")
    n = conf["env"]["num_qubits"]
    tn_bond = conf["env"]["tn_bond"]
    ham = conf["problem"]["ham_type"]
    geometry = conf["problem"].get("geometry", "")
    if not isinstance(geometry, str):
        geometry = str(geometry)
    mapping = conf["problem"].get("mapping", "jordan_wigner")
    prob = load_problem(ham, n, geometry, mapping)

    ws = load_qasm_tape(resolve_warmstart_qasm(ham, n, tn_bond, geometry,
                                               mapping))
    psi0 = apply_tape(zero_state(n, jnp.complex128),
                      *map(jnp.asarray, ws.arrays()),
                      jnp.asarray(ws.x0()))

    gates = art["gates"]
    tape = GateTape(n, len(gates) + 1, len(gates) + 1)
    for k, t, c in gates:
        if k == 4:
            tape.add(GateKind.CX, target=t, control=c)
        else:
            tape.add(GateKind(int(GateKind.RX) + (k - 1)), t, angle=0.0)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float64)

    psi0_ri = (np.real(np.asarray(psi0)), np.imag(np.asarray(psi0)))
    best = np.inf
    for seed in range(args.seeds):
        opt = AngleOptimizer(prob.pauli.device_arrays(jnp.complex128),
                             iters=args.iters, n_starts=args.n_starts,
                             dtype=jnp.complex128, use_pallas=False)
        key = jax.random.PRNGKey(seed)
        map_idx = np.arange(len(x0), dtype=np.int32)
        _, e, _ = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs,
                                 map_idx, key)
        err = e - prob.min_eig
        print(f"seed {seed}: E={e:.12f}  err={err:.6e}")
        best = min(best, err)
    print(json.dumps({"artifact": args.artifact, "config": cfg_name,
                      "f64_polished_err": float(best),
                      "iters": args.iters, "n_starts": args.n_starts,
                      "seeds": args.seeds,
                      "search_reported_err": art.get("polished_err")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
