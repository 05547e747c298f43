"""Deep complex128 re-optimization of a run's best discovered circuit.

``analyze_longrun.py --f64`` re-*evaluates* the stored angles exactly;
this re-*optimizes* them with a large Adam budget (default 3000 iters x
8 starts x 3 seeds, warm-started at the stored optimum plus fresh
restarts).  The gap between the two quantifies how much energy the
run-time optimizer budget (reference-mapped ``global_iters``) left on
the table for the *same discovered structure* — the reference's
equivalent knob is COBYLA ``maxiter`` (``environment_qulacs.py:436-441``).

Usage:
  python scripts/polish_best.py <results_dir> [--seed N] [--iters 3000]
                                [--n_starts 8] [--restarts 3] [--which best]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from analyze_longrun import _rot_keys, circuit_stats  # noqa: E402

from tensorrl_qas_tpu.circuits.actions import action_dictionary  # noqa: E402
from tensorrl_qas_tpu.circuits.qasm import load_circuit_tape  # noqa: E402
from tensorrl_qas_tpu.problems.hamiltonians import (  # noqa: E402
    load_problem,
    resolve_warmstart_qasm,
)
from tensorrl_qas_tpu.train.config import get_config  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("results_dir")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--family", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--n_starts", type=int, default=8)
    p.add_argument("--restarts", type=int, default=3)
    p.add_argument("--which", choices=["best", "best_done"], default="best")
    p.add_argument("--topology", default=None)
    p.add_argument("--gate_set", choices=["cnot", "su4"], default=None,
                   help="action basis of the run (default: the config's "
                        "gate_set key, else cnot); required for summaries "
                        "from runs launched with the CLI --gate_set flag")
    p.add_argument("--topk", type=int, default=1,
                   help="polish the K best *distinct-structure* episodes "
                        "(distinct action prefixes), not just the single "
                        "best — tests whether a run's near-floor circuits "
                        "share one variational attractor")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state

    d = pathlib.Path(args.results_dir)
    family = args.family or d.parent.name + "/"
    cfg_name = args.config or d.name + ".cfg"
    conf = get_config(family, cfg_name)
    tn_placement = "fixed" if "fixed" in family.lower() else "in_state"
    zero_params = bool(conf["env"].get("zero_param_init", 0))
    n = conf["env"]["num_qubits"]
    num_layers = conf["env"]["num_layers"]
    topology = (args.topology or conf["env"].get("topology")
                or "all_to_all")
    gate_set = args.gate_set or conf["env"].get("gate_set", "cnot")
    action_dict = action_dictionary(n, topology, gate_set=gate_set)

    tn_tape = None
    if tn_placement == "in_state" and conf["env"].get("tn_init"):
        tn_tape = load_circuit_tape(resolve_warmstart_qasm(
            conf["problem"]["ham_type"], n, conf["env"]["tn_bond"],
            conf["problem"].get("geometry"),
            conf["problem"].get("mapping"),
            gate_set=gate_set, tn_placement=tn_placement))

    summary = np.load(d / f"summary_{args.seed}.npy",
                      allow_pickle=True).item()["train"]
    cands = []
    for ep, rec in summary.items():
        errs = np.asarray(rec["errors"], dtype=float)
        if errs.size == 0:
            continue
        if args.which == "best_done":
            rewards = rec.get("reward", [])
            if not (len(rewards) > 0 and rewards[-1] >= 5.0):
                continue
            i = len(errs) - 1
        else:
            i = int(np.argmin(errs))
        cands.append({"error": float(errs[i]), "episode": int(ep),
                      "step": i, "actions": rec["actions"][: i + 1],
                      "angles": (rec.get("opt_ang") or [None])[
                          min(i, len(rec.get("opt_ang", [])) - 1)]})
    if not cands:
        raise SystemExit("no episodes recorded")
    cands.sort(key=lambda c: c["error"])
    seen, picked = set(), []
    for c in cands:
        key = tuple(int(a) for a in c["actions"])
        if key in seen:
            continue
        seen.add(key)
        picked.append(c)
        if len(picked) >= args.topk:
            break

    prob = load_problem(conf["problem"]["ham_type"], n,
                        geometry=conf["problem"].get("geometry", ""),
                        mapping=conf["problem"].get("mapping",
                                                    "jordan_wigner"))
    if tn_placement == "fixed" and conf["env"].get("tn_init"):
        wtape = load_circuit_tape(resolve_warmstart_qasm(
            conf["problem"]["ham_type"], n, conf["env"]["tn_bond"],
            conf["problem"].get("geometry"),
            conf["problem"].get("mapping"),
            gate_set=gate_set, tn_placement=tn_placement))
        psi0 = apply_tape(zero_state(n, jnp.complex128),
                          *map(jnp.asarray, wtape.arrays()),
                          jnp.asarray(wtape.x0()),
                          enable_2q=(gate_set == "su4"))
    else:
        psi0 = zero_state(n, jnp.complex128)
    opt = AngleOptimizer(prob.pauli.device_arrays(jnp.complex128),
                         iters=args.iters, n_starts=args.n_starts,
                         dtype=jnp.complex128, use_pallas=False,
                         enable_2q=(gate_set == "su4"))
    e_min = float(prob.min_eig)

    rows = []
    for best in picked:
        # rebuild post-action tape + remapped pre-action angles (map_idx
        # semantics, same as analyze_longrun.f64_error)
        stats, state_new = circuit_stats(best["actions"], n, num_layers,
                                         action_dict, tn_tape, zero_params,
                                         gate_set=gate_set,
                                         return_state=True)
        _, state_old = circuit_stats(best["actions"][:-1], n, num_layers,
                                     action_dict, tn_tape, zero_params,
                                     gate_set=gate_set,
                                     return_state=True)
        angles = np.asarray(best["angles"], dtype=np.float64).ravel()
        old_keys = _rot_keys(state_old, n)
        new_keys = _rot_keys(state_new, n)
        ang_of = {k: angles[j] for j, k in enumerate(old_keys)}
        x0 = np.array([ang_of.get(k, 0.0) for k in new_keys] or [0.0],
                      dtype=np.float64)
        cap = state_new.data.shape[0] * n + 8
        tape = state_new.to_tape(cap, max(len(new_keys), 1))
        arrs = tuple(map(jnp.asarray, tape.arrays()))
        results = []
        pad = np.zeros(tape.angles.shape[0], dtype=np.float64)
        pad[: len(x0)] = x0
        for s in range(args.restarts):
            _, e, _ = opt.optimize(psi0, arrs, pad, tape.n_rots,
                                   jax.random.PRNGKey(s))
            results.append(e - e_min)
        row = {"results_dir": str(d), "which": args.which,
               "episode": best["episode"], "step": best["step"],
               "run_error": best["error"], **stats,
               "polished_f64_error": float(np.min(results)),
               "iters": args.iters, "n_starts": args.n_starts,
               "restarts": args.restarts}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
