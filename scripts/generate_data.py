"""Generate problem data + warm-start circuits into the repo data/ tree.

Standalone replacement for the reference's offline stages 0 and 1
(``dmrg-to-qc/heisenberg_model.py``, ``dmrg-to-qc/making_molecules.py``,
``dmrg-to-qc/dmrg_to_qc.py``) without their interactive prompts: emits the
same .npz schema and native-gate .qasm warm-start circuits under
data/mol_data and data/init_state_circ.

Usage:
  python scripts/generate_data.py --ham heisenberg --qubits 5 --tn_bond 2
  python scripts/generate_data.py --ham tfim_j1_h0.05 --qubits 6 --tn_bond 2
  python scripts/generate_data.py --ham H2O --qubits 8 --tn_bond 2 \
      --from-npz <existing .npz with paulis/weights>   # circuits for
                                                       # molecular data
"""

import argparse
import logging
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from tensorrl_qas_tpu.problems.hamiltonians import (  # noqa: E402
    heisenberg_hamiltonian,
    problem_npz_name,
    save_problem_npz,
    tfim_hamiltonian,
    warmstart_qasm_name,
)
from tensorrl_qas_tpu.tn.pipeline import build_warmstart  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ham", type=str, default="heisenberg")
    p.add_argument("--qubits", type=int, default=5)
    p.add_argument("--tn_bond", type=int, default=2)
    p.add_argument("--layers", type=int, default=2,
                   help="brickwork layers for the warm-start circuit")
    p.add_argument("--maxiter", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--geometry", type=str, default="")
    p.add_argument("--mapping", type=str, default="jordan_wigner")
    p.add_argument("--from-npz", type=str, default=None,
                   help="use paulis/weights from an existing .npz")
    p.add_argument("--out", type=str, default="data")
    p.add_argument("--basis", choices=["cnot", "su4"], default="cnot",
                   help="warm-start gate basis: 3 CNOTs/brick vs "
                        "RXX/RYY/RZZ (the reference driver's SU4 flag)")
    p.add_argument("--pickle", action="store_true",
                   help="also emit the reference's .p pickle twin "
                        "(making_molecules.py:138-140 dumps both)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    out = pathlib.Path(args.out)
    (out / "mol_data").mkdir(parents=True, exist_ok=True)
    (out / "init_state_circ").mkdir(parents=True, exist_ok=True)

    if args.from_npz:
        raw = np.load(args.from_npz, allow_pickle=True)
        if "paulis" in raw.files:
            paulis = [str(x) for x in raw["paulis"]]
            weights = np.asarray(np.real(raw["weights"]), dtype=np.float64)
        else:
            # dense-only schema (e.g. LIH_4q parity file)
            from tensorrl_qas_tpu.problems.hamiltonians import pauli_decompose
            from tensorrl_qas_tpu.utils.bits import bit_reversal_permutation
            dense = np.asarray(raw["hamiltonian"]).astype(np.complex128)
            perm = bit_reversal_permutation(args.qubits)
            paulis, weights = pauli_decompose(dense[np.ix_(perm, perm)])
    elif args.ham == "heisenberg":
        paulis, weights = heisenberg_hamiltonian(args.qubits)
    elif args.ham.startswith("tfim"):
        h = float(args.ham.split("_h")[-1]) if "_h" in args.ham else 0.05
        paulis, weights = tfim_hamiltonian(args.qubits, j=1.0, h=h)
    else:
        raise SystemExit(
            f"unknown --ham {args.ham!r}; for molecules pass --from-npz "
            "(molecular integral generation requires an external qchem "
            "package, reference making_molecules.py)")

    npz_rel = problem_npz_name(args.ham, args.qubits, args.geometry,
                               args.mapping)
    npz_path = out / npz_rel
    if not args.from_npz:
        if args.qubits > 13:   # n=14 dense eigvalsh is ~4e12 flops: hours
            # dense diagonalization infeasible: DMRG extremal eigenvalues
            # (partial eigvals are schema-legal; min/max_eig is all the
            # loader consumes)
            from tensorrl_qas_tpu.tn.dmrg import gs_dmrg
            from tensorrl_qas_tpu.tn.mpo import mpo_from_paulis

            # chi caps the local two-site problem: chi_e = clip(4*tn_bond,
            # 8, 16), i.e. chi 8 for the shipped tn_bond=2 problems and at
            # most 16 — the dense eigh per site stays seconds even at
            # n ~ 24 (chi = 32 would mean 4096-dim solves: hours).  The
            # resulting E_min is a variational *upper bound* at that chi,
            # still far tighter than the chi = 2 warm start it normalizes
            # rewards against; the chi used is recorded in the npz
            # (eigvals_method) so error numbers are interpretable.
            chi_e = min(max(args.tn_bond * 4, 8), 16)
            e_min = gs_dmrg(mpo_from_paulis(paulis, weights),
                            chi=chi_e, seed=args.seed)[0]
            e_max = -gs_dmrg(
                mpo_from_paulis(paulis, [-w for w in weights]),
                chi=chi_e, seed=args.seed)[0]
            save_problem_npz(str(npz_path), paulis, weights,
                             eigvals=[e_min, e_max],
                             eigvals_method=f"dmrg_chi{chi_e}")
        else:
            save_problem_npz(str(npz_path), paulis, weights)
        print(f"wrote {npz_path}")
    if args.pickle:
        from tensorrl_qas_tpu.problems.hamiltonians import save_problem_pickle

        p_path = str(npz_path)[:-len(".npz")] + ".p"
        kw = {}
        if args.from_npz and "eigvals" in raw.files:
            kw["eigvals"] = np.real(np.asarray(raw["eigvals"]))
        elif args.qubits > 13:
            kw["eigvals"] = [e_min, e_max]  # DMRG extremal pair from above
        save_problem_pickle(p_path, paulis, weights, **kw)
        print(f"wrote {p_path}")

    res = build_warmstart(paulis, weights, chi=args.tn_bond,
                          n_layers=args.layers, maxiter=args.maxiter,
                          seed=args.seed, basis=args.basis)
    qasm_rel = warmstart_qasm_name(args.ham, args.qubits, args.tn_bond,
                                   args.geometry, args.mapping)
    if args.basis == "su4":
        qasm_rel = qasm_rel.replace(".qasm", "_su4.qasm")
    qasm_path = out / qasm_rel
    qasm_path.write_text(res.qasm)
    print(f"wrote {qasm_path}")
    print(f"E_dmrg={res.e_dmrg:.8f} E_circuit={res.e_circuit:.8f} "
          f"E_exact={res.e_exact} overlap={res.overlap:.6f} "
          f"cnots={res.cnot_count} rots={res.rotation_count} "
          f"depth={res.depth}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
