"""Vendor upstream molecular problem data into the repo data/ tree.

The molecular .npz files (Hamiltonian Pauli coefficients, dense matrix,
eigenvalues) and warm-start .qasm circuits are *data artifacts* produced by
the reference's offline stage 0/1 (``dmrg-to-qc/making_molecules.py``,
``dmrg-to-qc/dmrg_to_qc.py``) — regenerating them bit-exactly requires the
exact upstream qchem stack (pennylane+pyscf), which this environment does
not ship. This script re-emits them from a TensorRL-QAS checkout into
data/ so nothing resolves through an external mount at runtime.

Stored ``eigvals`` are preserved VERBATIM: min_eig/max_eig (and therefore
reward normalization) are defined from the stored values, which for some
files are partial sparse-solver output (``environment_qulacs.py:106-112``,
see load_problem). Each re-emitted file is cross-checked: the pauli/weight
decomposition must reproduce the stored dense matrix after endianness
conversion.

Usage:
  python scripts/vendor_mol_data.py --reference /root/reference/dmrg-to-qc
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tensorrl_qas_tpu.problems.hamiltonians import pauli_decompose  # noqa: E402
from tensorrl_qas_tpu.sim.expectation import PauliSum  # noqa: E402
from tensorrl_qas_tpu.utils.bits import bit_reversal_permutation  # noqa: E402


def check_npz(raw) -> str:
    """Cross-check dense vs pauli representations; return a status note."""
    if "hamiltonian" not in raw.files:
        return "no dense matrix, skipped check"
    dense = np.asarray(raw["hamiltonian"]).astype(np.complex128)
    n = int(np.log2(dense.shape[0]))
    perm = bit_reversal_permutation(n)
    dense_le = dense[np.ix_(perm, perm)]
    if "paulis" in raw.files:
        ps = PauliSum.from_strings([str(p) for p in raw["paulis"]],
                                   np.real(np.asarray(raw["weights"])), n)
        err = np.max(np.abs(ps.to_dense() - dense_le))
        return f"pauli-vs-dense max err {err:.2e}"
    # dense-only file: verify our decomposition round-trips
    paulis, weights = pauli_decompose(dense_le)
    ps = PauliSum.from_strings(paulis, weights, n)
    err = np.max(np.abs(ps.to_dense() - dense_le))
    return f"dense-only ({len(paulis)} terms recovered), round-trip err {err:.2e}"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reference", type=str,
                   default="/root/reference/dmrg-to-qc",
                   help="path to a TensorRL-QAS checkout's dmrg-to-qc/ dir")
    p.add_argument("--out", type=str,
                   default=str(pathlib.Path(__file__).resolve().parents[1]
                               / "data"))
    args = p.parse_args()
    ref = pathlib.Path(args.reference)
    out = pathlib.Path(args.out)
    if not ref.exists():
        raise SystemExit(f"reference data dir {ref} not found")
    (out / "mol_data").mkdir(parents=True, exist_ok=True)
    (out / "init_state_circ").mkdir(parents=True, exist_ok=True)

    for src in sorted((ref / "mol_data").glob("*.npz")):
        dst = out / "mol_data" / src.name
        raw = np.load(src, allow_pickle=True)
        note = check_npz(raw)
        # re-emit key-for-key (np.savez, uncompressed like upstream)
        np.savez(dst, **{k: raw[k] for k in raw.files})
        print(f"vendored {dst.name}: {note}")

    for src in sorted((ref / "init_state_circ").glob("*.qasm")):
        dst = out / "init_state_circ" / src.name
        if dst.exists():
            print(f"kept own  {dst.name}")
            continue
        dst.write_text(src.read_text())
        print(f"vendored {dst.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
