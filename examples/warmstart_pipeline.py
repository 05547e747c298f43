"""Stage 0+1 in ten lines: Hamiltonian -> DMRG -> brickwork circuit -> QASM.

Run: python examples/warmstart_pipeline.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")   # offline stage; CPU is fine

from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.tn.pipeline import build_warmstart

paulis, weights = heisenberg_hamiltonian(5)
res = build_warmstart(paulis, weights, chi=2, n_layers=2, maxiter=1500)
print(f"DMRG E={res.e_dmrg:.5f}  circuit E={res.e_circuit:.5f}  "
      f"exact E={res.e_exact:.5f}")
print(f"{res.cnot_count} CNOTs, {res.rotation_count} rotations, "
      f"depth {res.depth}; overlap {res.overlap:.5f}")
print(res.qasm.splitlines()[0], "...")
