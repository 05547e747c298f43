"""Minimal library usage: build a circuit, optimize its angles, read energy.

Shows the three layers a user composes directly (no RL driver):
problem -> gate tape -> on-device multi-start optimization.

Run: python examples/minimal_vqe.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum


def main() -> int:
    n = 4
    paulis, weights = heisenberg_hamiltonian(n)
    ham = PauliSum.from_strings(paulis, weights, n)
    e0 = float(np.linalg.eigvalsh(ham.to_dense())[0])

    # a small hardware-efficient ansatz: RY layer, CX ladder, RY layer
    tape = GateTape(n, capacity=16, rot_capacity=16)
    for q in range(n):
        tape.add(GateKind.RY, target=q, angle=0.1)
    for q in range(n - 1):
        tape.add_cx(q, q + 1)
    for q in range(n):
        tape.add(GateKind.RY, target=q, angle=0.1)

    opt = AngleOptimizer(ham.device_arrays(jnp.complex64),
                         iters=300, n_starts=8, lr=0.1)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    x, e, nfev = opt.optimize(
        psi0_ri, tuple(map(jnp.asarray, tape.arrays())), tape.x0(),
        tape.n_rots, jax.random.PRNGKey(0))
    print(f"ansatz energy {e:.6f} vs exact ground state {e0:.6f} "
          f"(gap {e - e0:.2e}, {nfev} evaluations)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
