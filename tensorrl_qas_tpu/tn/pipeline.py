"""DMRG -> brickwork PQC -> native-gate QASM: the warm-start pipeline.

Non-interactive equivalent of the reference's stage-1 driver
(``dmrg-to-qc/dmrg_to_qc.py:137-223``): load a Pauli-sum Hamiltonian,
DMRG the ground state at bond dimension chi, fit a brickwork SU(4) circuit
to the MPS by Riemannian overlap maximization, lower every SU(4) brick to
3 CNOTs + rotations with our KAK synthesizer (replacing qiskit transpile),
and verify the emitted circuit's energy round-trips against the fitted
state (the reference's 1e-6 sanity check, ``dmrg_to_qc.py:303-315``).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.qasm import dump_qasm
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation
from tensorrl_qas_tpu.synth.kak import decompose_su4, decompose_su4_pauli
from tensorrl_qas_tpu.tn.circuit_fit import circuit_state, fit_mps_to_circuit
from tensorrl_qas_tpu.tn.dmrg import gs_dmrg, gs_exact_diag
from tensorrl_qas_tpu.tn.mpo import mpo_from_paulis

log = logging.getLogger(__name__)

CHEMICAL_ACCURACY = 1.6e-3  # Ha (reference mps2qc.py:147)


@dataclasses.dataclass
class WarmStartResult:
    tape: GateTape
    qasm: str
    e_dmrg: float
    e_circuit: float
    e_exact: float | None
    overlap: float
    cnot_count: int
    rotation_count: int
    depth: int


def su4_circuit_to_tape(params, pairs, n_qubits: int,
                        atol: float = 5e-7, basis: str = "cnot") -> GateTape:
    """Lower a list of SU(4) gates to a native-gate tape via KAK.

    ``basis='cnot'`` emits 3 CNOTs + rotations per brick; ``'su4'`` emits
    RXX/RYY/RZZ + local rotations (the reference's ``SU4`` stage-1 flag,
    ``dmrg-to-qc/dmrg_to_qc.py:203-206``)."""
    lower = decompose_su4 if basis == "cnot" else decompose_su4_pauli
    two_q = {"rxx": GateKind.RXX, "ryy": GateKind.RYY, "rzz": GateKind.RZZ}
    gates = []
    for u, (q_hi, q_lo) in zip(params, pairs):
        gs, _ = lower(np.asarray(u), q0=q_lo, q1=q_hi, atol=atol)
        gates.extend(gs)
    n_rot = sum(1 for g in gates if g[0] != "cx")
    tape = GateTape(n_qubits, max(len(gates), 1), max(n_rot, 1))
    for g in gates:
        if g[0] == "cx":
            tape.add_cx(g[1], g[2])
        elif g[0] in two_q:
            tape.add(two_q[g[0]], target=g[2], control=g[1], angle=g[3])
        else:
            tape.add({"rx": GateKind.RX, "ry": GateKind.RY,
                      "rz": GateKind.RZ}[g[0]], target=g[1], angle=g[2])
    return tape


def build_warmstart(paulis, weights, chi: int, n_layers: int,
                    maxiter: int = 2000, lr: float = 1e-2, seed: int = 0,
                    dmrg_sweeps: int = 6, check_exact: bool = True,
                    basis: str = "cnot") -> WarmStartResult:
    n = len(paulis[0])
    ps = PauliSum.from_strings(paulis, weights, n)
    mpo = mpo_from_paulis(paulis, weights)

    e_dmrg, mps = gs_dmrg(mpo, chi=chi, max_sweeps=dmrg_sweeps, seed=seed)

    e_exact = None
    if check_exact and n <= 12:
        e_exact, _ = gs_exact_diag(ps.to_dense())
        gap = e_dmrg - e_exact
        log.info("DMRG(chi=%d) E=%.8f, exact E=%.8f, gap=%.2e (%schemical "
                 "accuracy)", chi, e_dmrg, e_exact, gap,
                 "within " if gap < CHEMICAL_ACCURACY else "above ")

    params, pairs, overlap, _ = fit_mps_to_circuit(
        mps, n_layers=n_layers, maxiter=maxiter, lr=lr, seed=seed)
    log.info("circuit fit: %d SU(4) bricks, overlap |<qc|mps>| = %.6f",
             len(pairs), overlap)

    # energy of the fitted SU(4) circuit (pre-synthesis)
    dev = ps.device_arrays(jnp.complex128)
    psi_fit = circuit_state(jnp.asarray(params), pairs, n)
    e_fit = float(pauli_expectation(psi_fit, *dev))

    tape = su4_circuit_to_tape(params, pairs, n, basis=basis)
    psi_tape = apply_tape(zero_state(n, jnp.complex128),
                          *map(jnp.asarray, tape.arrays()),
                          jnp.asarray(tape.x0()), enable_2q=basis == "su4")
    e_circ = float(pauli_expectation(psi_tape, *dev))
    if abs(e_circ - e_fit) > 1e-6:
        raise RuntimeError(
            f"energy round-trip failed: fit {e_fit:.9f} vs synthesized "
            f"{e_circ:.9f} (reference tolerance 1e-6)")

    return WarmStartResult(
        tape=tape, qasm=dump_qasm(tape), e_dmrg=e_dmrg, e_circuit=e_circ,
        e_exact=e_exact, overlap=overlap, cnot_count=tape.cnot_count,
        rotation_count=tape.rotation_count, depth=tape.depth())
