"""Per-gate-class cost probe for the v1 mega-kernel's dispatch.

Times the fused-step per-iteration slope (100-iter minus 25-iter call,
divided by 75) for tapes made of a single gate class, plus the mixed
roofline tape.  Used to validate the gate-kind-specialized dispatch in
ops/pallas_apply.py (_apply_gate_fast / _bwd_gate_fast): padding must be
near-free, diagonals must beat permutation/rotation classes (no
XOR-partner rolls), and X/CX must beat rotations (no angle select/trig).

Run on a quiet chip; host contention inflates slopes ~2x.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum


def tape_all(n, g_cap, kind):
    t = GateTape(n, g_cap, g_cap)
    if kind is not None:
        for g in range(g_cap):
            if kind == GateKind.CX:
                t.add_cx(g % n, (g + 1) % n)
            else:
                t.add(kind, target=g % n, angle=0.1 * g)
    return t


def tape_mixed(n, g_cap):
    """The roofline shape: RY layer, CX ladder, RZ layer, repeat."""
    t = GateTape(n, g_cap, g_cap)
    g = 0
    while g < g_cap:
        for q in range(n):
            if g >= g_cap:
                break
            t.add(GateKind.RY, target=q, angle=0.1 * g)
            g += 1
        for q in range(n - 1):
            if g >= g_cap:
                break
            t.add_cx(q, q + 1)
            g += 1
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--gates", type=int, default=40)
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--starts", type=int, default=8)
    args = ap.parse_args()
    n, g_cap, n_env, s = args.n, args.gates, args.envs, args.starts

    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    psi = zero_state(n, jnp.complex64)
    psi0 = (np.real(psi).astype(np.float32), np.imag(psi).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def slope(tape):
        arrs = tuple(map(jnp.asarray, tape.arrays()))
        x0 = tape.x0().astype(np.float32)
        map_idx = np.arange(len(x0), dtype=np.int32)
        out = []
        for iters in (25, 100):
            opt = AngleOptimizer(ps.device_arrays(jnp.complex64),
                                 iters=iters, n_starts=s,
                                 dtype=jnp.complex64, use_pallas=True)
            opt._pauli_obj = ps
            old_b = tuple(np.broadcast_to(
                np.asarray(a), (n_env,) + np.asarray(a).shape) for a in arrs)
            x0_b = np.broadcast_to(x0, (n_env, len(x0)))
            map_b = np.broadcast_to(map_idx, (n_env, len(map_idx)))
            keys = np.asarray(jax.random.split(key, n_env))
            rots = [tape.n_rots] * n_env
            opt.fused_step_batch(psi0, old_b, x0_b, rots, old_b, map_b, keys)
            t0 = time.time()
            for _ in range(3):
                opt.fused_step_batch(psi0, old_b, x0_b, rots, old_b,
                                     map_b, keys)
            out.append((time.time() - t0) / 3)
        return (out[1] - out[0]) / 75

    rows = [("pad", tape_all(n, g_cap, None)),
            ("rz", tape_all(n, g_cap, GateKind.RZ)),
            ("cx", tape_all(n, g_cap, GateKind.CX)),
            ("rx", tape_all(n, g_cap, GateKind.RX)),
            ("mixed", tape_mixed(n, g_cap))]
    for name, tape in rows:
        print(f"{name}: {slope(tape) * 1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
