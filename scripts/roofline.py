"""Utilization accounting for the fused mega-kernel (VERDICT r2 item 5).

The bench numbers prove "fast vs qulacs"; this measures how far the
kernel is from the chip's own ceiling.  Method: time the fused step at
two iteration counts and two env counts; the iters-slope isolates the
pure per-iteration compute from launch/transport latency, and the
env-slope shows how the per-env cost amortizes on the kernel grid.

From the slope we derive seconds per gate-application per amplitude and
compare with a VPU element-op bound: one roll-based gate apply touches
each of the S*D complex amplitudes with a ~20-flop f32 chain
(apply_coeffs: 8 mul + 6 add + 2 selects, plus the +/- roll pair), so a
v5e VPU at ~0.94 GHz x (8x128) lanes x ~2 f32 ops/lane/cycle
(~1.9 Tflop/s) bounds one gate-apply of an (S*R, 128) block at
  t_min ~= 20 * S * D / 1.9e12 s.
utilization = t_min / t_measured.  Everything is stated per assumption;
the output JSON carries the raw slopes so the numbers can be re-derived.

Run on the TPU: python scripts/roofline.py [--sizes 8,10,12,14]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

VPU_FLOPS = 1.9e12        # v5e VPU f32 bound (0.94 GHz x 1024 lanes x 2)
FLOPS_PER_ELEM_GATE = 20  # apply_coeffs chain per amplitude (fwd)
BWD_FACTOR = 2.5          # backward re-applies U^H and U^T + grad reduce


def measure(n: int, iters_lo: int, iters_hi: int, n_envs: int, s: int,
            gates: int):
    import jax
    import jax.numpy as jnp

    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.apply import zero_state
    from tensorrl_qas_tpu.sim.expectation import PauliSum
    from tests.test_pallas_apply import random_tape

    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape = random_tape(n, gates, seed=1)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi = zero_state(n, jnp.complex64)
    psi0 = (np.real(psi).astype(np.float32),
            np.imag(psi).astype(np.float32))
    key = __import__("jax").random.PRNGKey(0)

    def timed(iters, reps=5):
        opt = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=iters,
                             n_starts=s, dtype=jnp.complex64,
                             use_pallas=True)
        opt._pauli_obj = ps
        assert opt._pick_engine() in ("v1", "v2")
        b = n_envs
        old_b = tuple(np.broadcast_to(a, (b,) + a.shape) for a in
                      (np.asarray(x) for x in arrs))
        x0_b = np.broadcast_to(x0, (b, len(x0)))
        map_b = np.broadcast_to(map_idx, (b, len(map_idx)))
        keys = np.asarray(
            __import__("jax").random.split(key, b))
        opt.fused_step_batch(psi0, old_b, x0_b, [tape.n_rots] * b, old_b,
                             map_b, keys)   # compile+warm
        # min over reps, not mean: the tunneled transport has one-sided
        # latency spikes that inflate a single call by seconds (observed
        # at n=14), and min is the robust estimator under such noise
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            opt.fused_step_batch(psi0, old_b, x0_b, [tape.n_rots] * b,
                                 old_b, map_b, keys)
            best = min(best, time.time() - t0)
        return best

    t_lo = timed(iters_lo)
    t_hi = timed(iters_hi)
    slope = (t_hi - t_lo) / (iters_hi - iters_lo)   # s per Adam iter (all envs)
    d = 1 << n
    # per iter: forward + backward + final fwd amortized ~ (1 + BWD)x gates
    elem_ops = (1 + BWD_FACTOR) * FLOPS_PER_ELEM_GATE * gates * s * d * n_envs
    t_min = elem_ops / VPU_FLOPS
    return {
        "n_qubits": n, "n_envs": n_envs, "n_starts": s, "gates": gates,
        "t_call_lo_s": round(t_lo, 4), "t_call_hi_s": round(t_hi, 4),
        "iters": [iters_lo, iters_hi],
        "s_per_iter": round(slope, 6),
        "launch_overhead_s": round(t_lo - iters_lo * slope, 4),
        "elem_flops_per_iter": elem_ops,
        "achieved_gflops": round(elem_ops / slope / 1e9, 1),
        "vpu_bound_gflops": VPU_FLOPS / 1e9,
        "vpu_utilization_pct": round(100 * t_min / slope, 1),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="8,10,12,14")
    p.add_argument("--n_envs", type=int, default=16)
    p.add_argument("--n_starts", type=int, default=8)
    p.add_argument("--gates", type=int, default=40)
    p.add_argument("--out", default="results_longrun_r3/roofline.json")
    args = p.parse_args()
    out = []
    for n in (int(x) for x in args.sizes.split(",")):
        r = measure(n, 25, 100, args.n_envs, args.n_starts, args.gates)
        print(json.dumps(r), flush=True)
        out.append(r)
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
