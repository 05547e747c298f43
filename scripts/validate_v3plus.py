"""On-TPU validation of the v3+ mega-kernel band (n = 17, 18).

The interpret-mode differential tests (tests/test_pallas_opt2d.py)
already pin numerical agreement with the XLA path; this script answers
the two questions only real hardware can: does Mosaic compile the
kernel at D = 131072 / 262144 inside the scoped-VMEM limit, and what do
cold-compile and per-fused-step wall times look like at the budgeted
start counts (17q: S <= 8, 18q: S <= 4).

    python scripts/validate_v3plus.py [--sizes 17,18] [--iters 100]
"""

import argparse
import pathlib
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

if __name__ == "__main__":
    import jax

    from tensorrl_qas_tpu.utils.compcache import apply_platform_env

    # honor JAX_PLATFORMS before the first backend lookup — otherwise a
    # cpu run would initialize the (possibly hung) remote-TPU client just
    # to discover it should refuse
    apply_platform_env()
    if jax.default_backend() == "cpu":
        print("ERROR: no TPU backend available", file=sys.stderr)
        sys.exit(1)
    import numpy as np
    import jax.numpy as jnp

    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.expectation import PauliSum
    from tensorrl_qas_tpu.sim.apply import zero_state
    from test_pallas_apply import random_tape

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=str, default="17,18")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--gates", type=int, default=60)
    p.add_argument("--timed", type=int, default=5)
    args = p.parse_args()

    # (n, n_starts) rows: the largest budget-legal S per size plus a
    # halved-S comparison at 17q (mirrors the 16q S=4-vs-8 tradeoff)
    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        rows += [(n, 4)] if n >= 18 else [(n, 4), (n, 8)]

    def validate_row(n, s):
        from tensorrl_qas_tpu.ops.pallas_opt2d import MAX_SR_ROWS

        paulis, weights = heisenberg_hamiltonian(n)
        ps = PauliSum.from_strings(paulis, weights, n)
        tape = random_tape(n, args.gates, seed=2)
        arrs = tuple(map(jnp.asarray,
                         (np.asarray(a) for a in tape.arrays())))
        x0 = tape.x0().astype(np.float32)
        map_idx = np.arange(len(x0), dtype=np.int32)
        psi0 = zero_state(n, jnp.complex64)
        psi0_ri = (np.real(psi0).astype(np.float32),
                   np.imag(psi0).astype(np.float32))

        # 1) engine selection + forward-energy agreement vs the XLA path
        opt0 = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=0,
                              n_starts=1, dtype=jnp.complex64,
                              use_pallas=True)
        opt0._pauli_obj = ps
        assert opt0._pick_engine() == "v2", (n, opt0._pick_engine())
        assert opt0._w2d_stream, "expected HBM-streamed W planes"
        _, e_kern, _ = opt0.fused_step(psi0_ri, arrs, x0, tape.n_rots,
                                       arrs, map_idx, jax.random.PRNGKey(1))
        opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                                 dtype=jnp.complex64)
        e_ref = float(opt_ref.energy(psi0_ri, arrs, x0))
        de = abs(float(e_kern) - e_ref)
        ok = de < 1e-3 * max(1.0, abs(e_ref))
        print(f"n={n}: forward energy kernel={float(e_kern):+.6f} "
              f"xla={e_ref:+.6f} |d|={de:.2e} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)

        # 2) cold compile + steady-state fused step at (iters, S)
        opt = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             iters=args.iters, n_starts=s,
                             dtype=jnp.complex64, use_pallas=True)
        opt._pauli_obj = ps
        n_chunks = -(-s * ((1 << n) // 128) // MAX_SR_ROWS)
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        x1, e1, _ = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs,
                                   map_idx, key)
        jax.block_until_ready(e1)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(args.timed):
            _, e1, _ = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots,
                                      arrs, map_idx,
                                      jax.random.PRNGKey(i))
        jax.block_until_ready(e1)
        per_step = (time.time() - t0) / args.timed
        assert np.isfinite(float(e1)), (n, s, float(e1))
        print(f"n={n} S={s} iters={args.iters} "
              f"({n_chunks} kernel call(s)/step): cold {compile_s:.1f}s, "
              f"{per_step * 1e3:.0f} ms/fused-step, "
              f"E={float(e1):+.6f} (descended from {e_ref:+.6f})",
              flush=True)
        return ok

    failed = False
    for n, s in rows:
        try:
            failed |= not validate_row(n, s)
        except Exception as exc:  # noqa: BLE001 — isolate rows: one
            # size/S failure must not kill the remaining measurements
            failed = True
            print(f"n={n} S={s}: FAILED {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:300]}", flush=True)

    if failed:
        print("VALIDATION FAILED: kernel/XLA energy mismatch above",
              file=sys.stderr)
        sys.exit(1)
    print("all sizes validated OK", flush=True)
