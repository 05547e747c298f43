"""On-TPU validation of the v2 (2D-tiled) mega-kernel's in-kernel noise.

Compiles and runs the depolarizing-trajectory variant at n = 11 (D = 2048,
the v2 regime) on real hardware: checks finite energies, stream
divergence at high p, and p = 0 == noiseless equality.

    python scripts/validate_v2_noise.py
"""

import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

if __name__ == "__main__":
    import jax

    from tensorrl_qas_tpu.utils.compcache import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS before backend lookup
    if jax.default_backend() == "cpu":
        print("ERROR: no TPU backend available", file=sys.stderr)
        sys.exit(1)
    import numpy as np
    import jax.numpy as jnp

    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.apply import zero_state
    from tensorrl_qas_tpu.sim.expectation import PauliSum
    from test_pallas_apply import random_tape

    n = 11
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape = random_tape(n, 30, seed=1)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    n_env = 8
    arrs_b = tuple(np.tile(np.asarray(a)[None], (n_env, 1))
                   for a in tape.arrays())
    x0_b = np.tile(tape.x0().astype(np.float32)[None], (n_env, 1))
    map_idx = np.tile(np.arange(x0_b.shape[1], dtype=np.int32)[None],
                      (n_env, 1))
    nact = [tape.n_rots] * n_env
    keys = jax.random.split(jax.random.PRNGKey(0), n_env)

    def opt_for(p1, p2, mode):
        o = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=3,
                           n_starts=2, dtype=jnp.complex64,
                           noise_mode=mode, noise_p1=p1, noise_p2=p2,
                           use_pallas=True)
        o.noise_resample = "iter"
        o.pallas_engine = "v2"
        o._pauli_obj = ps
        assert o._pick_engine() == "v2", "v2 engine not selected"
        return o

    _, e_hi, _ = opt_for(0.3, 0.5, "depolarizing").fused_step_batch(
        psi0_ri, arrs_b, x0_b, nact, arrs_b, map_idx, keys)
    assert np.isfinite(e_hi).all(), e_hi
    assert np.std(e_hi) > 0, "in-kernel streams did not diverge"

    _, e0, _ = opt_for(0.0, 0.0, "depolarizing").fused_step_batch(
        psi0_ri, arrs_b, x0_b, nact, arrs_b, map_idx, keys)
    _, ec, _ = opt_for(0.0, 0.0, "none").fused_step_batch(
        psi0_ri, arrs_b, x0_b, nact, arrs_b, map_idx, keys)
    np.testing.assert_allclose(e0, ec, atol=1e-5)
    print(f"v2 in-kernel noise at n={n}: OK "
          f"(p=0 == noiseless; high-p spread {np.std(e_hi):.4f})")
