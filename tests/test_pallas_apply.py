"""Pallas fused gate-apply kernel vs the XLA gather path (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.ops.pallas_apply import apply_tape_pallas
from tensorrl_qas_tpu.sim.apply import apply_tape, zero_state


def random_tape(n, n_gates, seed):
    rng = np.random.default_rng(seed)
    tape = GateTape(n, n_gates, n_gates)
    kinds = [GateKind.RX, GateKind.RY, GateKind.RZ, GateKind.CX,
             GateKind.X, GateKind.Y, GateKind.Z, GateKind.H]
    for _ in range(n_gates):
        kind = rng.choice(kinds)
        if kind == GateKind.CX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add_cx(int(c), int(t))
        else:
            tape.add(kind, target=int(rng.integers(n)),
                     angle=float(rng.uniform(-np.pi, np.pi)))
    return tape


@pytest.mark.parametrize("n,gates", [
    pytest.param(3, 16, marks=pytest.mark.slow),
    (5, 40),
    pytest.param(8, 64, marks=pytest.mark.slow)])
def test_pallas_matches_xla(n, gates):
    tape = random_tape(n, gates, seed=n)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    batch = 4
    psi0 = jnp.tile(jnp.asarray(zero_state(n, jnp.complex64)), (batch, 1))

    out_p = apply_tape_pallas(psi0, *arrs, x, True)   # interpret mode
    out_x = jax.vmap(lambda p: apply_tape(p, *arrs, x))(psi0)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-6)
    # unitarity
    norms = np.sum(np.abs(np.asarray(out_p)) ** 2, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.slow
def test_pallas_gradients_flow():
    """custom_vjp backward (XLA adjoint) gives the same angle gradients."""
    n = 3
    tape = GateTape(n, 4, 4)
    tape.add(GateKind.RY, 0, angle=0.3)
    tape.add_cx(0, 1)
    tape.add(GateKind.RX, 2, angle=-0.8)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x = jnp.asarray(tape.x0().astype(np.float32))
    psi0 = jnp.asarray(zero_state(n, jnp.complex64))[None]

    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.expectation import PauliSum, pauli_expectation

    paulis, weights = heisenberg_hamiltonian(n)
    dev = PauliSum.from_strings(paulis, weights, n).device_arrays(jnp.complex64)

    def e_pallas(xx):
        psi = apply_tape_pallas(psi0, *arrs, xx, True)
        return pauli_expectation(psi, *dev)[0]

    def e_xla(xx):
        psi = apply_tape(psi0[0], *arrs, xx)
        return pauli_expectation(psi, *dev)

    g1 = jax.grad(e_pallas)(x)
    g2 = jax.grad(e_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.slow
def test_pallas_fused_step_matches_xla_path():
    """The optimizer's pallas fused step must agree with the XLA fused step
    (same seeds => same starts => same trajectory)."""
    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.expectation import PauliSum

    n = 4
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape_old = random_tape(n, 10, seed=0)
    # new tape = old + one rotation appended
    tape_new = random_tape(n, 10, seed=0)
    tape_new.capacity = 10
    arrs_old = tuple(np.asarray(a) for a in tape_old.arrays())
    arrs_new = tuple(np.asarray(a) for a in tape_new.arrays())
    x0 = tape_old.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)

    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    key = jax.random.PRNGKey(7)

    opt_x = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=3, dtype=jnp.complex64)
    opt_p = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=3, dtype=jnp.complex64, use_pallas=True)
    opt_p.pallas_interpret = True

    jarrs_old = tuple(map(jnp.asarray, arrs_old))
    jarrs_new = tuple(map(jnp.asarray, arrs_new))
    x1, e1, _ = opt_x.fused_step(psi0_ri, jarrs_old, x0, tape_old.n_rots,
                                 jarrs_new, map_idx, key)
    x2, e2, _ = opt_p.fused_step(psi0_ri, jarrs_old, x0, tape_old.n_rots,
                                 jarrs_new, map_idx, key)
    # same PRNG stream feeds different-shaped normal draws, so trajectories
    # are not bitwise identical; both must land at comparable minima
    assert e2 == pytest.approx(e1, abs=0.15)
    # and the pallas energy must equal the XLA energy AT the pallas solution
    e_check = opt_x.energy(psi0_ri, jarrs_new,
                           np.where(map_idx >= 0, x2[map_idx], 0.0))
    assert e2 == pytest.approx(e_check, abs=1e-4)


def test_mega_kernel_matches_xla_path():
    """The single-launch fused Adam kernel (ops/pallas_opt.py) must land at
    the same optima as the XLA fused path and report consistent energies."""
    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.expectation import PauliSum

    n = 4
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape = random_tape(n, 12, seed=3)
    arrs = tuple(np.asarray(a) for a in tape.arrays())
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    key = jax.random.PRNGKey(11)

    opt_x = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=30,
                           n_starts=4, dtype=jnp.complex64)
    opt_m = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=30,
                           n_starts=4, dtype=jnp.complex64, use_pallas=True)
    opt_m.pallas_interpret = True
    opt_m._pauli_obj = ps

    jarrs = tuple(map(jnp.asarray, arrs))
    x1, e1, _ = opt_x.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                 map_idx, key)
    x2, e2, _ = opt_m.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                 map_idx, key)
    assert e2 == pytest.approx(e1, abs=0.2)
    # mega energy must equal the XLA energy AT the mega solution
    e_check = opt_x.energy(psi0_ri, jarrs, x2)
    assert e2 == pytest.approx(e_check, abs=1e-3)


@pytest.mark.slow
def test_su4_composed_fused_step_matches_xla():
    """enable_2q + use_pallas (round 4): the su4 gate set rides the
    composed kernel's double-roll RXX/RYY/RZZ dispatch inside the fused
    step; _pick_engine must force 'composed' (mega-kernels are 1q+CX)
    and the landing energy must match the XLA path's."""
    from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
    from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
    from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
    from tensorrl_qas_tpu.sim.expectation import PauliSum

    n = 4
    rng = np.random.default_rng(2)
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    tape = GateTape(n, 10, 10)
    for _ in range(10):
        kind = rng.choice([GateKind.RX, GateKind.RY, GateKind.RZ,
                           GateKind.RXX, GateKind.RYY, GateKind.RZZ])
        ang = float(rng.uniform(-np.pi, np.pi))
        if kind >= GateKind.RXX:
            c, t = rng.choice(n, size=2, replace=False)
            tape.add(GateKind(kind), target=int(t), control=int(c), angle=ang)
        else:
            tape.add(GateKind(kind), target=int(rng.integers(n)), angle=ang)
    arrs = tuple(map(jnp.asarray, tape.arrays()))
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    key = jax.random.PRNGKey(5)

    opt_x = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=3, dtype=jnp.complex64, enable_2q=True)
    opt_p = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=25,
                           n_starts=3, dtype=jnp.complex64, enable_2q=True,
                           use_pallas=True)
    opt_p.pallas_interpret = True
    opt_p._pauli_obj = ps
    assert opt_p._pick_engine() == "composed"

    x1, e1, _ = opt_x.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs,
                                 map_idx, key)
    x2, e2, _ = opt_p.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs,
                                 map_idx, key)
    assert e2 < 0  # descended into the spectrum
    assert e2 == pytest.approx(e1, abs=0.15)
    e_check = opt_x.energy(psi0_ri, arrs,
                           np.where(map_idx >= 0, x2[map_idx], 0.0))
    assert e2 == pytest.approx(e_check, abs=1e-4)


@pytest.mark.slow
def test_su4_pmul_exchange_matches_roll_path():
    """TRLQAS_SU4_PMUL=1 (single permutation-matmul partner exchange for
    RXX/RYY — VERDICT r4 item 5) must reproduce the roll path's fused-step
    landing.  The flag is read at trace time, so each variant runs in a
    fresh subprocess (CPU interpret mode)."""
    import json
    import os
    import subprocess
    import sys

    code = r"""
import json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum

n = 4
rng = np.random.default_rng(7)
paulis, weights = heisenberg_hamiltonian(n)
ps = PauliSum.from_strings(paulis, weights, n)
tape = GateTape(n, 8, 8)
for _ in range(8):
    kind = rng.choice([GateKind.RY, GateKind.RXX, GateKind.RYY,
                       GateKind.RZZ])
    ang = float(rng.uniform(-np.pi, np.pi))
    if kind >= GateKind.RXX:
        c, t = rng.choice(n, size=2, replace=False)
        tape.add(GateKind(kind), target=int(t), control=int(c), angle=ang)
    else:
        tape.add(GateKind(kind), target=int(rng.integers(n)), angle=ang)
arrs = tuple(map(jnp.asarray, tape.arrays()))
x0 = tape.x0().astype(np.float32)
map_idx = np.arange(len(x0), dtype=np.int32)
psi0 = zero_state(n, jnp.complex64)
psi0_ri = (np.real(psi0).astype(np.float32),
           np.imag(psi0).astype(np.float32))
opt = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=15,
                     n_starts=2, dtype=jnp.complex64, enable_2q=True,
                     use_pallas=True)
opt.pallas_interpret = True
opt._pauli_obj = ps
x, e, _ = opt.fused_step(psi0_ri, arrs, x0, tape.n_rots, arrs, map_idx,
                         jax.random.PRNGKey(3))
print(json.dumps({"x": np.asarray(x).tolist(), "e": float(e)}))
"""
    outs = {}
    for flag in ("0", "1"):
        env = dict(os.environ, TRLQAS_SU4_PMUL=flag, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr[-2000:]
        outs[flag] = json.loads(r.stdout.strip().splitlines()[-1])
    assert outs["1"]["e"] == pytest.approx(outs["0"]["e"], abs=2e-5)
    np.testing.assert_allclose(outs["1"]["x"], outs["0"]["x"], atol=2e-5)
