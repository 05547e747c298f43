"""2D-tiled mega-kernel (ops/pallas_opt2d.py) vs the XLA path.

All tests run the kernel in interpret mode on CPU; the same kernel
compiles via Mosaic on TPU. Covers: flip-group precompute exactness,
forward energy (iters=0), full fused optimization landing, and the n=11
regime that the v1 kernel cannot reach.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrl_qas_tpu.ops.pallas_opt2d import (
    fused_adam_step_pallas2d,
    pauli_flip_groups,
)
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.problems.hamiltonians import heisenberg_hamiltonian
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum
from tests.test_pallas_apply import random_tape


def _setup(n, gates, seed, iters, n_starts, engine):
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    opt = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=iters,
                         n_starts=n_starts, dtype=jnp.complex64,
                         use_pallas=engine != "off")
    opt.pallas_interpret = True
    opt.pallas_engine = engine if engine != "off" else "auto"
    opt._pauli_obj = ps
    tape = random_tape(n, gates, seed=seed)
    arrs = tuple(np.asarray(a) for a in tape.arrays())
    x0 = tape.x0().astype(np.float32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    return ps, opt, tape, arrs, x0, psi0_ri


def test_flip_groups_reconstruct_hamiltonian():
    """sum_f diag-embedded W_f x XOR-perm_f must equal the dense H."""
    n = 7
    paulis, weights = heisenberg_hamiltonian(n)
    ps = PauliSum.from_strings(paulis, weights, n)
    wre, wim, flips = pauli_flip_groups(ps)
    d = 1 << n
    h = np.zeros((d, d), dtype=np.complex128)
    idx = np.arange(d)
    for g, f in enumerate(flips):
        w = (wre[g] + 1j * wim[g]).reshape(-1)
        h[idx, idx ^ f] += w
    np.testing.assert_allclose(h, ps.to_dense(), atol=1e-6)


@pytest.mark.parametrize("n", [7, 8])
def test_v2_energy_matches_xla_at_iters_zero(n):
    """iters=0, 1 start: x_opt == x0 and e_new == XLA energy at the
    remapped x0 (exercises forward + grouped-Pauli energy only)."""
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 24, seed=n, iters=0,
                                              n_starts=1, engine="v2")
    map_idx = np.arange(len(x0), dtype=np.int32)
    key = jax.random.PRNGKey(5)
    jarrs = tuple(map(jnp.asarray, arrs))
    x2, e2, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                               map_idx, key)
    np.testing.assert_allclose(x2, x0, atol=1e-6)
    opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64)
    e_ref = opt_ref.energy(psi0_ri, jarrs, x0)
    assert e2 == pytest.approx(e_ref, abs=2e-5)


@pytest.mark.slow
def test_v2_descends_and_lands_with_xla():
    """Full fused step: v2 must land at a comparable minimum to the XLA
    multi-start Adam, and its reported energy must equal the XLA energy
    at its own solution (gradient correctness end-to-end)."""
    n = 8
    ps, opt2, tape, arrs, x0, psi0_ri = _setup(n, 20, seed=2, iters=30,
                                               n_starts=3, engine="v2")
    _, opt_x, _, _, _, _ = _setup(n, 20, seed=2, iters=30, n_starts=3,
                                  engine="off")
    opt_x.use_pallas = False
    map_idx = np.arange(len(x0), dtype=np.int32)
    key = jax.random.PRNGKey(11)
    jarrs = tuple(map(jnp.asarray, arrs))
    x1, e1, _ = opt_x.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                 map_idx, key)
    x2, e2, _ = opt2.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                map_idx, key)
    assert e2 == pytest.approx(e1, abs=0.2)
    e_check = opt_x.energy(psi0_ri, jarrs, x2)
    assert e2 == pytest.approx(e_check, abs=1e-3)
    # and optimization actually helped vs the warm start
    e_start = opt_x.energy(psi0_ri, jarrs, x0)
    assert e2 < e_start + 1e-6


@pytest.mark.slow
def test_v2_beyond_v1_ceiling_n11():
    """n=11 (D=2048) exceeds the v1 dense-H VMEM wall; v2 must still agree
    with the XLA energy (small tape, iters=0 to keep interpret-mode CI
    time bounded)."""
    n = 11
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 12, seed=4, iters=0,
                                              n_starts=1, engine="v2")
    map_idx = np.arange(len(x0), dtype=np.int32)
    jarrs = tuple(map(jnp.asarray, arrs))
    x2, e2, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                               map_idx, jax.random.PRNGKey(1))
    opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64)
    e_ref = opt_ref.energy(psi0_ri, jarrs, x0)
    assert e2 == pytest.approx(e_ref, abs=1e-4)


def test_engine_auto_selection():
    """auto = v1 below 1024, v2 above (when the pauli object is wired)."""
    for n, want in [(8, "v1"), (11, "v2")]:
        paulis, weights = heisenberg_hamiltonian(n)
        ps = PauliSum.from_strings(paulis, weights, n)
        opt = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64, use_pallas=True)
        opt._pauli_obj = ps
        assert opt._pick_engine() == want


@pytest.mark.slow
def test_v3_streamed_w_matches_resident():
    """stream_w=True (W planes DMA'd from HBM per group) must reproduce
    the VMEM-resident kernel bit-for-bit at n=8 — same flip groups, same
    roll chain, only the W residency differs."""
    n = 8
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 20, seed=6, iters=5,
                                              n_starts=2, engine="v2")
    assert opt._mega2d_ready() and not opt._w2d_stream
    map_idx = np.arange(len(x0), dtype=np.int32)
    jarrs = tuple(map(jnp.asarray, arrs))
    key = jax.random.PRNGKey(7)
    x_res, e_res, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots,
                                     jarrs, map_idx, key)
    opt._w2d_stream = True
    x_str, e_str, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots,
                                     jarrs, map_idx, key)
    np.testing.assert_allclose(x_str, x_res, atol=1e-6)
    assert e_str == pytest.approx(e_res, abs=1e-6)


@pytest.mark.slow
def test_v3_beyond_v2_ceiling_n13():
    """n=13 (D=8192) exceeds the round-2 v2 cap (MAX_DIM_2D was 4096);
    the extended kernel must agree with the XLA energy."""
    n = 13
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 12, seed=5, iters=0,
                                              n_starts=1, engine="v2")
    assert opt._mega2d_ready()
    map_idx = np.arange(len(x0), dtype=np.int32)
    jarrs = tuple(map(jnp.asarray, arrs))
    x2, e2, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                               map_idx, jax.random.PRNGKey(1))
    opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64)
    e_ref = opt_ref.energy(psi0_ri, jarrs, x0)
    assert e2 == pytest.approx(e_ref, abs=1e-4)


@pytest.mark.parametrize("n", [17, 18])
@pytest.mark.slow
def test_v3plus_beyond_v3_ceiling(n):
    """n=17/18 (D=131072/262144) exceed the round-3 v3 cap (MAX_DIM_2D
    was 65536); the extended kernel must agree with the XLA energy."""
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 10, seed=9, iters=0,
                                              n_starts=1, engine="v2")
    assert opt._mega2d_ready()
    assert opt._w2d_stream  # D > 32768 always streams its W planes
    map_idx = np.arange(len(x0), dtype=np.int32)
    jarrs = tuple(map(jnp.asarray, arrs))
    x2, e2, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                               map_idx, jax.random.PRNGKey(1))
    opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64)
    e_ref = opt_ref.energy(psi0_ri, jarrs, x0)
    assert e2 == pytest.approx(e_ref, abs=1e-4)


def test_v3_budget_selection():
    """Engine selection does the VMEM arithmetic with the PER-CALL start
    count: n=14 heisenberg is v2-resident; n=16 streams its W planes;
    start counts past the per-call S*R wall (MAX_SR_ROWS, the measured
    v5e Mosaic register-spill limit) are host-chunked rather than
    rejected, so the whole n<=18 band stays on the v2 kernel at any S."""
    for n, n_starts, want, want_stream in [(14, 8, "v2", False),
                                           (16, 8, "v2", True),
                                           (16, 4, "v2", True),
                                           (17, 8, "v2", True),
                                           (17, 16, "v2", True),
                                           (18, 4, "v2", True),
                                           (18, 8, "v2", True)]:
        paulis, weights = heisenberg_hamiltonian(n)
        ps = PauliSum.from_strings(paulis, weights, n)
        opt = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             n_starts=n_starts, dtype=jnp.complex64,
                             use_pallas=True)
        opt._pauli_obj = ps
        assert opt._pick_engine() == want, (n, n_starts)
        if want_stream is not None and want == "v2":
            assert opt._w2d_stream == want_stream


@pytest.mark.slow
def test_start_chunking_matches_unchunked(monkeypatch):
    """Past the per-call S*R wall the host splits starts across kernel
    calls and keeps the lowest post-action energy.  The unchunked
    winner (best pre-action start) is some chunk's winner too, so the
    chunked e_new can only improve on the unchunked one; both paths
    must stay on the v2 engine and produce finite angles."""
    import tensorrl_qas_tpu.ops.pallas_opt2d as opt2d

    n = 8
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, 12, seed=5, iters=2,
                                              n_starts=4, engine="v2")
    map_idx = np.arange(len(x0), dtype=np.int32)
    jarrs = tuple(map(jnp.asarray, arrs))
    key = jax.random.PRNGKey(3)
    x_u, e_u, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                 map_idx, key)

    # r_rows = 2 at n=8; cap S*R at 4 rows -> s_cap = 2 -> 2 chunks
    monkeypatch.setattr(opt2d, "MAX_SR_ROWS", 4)
    ps2, opt2, _, _, _, _ = _setup(n, 12, seed=5, iters=2, n_starts=4,
                                   engine="v2")
    x_c, e_c, _ = opt2.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                                  map_idx, key)
    assert np.all(np.isfinite(x_c))
    assert e_c <= e_u + 1e-5, (e_c, e_u)

    # non-dividing S pads by repeating starts (2 chunks of 2 for S=3)
    ps3, opt3, _, _, _, _ = _setup(n, 12, seed=5, iters=2, n_starts=3,
                                   engine="v2")
    x_c5, e_c5, _ = opt3.fused_step(psi0_ri, jarrs, x0, tape.n_rots,
                                    jarrs, map_idx, key)
    assert np.all(np.isfinite(x_c5)) and np.isfinite(e_c5)


@pytest.mark.slow
def test_v2_dynamic_group_path():
    """Molecular Hamiltonians exceed the 32-group static-unroll cap and
    take the fori_loop path with runtime flip masks; it must agree with
    the XLA energy (synthetic many-group Hamiltonian at n=7)."""
    n = 7
    rng = np.random.default_rng(3)
    seen = {}
    while len(seen) < 48:  # 48 distinct flip masks > the 32-group cap
        s = "".join(rng.choice(list("IXYZ"), size=n))
        if s != "I" * n:
            seen.setdefault(s, float(rng.normal()))
    ps = PauliSum.from_strings(list(seen), np.asarray(list(seen.values())),
                               n)
    assert len(set(np.asarray(ps.flip).tolist())) > 32
    opt = AngleOptimizer(ps.device_arrays(jnp.complex64), iters=0,
                         n_starts=1, dtype=jnp.complex64, use_pallas=True)
    opt.pallas_interpret = True
    opt.pallas_engine = "v2"
    opt._pauli_obj = ps
    tape = random_tape(n, 16, seed=9)
    arrs = tuple(np.asarray(a) for a in tape.arrays())
    x0 = tape.x0().astype(np.float32)
    map_idx = np.arange(len(x0), dtype=np.int32)
    psi0 = zero_state(n, jnp.complex64)
    psi0_ri = (np.real(psi0).astype(np.float32),
               np.imag(psi0).astype(np.float32))
    jarrs = tuple(map(jnp.asarray, arrs))
    _, e2, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs,
                              map_idx, jax.random.PRNGKey(2))
    opt_ref = AngleOptimizer(ps.device_arrays(jnp.complex64),
                             dtype=jnp.complex64)
    e_ref = opt_ref.energy(psi0_ri, jarrs, x0)
    assert e2 == pytest.approx(e_ref, abs=1e-4)


@pytest.mark.slow
def test_v2_per_env_psi0_matches_shared():
    """Per-env psi0 blocks (block-coordinate trainable mode) through the
    v2 kernel: B envs each given the SAME psi0 as a (B, D) batch must
    reproduce the shared-plane result exactly; distinct per-env psi0
    must match per-env XLA references."""
    import jax

    n, gates, iters, s = 7, 10, 2, 2
    ps, opt, tape, arrs, x0, psi0_ri = _setup(n, gates, 0, iters, s, "v2")
    assert opt._pick_engine() == "v2"
    b = 3
    keys = jax.random.split(jax.random.PRNGKey(5), b)
    old_b = tuple(np.tile(a[None], (b, 1)) for a in arrs)
    x0_b = np.tile(x0[None], (b, 1))
    nact = np.full(b, tape.n_rots)
    mapidx = np.tile(np.arange(len(x0), dtype=np.int32)[None], (b, 1))

    # shared plane
    x_s, e_s, _ = opt.fused_step_batch(psi0_ri, old_b, x0_b, nact, old_b,
                                       mapidx, keys)
    # identical psi0 rows as a per-env batch
    psi_b = (np.tile(psi0_ri[0][None], (b, 1)),
             np.tile(psi0_ri[1][None], (b, 1)))
    x_p, e_p, _ = opt.fused_step_batch(psi_b, old_b, x0_b, nact, old_b,
                                       mapidx, keys)
    np.testing.assert_allclose(e_p, e_s, atol=1e-5)
    np.testing.assert_allclose(x_p, x_s, atol=1e-5)

    # genuinely distinct per-env psi0, n_starts=1 (start 0 is the exact
    # warm start, no restart noise) so batched-vs-single is deterministic
    _, opt1, _, _, _, _ = _setup(n, gates, 0, iters, 1, "v2")
    rng = np.random.default_rng(1)
    v = rng.normal(size=(b, 1 << n)) + 1j * rng.normal(size=(b, 1 << n))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    psi_d = (v.real.astype(np.float32), v.imag.astype(np.float32))
    x_d, e_d, _ = opt1.fused_step_batch(psi_d, old_b, x0_b, nact, old_b,
                                        mapidx, keys)
    for i in range(b):
        x_i, e_i, _ = opt1.fused_step_batch(
            (psi_d[0][i], psi_d[1][i]),
            tuple(a[i:i + 1] for a in old_b), x0_b[i:i + 1], nact[i:i + 1],
            tuple(a[i:i + 1] for a in old_b), mapidx[i:i + 1],
            keys[i:i + 1])
        np.testing.assert_allclose(e_d[i], e_i[0], atol=1e-5)
        np.testing.assert_allclose(x_d[i], x_i[0], atol=1e-5)


@pytest.mark.slow
def test_v2_pmul_matches_roll_path():
    """TRLQAS_V2_PMUL=1 (lane-bit partner exchanges as exact MXU
    permutation matmuls — VERDICT r4 item 2) must reproduce the roll
    path's fused-step landing.  Env flag resolves per process, so each
    variant runs in a fresh subprocess (CPU interpret mode)."""
    import json
    import os
    import subprocess
    import sys

    code = r"""
import json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, ".")
from tests.test_pallas_opt2d import _setup
n, gates, iters, s = 8, 18, 6, 2
ps, opt, tape, arrs, x0, psi0_ri = _setup(n, gates, 3, iters, s, "v2")
map_idx = np.arange(len(x0), dtype=np.int32)
jarrs = tuple(map(jnp.asarray, arrs))
x, e, _ = opt.fused_step(psi0_ri, jarrs, x0, tape.n_rots, jarrs, map_idx,
                         jax.random.PRNGKey(9))
print(json.dumps({"x": np.asarray(x).tolist(), "e": float(e)}))
"""
    outs = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for flag in ("0", "1"):
        env = dict(os.environ, TRLQAS_V2_PMUL=flag, JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=300,
                           cwd=root)
        assert r.returncode == 0, r.stderr[-2000:]
        outs[flag] = json.loads(r.stdout.strip().splitlines()[-1])
    assert outs["1"]["e"] == pytest.approx(outs["0"]["e"], abs=2e-5)
    np.testing.assert_allclose(outs["1"]["x"], outs["0"]["x"], atol=2e-5)
