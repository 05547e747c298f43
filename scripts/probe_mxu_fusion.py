"""MXU-vs-roll microbenchmark for the statevector gate apply (VERDICT r4
items 2 and 5).

The v2/v3 mega-kernels apply every gate through VPU roll/select chains;
round-4's roofline blamed exactly that data movement for the ~30%
utilization ceiling, and suggested (a) permutation-matmul partner
exchanges on the otherwise-idle MXU, and (b) folding runs of lane-bit
gates into one small unitary applied as a single matmul.

Candidate formulations, all exact (no bf16 rounding of the state):

  roll1q   — current cls_rx-style: +/- lane roll pair + select per gate.
  mxu1q    — partner = x @ P with P[i,j] = ((i XOR j) == 2^t) built from
             iotas in-kernel; uniform HIGHEST precision (bf16x split =
             exact f32; per-operand tuples are rejected by Mosaic).
  roll2q   — current su4 cls_r2q: TWO sequential dynamic XOR exchanges
             (4 rolls + selects) per RXX/RYY gate.
  mxu2q    — ONE matmul with P[i,j] = ((i XOR j) == (2^t XOR 2^c)): the
             double partner exchange collapses into a single permutation.
  fused1q  — fold K lane-bit rotations into one (S, 128, 128) complex
             matrix (K batched small matmuls to build, angle-dependent
             per start) and apply with ONE (SR, 128) x (128, 128) matmul
             per start block.

Run on the TPU:  python scripts/probe_mxu_fusion.py [--sr 1024] [--k 8]
Prints per-gate microseconds for each formulation and the speedup vs the
roll baseline; writes JSON with raw numbers.
"""

from __future__ import annotations

import argparse
import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 128


def _xor_roll(x, t):
    col = lax.broadcasted_iota(jnp.int32, (1, C), 1)
    s = 1 << jnp.maximum(t, 0)
    b = (col >> t) & 1
    return jnp.where(b == 1, pltpu.roll(x, s, 1),
                     pltpu.roll(x, (C - s) % C, 1))


def _perm_mat(m):
    """(C, C) f32 permutation: P[i, j] = ((i ^ j) == m)."""
    i = lax.broadcasted_iota(jnp.int32, (C, C), 0)
    j = lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return ((i ^ j) == m).astype(jnp.float32)


def _pmul(x, p):
    """Exact permutation matmul (uniform HIGHEST: Mosaic rejects
    per-operand precision tuples on real TPU; the bf16x split is exact
    for the 0/1 matrix operand regardless)."""
    return lax.dot_general(
        x, p, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def kernel_roll1q(tq_ref, x_ref, re_ref, im_ref, ore_ref, oim_ref, *, k_gates):
    re = re_ref[...]
    im = im_ref[...]
    col = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def gate(g, carry):
        re, im = carry
        t = tq_ref[g]
        th = x_ref[g]
        cth, sth = jnp.cos(0.5 * th), jnp.sin(0.5 * th)
        pre = _xor_roll(re, t)
        pim = _xor_roll(im, t)
        b = ((col >> t) & 1).astype(jnp.float32)
        fr = sth * (2.0 * b - 1.0)                    # RY form
        return cth * re + fr * pre, cth * im + fr * pim

    re, im = lax.fori_loop(0, k_gates, gate, (re, im))
    ore_ref[...] = re
    oim_ref[...] = im


def kernel_mxu1q(tq_ref, x_ref, re_ref, im_ref, ore_ref, oim_ref, *, k_gates):
    re = re_ref[...]
    im = im_ref[...]
    col = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def gate(g, carry):
        re, im = carry
        t = tq_ref[g]
        th = x_ref[g]
        cth, sth = jnp.cos(0.5 * th), jnp.sin(0.5 * th)
        p = _perm_mat(1 << t)
        pre = _pmul(re, p)
        pim = _pmul(im, p)
        b = ((col >> t) & 1).astype(jnp.float32)
        fr = sth * (2.0 * b - 1.0)
        return cth * re + fr * pre, cth * im + fr * pim

    re, im = lax.fori_loop(0, k_gates, gate, (re, im))
    ore_ref[...] = re
    oim_ref[...] = im


def kernel_roll2q(tq_ref, cq_ref, x_ref, re_ref, im_ref, ore_ref, oim_ref, *, k_gates):
    re = re_ref[...]
    im = im_ref[...]
    col = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    def gate(g, carry):
        re, im = carry
        t = tq_ref[g]
        c = cq_ref[g]
        th = x_ref[g]
        cth, sth = jnp.cos(0.5 * th), jnp.sin(0.5 * th)
        pre = _xor_roll(_xor_roll(re, t), c)
        pim = _xor_roll(_xor_roll(im, t), c)
        return cth * re + sth * pim, cth * im - sth * pre   # RXX form

    re, im = lax.fori_loop(0, k_gates, gate, (re, im))
    ore_ref[...] = re
    oim_ref[...] = im


def kernel_mxu2q(tq_ref, cq_ref, x_ref, re_ref, im_ref, ore_ref, oim_ref, *, k_gates):
    re = re_ref[...]
    im = im_ref[...]

    def gate(g, carry):
        re, im = carry
        t = tq_ref[g]
        c = cq_ref[g]
        th = x_ref[g]
        cth, sth = jnp.cos(0.5 * th), jnp.sin(0.5 * th)
        p = _perm_mat((1 << t) ^ (1 << c))
        pre = _pmul(re, p)
        pim = _pmul(im, p)
        return cth * re + sth * pim, cth * im - sth * pre

    re, im = lax.fori_loop(0, k_gates, gate, (re, im))
    ore_ref[...] = re
    oim_ref[...] = im


def kernel_fused1q(tq_ref, x_ref, re_ref, im_ref, ore_ref, oim_ref, *, k_gates):
    """Fold k_gates lane-bit RY gates into one (C, C) real matrix, then
    one matmul on the state (RY is real — worst case doubles for complex
    gate sets; measured here as the per-formulation floor)."""
    re = re_ref[...]
    im = im_ref[...]
    i = lax.broadcasted_iota(jnp.int32, (C, C), 0)
    j = lax.broadcasted_iota(jnp.int32, (C, C), 1)
    eye = (i == j).astype(jnp.float32)

    def build(g, m):
        t = tq_ref[g]
        th = x_ref[g]
        cth, sth = jnp.cos(0.5 * th), jnp.sin(0.5 * th)
        # RY on lane bit t as a (C, C) matrix: cos*I + sin*(2b-1)*P_t
        # acting from the right on row-vector states: M_g[j', j] with the
        # same orientation as the apply (x @ M accumulates gate after
        # gate when multiplied in application order M = M_1 @ M_2 ...)
        b = ((j >> t) & 1).astype(jnp.float32)   # column index = output c
        p = _perm_mat(1 << t)
        mg = cth * eye + sth * (2.0 * b - 1.0) * p
        return lax.dot_general(
            m, mg, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    m = lax.fori_loop(0, k_gates, build, eye)
    ore_ref[...] = lax.dot_general(
        re, m, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    oim_ref[...] = lax.dot_general(
        im, m, (((1,), (0,)), ((), ())), precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def run(name, kern, sr, k_gates, two_q=False, iters=200, seed=0):
    rng = np.random.default_rng(seed)
    nbits = int(np.log2(C))
    tq = jnp.asarray(rng.integers(0, nbits, size=k_gates), jnp.int32)
    cq0 = rng.integers(0, nbits, size=k_gates)
    cq = jnp.asarray((cq0 + 1 + rng.integers(0, nbits - 1, size=k_gates))
                     % nbits, jnp.int32)
    x = jnp.asarray(rng.normal(size=k_gates) * 0.3, jnp.float32)
    re0 = jnp.asarray(rng.normal(size=(sr, C)), jnp.float32)
    im0 = jnp.asarray(rng.normal(size=(sr, C)), jnp.float32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_scalar = 3 if two_q else 2          # tq[, cq], x
    interpret = jax.default_backend() == "cpu"
    f = pl.pallas_call(
        functools.partial(kern, k_gates=k_gates),
        grid=(),
        interpret=interpret,
        in_specs=[smem] * n_scalar + [vmem] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((sr, C), jnp.float32)] * 2,
        input_output_aliases={n_scalar: 0, n_scalar + 1: 1},
    )

    args = (tq, cq, x, re0, im0) if two_q else (tq, x, re0, im0)

    @jax.jit
    def step(*a):
        # loop the kernel a few times so per-launch overhead amortizes
        re, im = a[-2], a[-1]
        for _ in range(4):
            re, im = f(*a[:-2], re, im)
        return re, im

    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters / 4           # per kernel pass
    per_gate_us = dt / k_gates * 1e6
    return {"per_pass_ms": dt * 1e3, "per_gate_us": per_gate_us,
            "out_checksum": float(jnp.sum(out[0]) + jnp.sum(out[1]))}


def check_exact(sr, k_gates, seed=0):
    """mxu1q must agree with roll1q bitwise-ish (exact permutation)."""
    r1 = run("roll1q", kernel_roll1q, sr, k_gates, iters=1, seed=seed)
    r2 = run("mxu1q", kernel_mxu1q, sr, k_gates, iters=1, seed=seed)
    return abs(r1["out_checksum"] - r2["out_checksum"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr", default="256,1024,4096")
    ap.add_argument("--lanes", type=int, default=128,
                    help="lane width of the state block (128 = the 2D "
                         "mega-kernel layout; 256 = the composed kernel's "
                         "8q su4 (B, D) layout)")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from tensorrl_qas_tpu.utils.compcache import (
        apply_platform_env, enable_compilation_cache)
    apply_platform_env()
    enable_compilation_cache()

    global C
    C = args.lanes

    results = {}
    for sr in (int(s) for s in args.sr.split(",")):
        row = {}
        for name, kern, two_q in (
                ("roll1q", kernel_roll1q, False),
                ("mxu1q", kernel_mxu1q, False),
                ("fused1q", kernel_fused1q, False),
                ("roll2q", kernel_roll2q, True),
                ("mxu2q", kernel_mxu2q, True)):
            try:
                r = run(name, kern, sr, args.k, two_q=two_q,
                        iters=args.iters)
                row[name] = r
                print(f"SR={sr} {name}: {r['per_gate_us']:.2f} us/gate "
                      f"({r['per_pass_ms']:.3f} ms/pass)", flush=True)
            except Exception as exc:  # noqa: BLE001
                row[name] = {"error": f"{type(exc).__name__}: {exc}"}
                print(f"SR={sr} {name}: FAILED {type(exc).__name__}: "
                      f"{str(exc).splitlines()[0][:200]}", flush=True)
        if "roll1q" in row and "per_gate_us" in row.get("mxu1q", {}):
            row["mxu1q_speedup"] = (row["roll1q"]["per_gate_us"]
                                    / row["mxu1q"]["per_gate_us"])
        if ("per_gate_us" in row.get("roll2q", {})
                and "per_gate_us" in row.get("mxu2q", {})):
            row["mxu2q_speedup"] = (row["roll2q"]["per_gate_us"]
                                    / row["mxu2q"]["per_gate_us"])
        if ("per_gate_us" in row.get("roll1q", {})
                and "per_gate_us" in row.get("fused1q", {})):
            row["fused1q_speedup"] = (row["roll1q"]["per_gate_us"]
                                      / row["fused1q"]["per_gate_us"])
        results[sr] = row
        try:
            print(f"SR={sr} exactness |diff| (mxu1q vs roll1q checksum): "
                  f"{check_exact(sr, args.k):.3e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"SR={sr} exactness check FAILED: "
                  f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}",
                  flush=True)
        if args.out:   # incremental: keep partial results on timeout/crash
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1, default=str)
    print(json.dumps({str(k): v for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
