"""COBYLA parity mode: scipy's derivative-free optimizer over our engines.

The reference optimizes every circuit angle with host COBYLA after each
gate placement (``environment_qulacs.py:417-445``); ``optim_alg='cobyla'``
reproduces that loop (same Fortran COBYLA via scipy) against the csim
native engine (f64) or the jitted energy.  These tests pin the mode that
the measured host baselines (scripts/bench_baseline_cobyla.py) and the
parity claims rest on.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tensorrl_qas_tpu.circuits.tape import GateKind, GateTape
from tensorrl_qas_tpu.optim.angle_opt import AngleOptimizer
from tensorrl_qas_tpu.sim.apply import zero_state
from tensorrl_qas_tpu.sim.expectation import PauliSum

import jax


def test_cobyla_finds_analytic_minimum():
    # <0|RY(t)^dag Z RY(t)|0> = cos(t): minimum -1 at t = pi
    ps = PauliSum.from_strings(["Z"], [1.0], 1)
    tape = GateTape(1, 1, 1)
    tape.add(GateKind.RY, target=0, angle=0.3)
    opt = AngleOptimizer(ps.device_arrays(jnp.complex128), method="cobyla",
                        iters=200, dtype=jnp.complex128, use_pallas="off")
    opt._pauli_obj = ps
    x, e, nfev = opt.optimize(zero_state(1, jnp.complex128),
                              tuple(map(jnp.asarray, tape.arrays())),
                              tape.x0(), 1, jax.random.PRNGKey(0))
    assert e == pytest.approx(-1.0, abs=1e-6)
    assert np.cos(x[0]) == pytest.approx(-1.0, abs=1e-5)
    assert nfev > 0


def test_cobyla_env_step_descends():
    from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.train.config import get_config

    conf = get_config("TensorRL_fixed/", "heisenberg_5q_TNbond2.cfg")
    cfg = EnvConfig.from_conf(conf, tn_placement="fixed",
                              optim_alg="cobyla", seed=0)
    cfg.global_iters = 60
    cfg.use_pallas = "off"
    env = CircuitEnv(cfg)
    env.reset()
    e_warm = env.energy
    # a rotation action (ctrl=n disables CNOT): RY on qubit 2
    n = cfg.num_qubits
    _, r1, d = env.step((n, 0, 2, 2))
    e1 = env.energy
    _, r2, d = env.step((n, 0, 1, 1))
    e2 = env.energy
    assert np.isfinite([e1, e2]).all()
    assert env.nfev > 0
    # COBYLA re-optimizes the pre-action circuit each step: by step 2 the
    # energy cannot sit above the warm start by more than threshold noise
    assert e2 <= e_warm + 1e-6
