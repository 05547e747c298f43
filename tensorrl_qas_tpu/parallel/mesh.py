"""Device-mesh construction helpers.

Mesh axes for this framework (the simulator analogs of an LLM stack's
tp/dp axes — SURVEY.md section 2.4):

- ``amp``: amplitude sharding of the 2^n statevector across chips (the
  tensor-parallel analog; required beyond ~26 qubits per chip and for
  large trajectory batches),
- ``dp``: batch parallelism over optimizer restarts / noise trajectories /
  env replicas / replay batch,
- ``seed``: embarrassingly parallel multi-seed training replicas.

Collectives ride XLA (ppermute / psum) over ICI; no NCCL/MPI analog is
needed (the reference has no distributed backend at all —
``torch.set_num_threads(1)``, ``TensorRL_fixed_noiseless.py:13``).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_amp: int = 1, n_dp: int = 1, devices=None) -> Mesh:
    """Build an (amp, dp) mesh from the first n_amp*n_dp devices."""
    if devices is None:
        devices = jax.devices()
    need = n_amp * n_dp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_amp, n_dp)
    return Mesh(arr, ("amp", "dp"))
