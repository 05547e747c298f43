"""TPU-native quantum architecture search framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of TensorRL-QAS
(arXiv 2505.09371): Double-DQN driven incremental circuit construction for
VQE ground-state preparation, warm-started from DMRG/MPS tensor-network
circuits, with per-step variational angle re-optimization.

Layer map (bottom-up, cf. reference SURVEY.md section 7):

- ``sim``       batched, differentiable statevector engine (replaces qulacs)
- ``ops``       Pallas TPU kernels for the hot gate-apply path
- ``circuits``  circuit IR: state-tensor encoding, gate tapes, OpenQASM 2 I/O
- ``problems``  Hamiltonians (Pauli-sum form + dense oracle) and .npz I/O
- ``optim``     on-device batched angle optimizers (+ host COBYLA parity mode)
- ``envs``      the parameterized RL environment (one impl covers all modes)
- ``models``    Flax Q-networks
- ``agents``    DQN family: double DQN, n-step, PER, on-device replay step
- ``tn``        MPS/MPO, DMRG, brickwork circuit fitting, Stiefel optimizers
- ``synth``     KAK/Cartan two-qubit synthesis (SU(4) -> CNOT + rotations)
- ``parallel``  device-mesh / sharding helpers (amplitude + batch sharding)
- ``train``     CLI driver, config corpus loader, metrics, checkpointing
"""

from tensorrl_qas_tpu import configx as _configx  # noqa: F401  (x64 setup)

__version__ = "0.1.0"
