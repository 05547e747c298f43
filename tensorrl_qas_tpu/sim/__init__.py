from tensorrl_qas_tpu.sim.apply import apply_tape, apply_tape_batched, zero_state
from tensorrl_qas_tpu.sim.expectation import (
    PauliSum,
    dense_expectation,
    pauli_expectation,
)
