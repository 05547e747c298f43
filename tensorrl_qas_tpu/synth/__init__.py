from tensorrl_qas_tpu.synth.kak import (
    closest_unitary,
    decompose_su4,
    makhlin_invariants,
    zyz_angles,
)
