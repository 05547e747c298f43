from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
from tensorrl_qas_tpu.envs.curricula import (
    MovingThreshold,
    SuccesCountThreshold,
    VanillaCurriculum,
    make_curriculum,
)
from tensorrl_qas_tpu.envs.illegal import IllegalActionTracker
