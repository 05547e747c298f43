from tensorrl_qas_tpu.circuits.actions import (
    all_to_all_actions,
    all_to_all_actions_reverted,
    hexagon_actions,
    hexagon_actions_reverted,
)
from tensorrl_qas_tpu.circuits.tape import GateTape, GateKind
from tensorrl_qas_tpu.circuits.tensor_ir import StateTensor
