from tensorrl_qas_tpu.agents.dqn import DQN, DQN_Nstep, make_agent
from tensorrl_qas_tpu.agents.replay import (
    NStepReplayMemory,
    PrioritizedReplayMemory,
    ReplayMemory,
)
