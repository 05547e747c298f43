"""Benchmark: training-loop env-step throughput at 8q H2O (TensorRL-fixed).

Primary metric per BASELINE.md: env-steps/sec/chip on the 8-qubit H2O
problem.  One env step = place gate + multi-start re-optimization of all
circuit angles (Adam, global_iters x n_starts evaluations) + post-action
energy — all fused into a single XLA call — plus the DQN act and replay
train step with the production batch size, as in the real training loop
with a warm buffer.

Baseline: the reference's qulacs-CPU training on the same task runs ~27 s
per episode (image/result3.png, README.md:27) at ~41 steps/episode
=> ~1.52 env-steps/sec.  ``vs_baseline`` = our steps/sec over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from tensorrl_qas_tpu.agents.dqn import make_agent
    from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig
    from tensorrl_qas_tpu.train.config import get_config
    from tensorrl_qas_tpu.train.driver import modify_state

    conf = get_config("TensorRL_fixed/", "H2O8q_TNbond2.cfg")
    conf["non_local_opt"]["global_iters"] = 100  # adam iters (ref: COBYLA 1000)
    env_cfg = EnvConfig.from_conf(conf, tn_placement="fixed", seed=0)
    env = CircuitEnv(env_cfg)
    agent = make_agent(conf, env.action_size, env.state_size, seed=0)
    agent.epsilon = 0.5  # exercise both exploration and greedy act paths
    batch_size = conf["agent"]["batch_size"]

    def run_steps(n_steps, with_replay):
        state = env.reset()
        state = modify_state(state, env, conf)
        steps = 0
        while steps < n_steps:
            ill = env.illegal_action_new()
            a, _ = agent.act(state, ill)
            next_state, reward, done = env.step(agent.translate[a])
            next_state = modify_state(next_state, env, conf)
            agent.remember(state, a, reward, next_state, float(done))
            state = next_state
            if with_replay and len(agent.memory) > batch_size:
                agent.replay(batch_size, fetch_loss=False)
            steps += 1
            if done:
                state = env.reset()
                state = modify_state(state, env, conf)
        return steps

    # warmup: compile the fused step + act + replay, and fill the buffer
    t0 = time.time()
    while len(agent.memory) <= batch_size + 4:
        run_steps(128, with_replay=False)
    run_steps(2, with_replay=True)
    warmup_s = time.time() - t0

    n_steps = 100
    t0 = time.time()
    run_steps(n_steps, with_replay=True)
    dt = time.time() - t0
    steps_per_sec = n_steps / dt

    qulacs_cpu_steps_per_sec = 41.0 / 27.0
    out = {
        "metric": "env_steps_per_sec_8q_h2o",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec / qulacs_cpu_steps_per_sec, 2),
    }
    print(json.dumps(out), flush=True)
    print(f"# warmup {warmup_s:.1f}s, timed {n_steps} steps in {dt:.2f}s, "
          f"backend={jax.default_backend()}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
