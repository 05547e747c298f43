"""Vectorized training: B env replicas + shared DQN, batched device calls.

Throughput-oriented alternative to the reference's strictly sequential
episode loop: per iteration, every replica takes one masked epsilon-greedy
action (one batched act call), all replicas' optimize+energy device work
runs as one batched fused call, all B transitions enter the shared replay
buffer, and one replay train step runs.  Learning dynamics differ from the
sequential reference loop only in the data-collection ratio (B transitions
per replay instead of 1), controllable via ``replays_per_iter``.
"""

from __future__ import annotations

import time

import numpy as np

from tensorrl_qas_tpu.envs.vector_env import VectorCircuitEnv
from tensorrl_qas_tpu.train.saver import Saver


def modify_states(states: np.ndarray, venv: VectorCircuitEnv, conf: dict):
    cols = []
    if conf["agent"].get("en_state", 0):
        cols.append(np.asarray([e.prev_energy for e in venv.envs],
                               dtype=np.float32)[:, None])
    if conf["agent"].get("threshold_in_state", 0):
        cols.append(np.asarray([e.done_threshold for e in venv.envs],
                               dtype=np.float32)[:, None])
    if cols:
        states = np.concatenate([states] + cols, axis=1)
    return states


def train_vectorized(venv: VectorCircuitEnv, agent, conf: dict, seed: int,
                     output_path: str, total_env_steps: int,
                     replays_per_iter: int = 1, verbose: bool = True,
                     loss_fetch_every: int = 10) -> dict:
    """Run vectorized training for a fixed env-step budget.

    Returns summary stats (episodes finished, best error, steps/sec).
    """
    saver = Saver(output_path, seed)
    batch_size = conf["agent"]["batch_size"]
    b = venv.n_envs

    states = venv.reset_all()
    states = modify_states(states, venv, conf)
    episodes_done = 0
    successes = 0
    best_error = np.inf
    t0 = time.time()
    steps = 0
    it = 0

    while steps < total_env_steps:
        illegal = venv.illegal_actions()
        actions, _ = agent.act_batch(states, illegal)
        # snapshot prev_energy/threshold columns BEFORE stepping mutates them
        acts4 = [agent.translate[int(a)] for a in actions]
        next_states, rewards, dones, infos = venv.step_all(acts4)
        next_states = modify_states(next_states, venv, conf)

        for i in range(b):
            agent.remember(states[i], int(actions[i]), float(rewards[i]),
                           next_states[i], float(dones[i]))
            if dones[i]:
                episodes_done += 1
                best_error = min(best_error, infos[i]["error"])
                if rewards[i] >= 5.0:
                    successes += 1
        states = next_states
        steps += b
        it += 1

        if len(agent.memory) > batch_size:
            for _ in range(replays_per_iter):
                agent.replay(batch_size,
                             fetch_loss=(it % loss_fetch_every == 0))

        if verbose and it % 20 == 0:
            sps = steps / (time.time() - t0)
            print(f"iter {it}: {steps} env-steps, {episodes_done} episodes, "
                  f"best err {best_error:.3e}, eps {agent.epsilon:.2f}, "
                  f"{sps:.1f} steps/s", flush=True)
        saver.save_jsonl_event({"iter": it, "steps": steps,
                                "episodes": episodes_done,
                                "successes": successes,
                                "best_error": float(best_error)})
        if it % 500 == 0:
            from tensorrl_qas_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(f"{output_path}/vec_{seed}", agent)

    from tensorrl_qas_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(f"{output_path}/vec_{seed}", agent)
    dt = time.time() - t0
    return {"episodes": episodes_done, "successes": successes,
            "best_error": float(best_error), "steps": steps,
            "steps_per_sec": steps / dt, "wall_s": dt}
