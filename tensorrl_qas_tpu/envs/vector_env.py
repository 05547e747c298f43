"""Vectorized environment: B replicas, one device call per step.

The data-parallel axis the reference never had (SURVEY.md section 2.4a —
its only parallelism was qulacs' intra-gate OpenMP): B independent episodes
advance together, and their per-step device work (multi-start angle
optimization + post-action energy, the entire hot path) is vmapped into a
single XLA program.  On a latency-bound transport this multiplies env-step
throughput by ~B; on-chip it turns tiny gather kernels into well-fed
batched ones.

Episode bookkeeping stays per-replica host logic (cheap), and replicas
auto-reset on done, so the wrapper exposes a fixed-width stream of
transitions for the RL agent.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax

from tensorrl_qas_tpu.envs.circuit_env import CircuitEnv, EnvConfig


class VectorCircuitEnv:
    """B synchronized CircuitEnv replicas sharing one batched device call."""

    def __init__(self, cfg: EnvConfig, n_envs: int):
        if cfg.optim_alg != "adam" or cfg.optim_method != "scipy_each_step":
            raise ValueError("VectorCircuitEnv requires the fused adam path")
        self.n_envs = n_envs
        self.envs = []
        for i in range(n_envs):
            cfg_i = dataclasses.replace(cfg, seed=cfg.seed + i)
            self.envs.append(CircuitEnv(cfg_i))
        # all replicas share one compiled optimizer (same shapes/problem)
        opt = self.envs[0].optimizer
        for e in self.envs[1:]:
            e.optimizer = opt
        self.optimizer = opt
        self._key = jax.random.PRNGKey(cfg.seed ^ 0xBEEF)

    @property
    def action_size(self) -> int:
        return self.envs[0].action_size

    @property
    def state_size(self) -> int:
        return self.envs[0].state_size

    @property
    def num_layers(self) -> int:
        return self.envs[0].num_layers

    def reset_all(self) -> np.ndarray:
        return np.stack([e.reset() for e in self.envs])

    def illegal_actions(self) -> list[list[int]]:
        return [e.illegal_action_new() for e in self.envs]

    def _keys(self):
        self._key, sub = jax.random.split(self._key)
        return jax.random.split(sub, self.n_envs)

    def step_all(self, actions, train_flag: bool = True,
                 auto_reset: bool = True):
        """Advance every replica by one action.

        Returns (obs (B, S), rewards (B,), dones (B,), infos list).  Done
        replicas are reset (their obs row is the post-reset observation)
        when ``auto_reset``.
        """
        payloads = [env.step_begin(a) for env, a in zip(self.envs, actions)]
        old_arrs_b = tuple(np.stack([p[0][k] for p in payloads])
                           for k in range(4))
        x0_b = np.stack([p[1] for p in payloads])
        n_active_b = np.asarray([p[2] for p in payloads])
        new_arrs_b = tuple(np.stack([p[3][k] for p in payloads])
                           for k in range(4))
        map_idx_b = np.stack([p[4] for p in payloads])

        if self.envs[0]._bc_active():
            # block-coordinate trainable mode: every env carries its own
            # psi0 for this step (frozen-prefix state on frozen steps, the
            # plain warm start on joint steps) — batched (B, D) planes
            pairs = [env.step_psi0() for env in self.envs]
            psi0 = (np.stack([p[0] for p in pairs]),
                    np.stack([p[1] for p in pairs]))
        else:
            psi0 = self.envs[0]._psi0()
        x_opt_b, e_new_b, nfev = self.optimizer.fused_step_batch(
            psi0, old_arrs_b, x0_b, n_active_b, new_arrs_b,
            map_idx_b, self._keys())

        obs, rewards, dones, infos = [], [], [], []
        for env, x_opt, e in zip(self.envs, x_opt_b, e_new_b):
            o, r, d = env.step_finish(x_opt, float(e), nfev, train_flag)
            info = {"error": env.error, "energy": env.energy,
                    "nfev": env.nfev, "steps": env.step_counter}
            if d and auto_reset:
                o = env.reset()
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(info)
        return np.stack(obs), np.asarray(rewards), np.asarray(dones), infos
