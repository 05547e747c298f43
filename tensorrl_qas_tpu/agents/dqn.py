"""Double-DQN agent family (Flax/Optax), jitted act + train step.

Capability-parity with the reference agents (``agents/DeepQ.py:14-155``,
``agents/DeepQNstep.py:13-55``, ``agents/DeepQ_restricted.py``):

- epsilon-greedy policy over a masked action space (illegal ids -> -inf),
- per-step discount gamma = round(final_gamma^(1/num_layers), 2)
  (``DeepQ.py:55`` — including the reference's 2-decimal rounding, which
  changes learning dynamics and must match),
- double-DQN TD targets (policy-net argmax, target-net evaluation),
- SmoothL1 (Huber) loss + Adam,
- hard target-net sync every ``update_target_net`` replays,
- epsilon decay per replay call,
- uniform / prioritized / n-step replay selected by config,
- heavy-hex restricted action dictionaries via ``topology`` (the reference
  ships separate *_restricted agent files; here it is the same class).

The train step is one compiled XLA program: batch upload, forward x3,
targets, loss, Adam update all fuse on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorrl_qas_tpu.circuits.actions import action_dictionary
from tensorrl_qas_tpu.models.qnet import QNetwork
from tensorrl_qas_tpu.agents.replay import (
    DeviceReplay,
    NStepReplayMemory,
    PrioritizedReplayMemory,
    ReplayMemory,
)


def _huber(pred, target):
    """SmoothL1 with beta=1 (torch default)."""
    d = pred - target
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


class DQN:
    """Double DQN with uniform or prioritized replay."""

    def __init__(self, conf: dict, action_size: int, state_size: int,
                 seed: int = 0):
        env_c, agent_c = conf["env"], conf["agent"]
        self.num_qubits = env_c["num_qubits"]
        self.num_layers = env_c["num_layers"]
        self.action_size = action_size
        self.final_gamma = agent_c["final_gamma"]
        self.epsilon = float(agent_c.get("init_epsilon", 1.0))
        self.epsilon_min = agent_c["epsilon_min"]
        self.epsilon_decay = agent_c["epsilon_decay"]
        self.update_target_net = agent_c["update_target_net"]
        self.prioritized_replay = int(agent_c.get("priotitized_replay", 0))
        self.with_angles = int(agent_c.get("angles", 0))

        self.memory_reset_switch = agent_c.get("memory_reset_switch", False)
        self.memory_reset_threshold = agent_c.get("memory_reset_threshold", False)
        self.memory_reset_counter = 0 if self.memory_reset_switch else False

        # observation size: strip angle block, optionally append energy and
        # threshold scalars (reference ``DeepQ.py:43-46``); the su4 gate set
        # carries a (3n+3)-row angle block instead of 3
        gate_set = env_c.get("gate_set", "cnot")
        angle_rows = 3 * self.num_qubits + 3 if gate_set == "su4" else 3
        s = state_size
        if not self.with_angles:
            s -= self.num_layers * self.num_qubits * angle_rows
        if agent_c.get("en_state", 0):
            s += 1
        if agent_c.get("threshold_in_state", 0):
            s += 1
        self.state_size = s

        topology = env_c.get("topology", "all_to_all")
        self.translate = action_dictionary(self.num_qubits, topology,
                                           gate_set=gate_set)
        # kept only for reference-schema parity (agents expose .translate
        # and the reverted dict, utils.py:59-77); nothing in this repo reads
        # it.  For su4 there is no reverted enumeration, so it aliases
        # translate and carries no reverted-ordering contract.
        self.rev_translate = (
            self.translate if gate_set == "su4" else
            action_dictionary(self.num_qubits, topology, reverted=True))

        # per-step discount; the reference rounds to 2 decimals (DeepQ.py:55)
        self.gamma = float(np.round(self.final_gamma ** (1.0 / self.num_layers), 2))

        self.model = QNetwork(hidden=tuple(agent_c["neurons"]),
                              n_actions=action_size,
                              dropout=float(agent_c.get("dropout", 0.0)))
        self.rng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        self.params = self.model.init(key, jnp.zeros((1, self.state_size)))
        self.target_params = jax.tree.map(jnp.copy, self.params)
        self.optimizer = optax.adam(agent_c["learning_rate"])
        self.opt_state = self.optimizer.init(self.params)
        self.step_counter = 0

        memory_size = agent_c["memory_size"]
        # device-resident replay by default: the sampled batch is gathered
        # on device by index, so the ~30MB (batch, state) tensors never
        # cross the host boundary per train step
        self.device_replay = int(agent_c.get("device_replay", 1))
        # DQfD margin-loss hyperparameters (active only on samples whose
        # demo flag is set, i.e. when demonstration seeding is used)
        self.demo_margin = float(agent_c.get("demo_margin", 0.8))
        self.demo_lambda = float(agent_c.get("demo_lambda", 1.0))
        if self.device_replay:
            self.memory = DeviceReplay(memory_size, self.state_size,
                                       seed=seed + 1,
                                       per=bool(self.prioritized_replay))
        elif self.prioritized_replay:
            self.memory = PrioritizedReplayMemory(memory_size, self.state_size,
                                                  seed=seed + 1)
        else:
            self.memory = ReplayMemory(memory_size, self.state_size,
                                       seed=seed + 1)

        self._qvals = jax.jit(
            lambda p, x: self.model.apply(p, x, deterministic=True))
        # single-round-trip greedy action: mask + argmax on device
        self._argmax_masked = jax.jit(
            lambda p, x, mask: jnp.argmax(
                jnp.where(mask, -jnp.inf,
                          self.model.apply(p, x[None, :],
                                           deterministic=True)[0])))
        self._argmax_masked_batch = jax.jit(
            lambda p, x, mask: jnp.argmax(
                jnp.where(mask, -jnp.inf,
                          self.model.apply(p, x, deterministic=True)),
                axis=1))
        self._train = jax.jit(self._train_step)
        self._train_gather = jax.jit(self._train_step_gather)
        self._train_burst = jax.jit(self._train_step_burst)

    # -- acting --------------------------------------------------------------

    def act(self, state: np.ndarray, illegal: list[int]):
        """epsilon-greedy with illegal-action masking
        (reference ``DeepQ.py:76-89``)."""
        if self.rng.random() <= self.epsilon:
            a = int(self.rng.integers(self.action_size))
            while a in illegal:
                a = int(self.rng.integers(self.action_size))
            return a, True
        mask = np.zeros(self.action_size, dtype=bool)
        if illegal:
            mask[np.asarray(illegal, dtype=np.int64)] = True
        return int(self._argmax_masked(self.params, jnp.asarray(state),
                                       jnp.asarray(mask))), False

    def act_batch(self, states: np.ndarray, illegal: list[list[int]]):
        """Vectorized epsilon-greedy over B env replicas: one device call
        covers every greedy replica; exploring replicas sample on host."""
        b = states.shape[0]
        explore = self.rng.random(b) <= self.epsilon
        actions = np.zeros(b, dtype=np.int64)
        masks = np.zeros((b, self.action_size), dtype=bool)
        for i, ill in enumerate(illegal):
            if ill:
                masks[i, np.asarray(ill, dtype=np.int64)] = True
        if not explore.all():
            greedy = np.asarray(self._argmax_masked_batch(
                self.params, jnp.asarray(states), jnp.asarray(masks)))
            actions[:] = greedy
        for i in np.nonzero(explore)[0]:
            a = int(self.rng.integers(self.action_size))
            while masks[i, a]:
                a = int(self.rng.integers(self.action_size))
            actions[i] = a
        return actions, explore

    def remember(self, state, action, reward, next_state, done,
                 env_id=0, is_demo: float = 0.0) -> None:
        self.memory.push(state, action, reward, next_state, done,
                         env_id=env_id, is_demo=is_demo)

    # -- learning --------------------------------------------------------------

    def _train_step_gather(self, params, target_params, opt_state,
                           buf_states, buf_actions, buf_rewards,
                           buf_next_states, buf_dones, buf_demos, idx,
                           weights):
        """Device-replay variant: gather the batch by index on device."""
        return self._train_step(
            params, target_params, opt_state,
            buf_states[idx], buf_actions[idx], buf_rewards[idx],
            buf_next_states[idx], buf_dones[idx], weights,
            demos=buf_demos[idx])

    def _train_step_burst(self, params, target_params, opt_state,
                          buf_states, buf_actions, buf_rewards,
                          buf_next_states, buf_dones, buf_demos, idx_burst,
                          step0):
        """K sequential replay updates in ONE device call (``lax.scan``
        over ``idx_burst`` (K, B)).  Replicates K ``replay()`` calls
        exactly for uniform device-resident replay: the target network
        hard-copies at the same step boundaries (before update k when
        ``(step0 + k) % update_target_net == 0``, matching ``replay()``'s
        copy-then-increment order).  Collapses the K-RPC dispatch cost of
        reference-ratio training (``replays_per_iter = B``) to one
        launch on latency-bound transports."""
        t = self.update_target_net

        def body(carry, idx):
            params, target, opt_state, step = carry
            target = jax.lax.cond(step % t == 0, lambda: params,
                                  lambda: target)
            params, opt_state, loss, _ = self._train_step(
                params, target, opt_state, buf_states[idx],
                buf_actions[idx], buf_rewards[idx], buf_next_states[idx],
                buf_dones[idx], jnp.float32(1.0), demos=buf_demos[idx])
            return (params, target, opt_state, step + 1), loss

        (params, target, opt_state, _), losses = jax.lax.scan(
            body, (params, target_params, opt_state,
                   jnp.asarray(step0, dtype=jnp.int32)), idx_burst)
        return params, target, opt_state, losses[-1]

    def _train_step(self, params, target_params, opt_state,
                    states, actions, rewards, next_states, dones, weights,
                    demos=None):
        def loss_fn(p):
            q = self.model.apply(p, states, deterministic=True)
            q_sa = jnp.take_along_axis(q, actions[:, None], axis=1)[:, 0]
            # double DQN: policy net picks a', target net evaluates it
            next_q_policy = self.model.apply(p, next_states, deterministic=True)
            a_star = jnp.argmax(next_q_policy, axis=1)
            next_q_target = self.model.apply(target_params, next_states,
                                             deterministic=True)
            q_next = jnp.take_along_axis(next_q_target, a_star[:, None],
                                         axis=1)[:, 0]
            q_next = jax.lax.stop_gradient(q_next)
            target = rewards + self.gamma * q_next * (1.0 - dones)
            td = target - q_sa
            loss = jnp.mean(_huber(q_sa * weights, target * weights))
            if demos is not None:
                # DQfD large-margin supervised term on demonstration
                # samples: force the demo action's Q above every other
                # action by a margin, so argmax reproduces the
                # demonstration (TD alone cannot rank never-tried
                # alternatives at demo states)
                onehot = jax.nn.one_hot(actions, q.shape[1], dtype=q.dtype)
                q_marg = q + self.demo_margin * (1.0 - onehot)
                sup = jnp.max(q_marg, axis=1) - q_sa
                loss = loss + self.demo_lambda * jnp.mean(demos * sup)
            return loss, jnp.abs(td)

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, td

    def _sample(self, batch_size: int):
        if self.prioritized_replay:
            idx, batch, weights = self.memory.sample(batch_size,
                                                     frame_idx=self.step_counter)
            return idx, batch, weights
        batch = self.memory.sample(batch_size)
        return None, batch, np.float32(1.0)

    def replay(self, batch_size: int, fetch_loss: bool = True):
        if self.step_counter % self.update_target_net == 0:
            self.target_params = jax.tree.map(jnp.copy, self.params)
        self.step_counter += 1

        if self.device_replay:
            idx, weights = self.memory.sample_indices(
                batch_size, frame_idx=self.step_counter)
            self.params, self.opt_state, loss, td = self._train_gather(
                self.params, self.target_params, self.opt_state,
                *self.memory.buffers(), jnp.asarray(idx),
                jnp.asarray(weights))
            if self.prioritized_replay:
                self.memory.update_priorities(idx, np.asarray(td))
        else:
            idx, batch, weights = self._sample(batch_size)
            states, actions, rewards, next_states, dones = batch
            self.params, self.opt_state, loss, td = self._train(
                self.params, self.target_params, self.opt_state,
                jnp.asarray(states), jnp.asarray(actions),
                jnp.asarray(rewards), jnp.asarray(next_states),
                jnp.asarray(dones), jnp.asarray(weights))
            if idx is not None:
                self.memory.update_priorities(idx, np.asarray(td))

        if self.epsilon > self.epsilon_min:
            self.epsilon = max(self.epsilon * self.epsilon_decay,
                               self.epsilon_min)
        # fetch_loss=False keeps dispatch fully async (no host round trip) —
        # used by latency-sensitive loops; the loss stays a device scalar.
        return float(loss) if fetch_loss else loss

    def replay_burst(self, batch_size: int, k: int):
        """K reference-ratio policy updates in ONE device call.

        Semantically identical to k sequential ``replay(fetch_loss=False)``
        calls for uniform device-resident replay (the common config);
        PER or host-resident replay falls back to the sequential loop
        (priority updates need a per-step host TD round trip anyway).
        Returns the last update's loss as a device scalar.
        """
        if not self.device_replay or self.prioritized_replay or k == 1:
            loss = None
            for _ in range(k):
                loss = self.replay(batch_size, fetch_loss=False)
            return loss
        idx = np.stack([self.memory.sample_indices(batch_size)[0]
                        for _ in range(k)])
        (self.params, self.target_params, self.opt_state,
         loss) = self._train_burst(
            self.params, self.target_params, self.opt_state,
            *self.memory.buffers(), jnp.asarray(idx), self.step_counter)
        self.step_counter += k
        if self.epsilon > self.epsilon_min:
            self.epsilon = max(self.epsilon * self.epsilon_decay ** k,
                               self.epsilon_min)
        return loss

    # -- checkpointing ------------------------------------------------------------

    def state_dict(self):
        from tensorrl_qas_tpu.agents.replay import rng_state_json

        return {
            "params": jax.device_get(self.params),
            "target_params": jax.device_get(self.target_params),
            "opt_state": jax.device_get(self.opt_state),
            "epsilon": self.epsilon,
            "step_counter": self.step_counter,
            # epsilon-greedy draw state, for exact resume
            "rng_state": rng_state_json(self.rng),
        }

    def load_state_dict(self, d):
        self.params = jax.tree.map(jnp.asarray, d["params"])
        self.target_params = jax.tree.map(jnp.asarray, d["target_params"])
        self.opt_state = jax.tree.map(
            jnp.asarray, d["opt_state"],
            is_leaf=lambda x: isinstance(x, np.ndarray))
        self.epsilon = float(d["epsilon"])
        self.step_counter = int(d["step_counter"])
        if d.get("rng_state"):        # absent in pre-round-4 checkpoints
            from tensorrl_qas_tpu.agents.replay import restore_rng

            restore_rng(self.rng, d["rng_state"])


class DQN_Nstep(DQN):
    """DQN with n-step returns (reference ``agents/DeepQNstep.py``)."""

    def __init__(self, conf, action_size, state_size, seed: int = 0):
        super().__init__(conf, action_size, state_size, seed)
        self.prioritized_replay = 0
        if self.device_replay:
            self.memory = DeviceReplay(conf["agent"]["memory_size"],
                                       self.state_size, seed=seed + 1,
                                       n_step=conf["agent"]["n_step"],
                                       gamma=self.gamma)
        else:
            self.memory = NStepReplayMemory(conf["agent"]["memory_size"],
                                            self.state_size,
                                            conf["agent"]["n_step"],
                                            self.gamma, seed=seed + 1)


_AGENT_CLASSES = {"DQN": DQN, "DQN_Nstep": DQN_Nstep}


def make_agent(conf: dict, action_size: int, state_size: int, seed: int = 0):
    """Factory keyed by the config's ``agent_class`` (the reference resolves
    ``agents.__dict__[agent_type].__dict__[agent_class]`` by reflection,
    ``TensorRL_fixed_noiseless.py:236``; the *_restricted agent variants
    collapse into ``topology`` here)."""
    name = conf["agent"]["agent_class"]
    if name not in _AGENT_CLASSES:
        raise ValueError(f"unknown agent_class {name!r}; "
                         f"available: {sorted(_AGENT_CLASSES)}")
    return _AGENT_CLASSES[name](conf, action_size, state_size, seed=seed)
