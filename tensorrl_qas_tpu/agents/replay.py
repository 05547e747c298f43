"""Experience replay buffers.

Array-backed (preallocated numpy ring buffers, O(1) push, vectorized batch
assembly) rather than the reference's Python list of namedtuples
(``agents/DeepQ.py:158-262``) — sampled batches upload to the device as
single contiguous arrays.

Three variants mirroring the reference capability matrix:
uniform, prioritized (alpha-priorities + beta-annealed importance weights),
and n-step (reward folding at push time, ``agents/DeepQNstep.py:59-99``).
"""

from __future__ import annotations

import json
from collections import deque

import numpy as np


def rng_state_json(rng: np.random.Generator) -> str:
    """Serialize a numpy Generator's exact bit state (json: the PCG64
    state holds 128-bit ints, which msgpack/npz can't carry natively)."""
    return json.dumps(rng.bit_generator.state)


def restore_rng(rng: np.random.Generator, state_json) -> None:
    rng.bit_generator.state = json.loads(str(state_json))


def _fold_windows_pickle(window, windows) -> np.ndarray:
    """n-step fold windows as a npz-safe uint8 blob.

    The fold window persists ACROSS episodes (reference
    ``DeepQNstep.py:59-99`` never clears it; the early-done cut handles
    episode boundaries), so exact resume must carry the in-flight
    transitions too, not just the ring buffer."""
    import pickle

    blob = pickle.dumps({"window": list(window),
                         "windows": {k: list(v) for k, v in windows.items()}})
    return np.frombuffer(blob, dtype=np.uint8)


def _unfold_windows_pickle(arr, maxlen: int):
    import pickle

    d = pickle.loads(np.asarray(arr, dtype=np.uint8).tobytes())
    window = deque(d["window"], maxlen=maxlen)
    windows = {k: deque(v, maxlen=maxlen) for k, v in d["windows"].items()}
    return window, windows


class ReplayMemory:
    """Uniform ring buffer."""

    def __init__(self, capacity: int, state_size: int, seed: int = 0):
        self.capacity = capacity
        self.state_size = state_size
        self.rng = np.random.default_rng(seed)
        self._alloc()

    def _alloc(self):
        c, s = self.capacity, self.state_size
        self.states = np.zeros((c, s), dtype=np.float32)
        self.next_states = np.zeros((c, s), dtype=np.float32)
        self.actions = np.zeros(c, dtype=np.int32)
        self.rewards = np.zeros(c, dtype=np.float32)
        self.dones = np.zeros(c, dtype=np.float32)
        self.position = 0
        self.size = 0

    def push(self, state, action, reward, next_state, done,
             env_id=0, is_demo: float = 0.0) -> None:
        del env_id, is_demo              # single-stream host buffer
        p = self.position
        self.states[p] = state
        self.actions[p] = action
        self.rewards[p] = reward
        self.next_states[p] = next_state
        self.dones[p] = done
        self.position = (p + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def sample(self, batch_size: int):
        idx = self.rng.choice(self.size, size=batch_size, replace=False)
        return (self.states[idx], self.actions[idx], self.rewards[idx],
                self.next_states[idx], self.dones[idx])

    def __len__(self) -> int:
        return self.size

    def clean_memory(self) -> None:
        self._alloc()

    # -- checkpointing -------------------------------------------------------

    def state_dict(self):
        n = self.size
        return {"states": self.states[:n], "actions": self.actions[:n],
                "rewards": self.rewards[:n], "next_states": self.next_states[:n],
                "dones": self.dones[:n], "position": self.position,
                "size": n, "rng_state": rng_state_json(self.rng)}

    def load_state_dict(self, d):
        n = int(d["size"])
        self._alloc()
        self.states[:n] = d["states"]
        self.actions[:n] = d["actions"]
        self.rewards[:n] = d["rewards"]
        self.next_states[:n] = d["next_states"]
        self.dones[:n] = d["dones"]
        self.position = int(d["position"]) % self.capacity
        self.size = n
        if "rng_state" in d:          # absent in pre-round-4 checkpoints
            restore_rng(self.rng, d["rng_state"])


class PrioritizedReplayMemory(ReplayMemory):
    """alpha-prioritized sampling with beta-annealed IS weights
    (reference ``agents/DeepQ.py:186-262``)."""

    def __init__(self, capacity: int, state_size: int, seed: int = 0,
                 alpha: float = 0.6, beta_start: float = 0.4,
                 beta_frames: int = 100000):
        super().__init__(capacity, state_size, seed)
        self.alpha = alpha
        self.beta_start = beta_start
        self.beta_frames = beta_frames
        self.priorities = np.zeros(capacity, dtype=np.float32)

    def push(self, state, action, reward, next_state, done,
             env_id=0, is_demo: float = 0.0) -> None:
        max_p = self.priorities[: self.size].max() if self.size else 1.0
        self.priorities[self.position] = max_p
        super().push(state, action, reward, next_state, done)

    def sample(self, batch_size: int, frame_idx: int = 0):
        pri = self.priorities[: self.size]
        probs = pri ** self.alpha
        probs = probs / probs.sum()
        idx = self.rng.choice(self.size, size=batch_size, p=probs)
        beta = min(1.0, self.beta_start
                   + frame_idx * (1.0 - self.beta_start) / self.beta_frames)
        weights = (self.size * probs[idx]) ** (-beta)
        weights = (weights / weights.max()).astype(np.float32)
        batch = (self.states[idx], self.actions[idx], self.rewards[idx],
                 self.next_states[idx], self.dones[idx])
        return idx, batch, weights

    def update_priorities(self, idx, td_errors, epsilon: float = 1e-5) -> None:
        self.priorities[idx] = np.abs(np.asarray(td_errors)).reshape(-1) + epsilon

    def clean_memory(self) -> None:
        super().clean_memory()
        self.priorities = np.zeros(self.capacity, dtype=np.float32)

    def state_dict(self):
        d = super().state_dict()
        d["priorities"] = self.priorities[: self.size]
        return d

    def load_state_dict(self, d):
        super().load_state_dict(d)
        self.priorities = np.zeros(self.capacity, dtype=np.float32)
        if "priorities" in d:
            self.priorities[: self.size] = d["priorities"]
        else:                     # pre-round-4 checkpoint: neutral restart
            self.priorities[: self.size] = 1.0


class DeviceReplay:
    """Device-resident replay buffer.

    Transitions accumulate in a small host-side pending list and are flushed
    to preallocated device arrays in one scatter right before sampling; the
    training step then *gathers the batch on device by index*, so the
    (batch, state_size) tensors never cross the host boundary (a 1000x4137
    f32 batch is ~33 MB per replay otherwise — the single largest transfer
    in the loop).  Supports n-step reward folding at push time and
    prioritized sampling (priorities stay host-side; they are O(capacity)
    scalars).
    """

    def __init__(self, capacity: int, state_size: int, seed: int = 0,
                 n_step: int = 0, gamma: float = 1.0, per: bool = False,
                 alpha: float = 0.6, beta_start: float = 0.4,
                 beta_frames: int = 100000):
        import jax.numpy as jnp

        self.capacity = capacity
        self.state_size = state_size
        self.rng = np.random.default_rng(seed)
        self.n_step = n_step
        self.gamma = gamma
        self.per = per
        self.alpha = alpha
        self.beta_start = beta_start
        self.beta_frames = beta_frames
        self.window: deque = deque(maxlen=max(n_step, 1))
        self._windows: dict = {}     # per-env fold windows (see push)
        self._pending: list = []
        self._jnp = jnp
        self.states = jnp.zeros((capacity, state_size), jnp.float32)
        self.next_states = jnp.zeros((capacity, state_size), jnp.float32)
        self.actions = jnp.zeros(capacity, jnp.int32)
        self.rewards = jnp.zeros(capacity, jnp.float32)
        self.dones = jnp.zeros(capacity, jnp.float32)
        self.demos = jnp.zeros(capacity, jnp.float32)
        self.priorities = np.zeros(capacity, dtype=np.float32)
        self.position = 0
        self.size = 0

    def push(self, state, action, reward, next_state, done,
             env_id=0, is_demo: float = 0.0) -> None:
        """``env_id`` keys the n-step fold window: transitions from
        different env replicas (or demonstration streams) must fold
        independently — one shared window would mix replicas inside a
        single n-step return.  The sequential driver's default (0)
        reproduces the reference's single-stream folding exactly."""
        if self.n_step:
            window = self._window_for(env_id)
            window.append((state, action, reward, next_state, done))
            if len(window) < self.n_step:
                return
            r, ns, dn = self._fold(window)
            s0, a0 = window[0][0], window[0][1]
            self._pending.append((s0, a0, r, ns, dn, is_demo))
        else:
            self._pending.append((state, action, reward, next_state, done,
                                  is_demo))

    def _window_for(self, env_id):
        if env_id == 0:
            return self.window
        w = self._windows.get(env_id)
        if w is None:
            w = self._windows[env_id] = deque(maxlen=max(self.n_step, 1))
        return w

    def _fold(self, window):
        r, next_n, done_n = (window[-1][2], window[-1][3], window[-1][4])
        for _, _, rwd, nxt, dn in reversed(list(window)[:-1]):
            r = self.gamma * r * (1 - dn) + rwd
            if dn:
                next_n, done_n = nxt, dn
        return r, next_n, done_n

    def flush(self) -> None:
        """One scatter uploads all pending transitions."""
        if not self._pending:
            return
        jnp = self._jnp
        k = len(self._pending)
        idx = (self.position + np.arange(k)) % self.capacity
        s = np.stack([p[0] for p in self._pending]).astype(np.float32)
        a = np.asarray([p[1] for p in self._pending], np.int32)
        r = np.asarray([p[2] for p in self._pending], np.float32)
        ns = np.stack([p[3] for p in self._pending]).astype(np.float32)
        d = np.asarray([p[4] for p in self._pending], np.float32)
        dm = np.asarray([p[5] for p in self._pending], np.float32)
        jidx = jnp.asarray(idx)
        self.states = self.states.at[jidx].set(jnp.asarray(s))
        self.next_states = self.next_states.at[jidx].set(jnp.asarray(ns))
        self.actions = self.actions.at[jidx].set(jnp.asarray(a))
        self.rewards = self.rewards.at[jidx].set(jnp.asarray(r))
        self.dones = self.dones.at[jidx].set(jnp.asarray(d))
        self.demos = self.demos.at[jidx].set(jnp.asarray(dm))
        if self.per:
            max_p = self.priorities[: self.size].max() if self.size else 1.0
            self.priorities[idx] = max_p
        self._pending.clear()
        self.position = int((self.position + k) % self.capacity)
        self.size = min(self.size + k, self.capacity)

    def sample_indices(self, batch_size: int, frame_idx: int = 0):
        """-> (idx (B,) numpy, is_weights (B,) numpy or scalar 1.0)."""
        self.flush()
        if self.per:
            pri = self.priorities[: self.size]
            probs = pri ** self.alpha
            probs = probs / probs.sum()
            idx = self.rng.choice(self.size, size=batch_size, p=probs)
            beta = min(1.0, self.beta_start + frame_idx
                       * (1.0 - self.beta_start) / self.beta_frames)
            w = (self.size * probs[idx]) ** (-beta)
            return idx, (w / w.max()).astype(np.float32)
        idx = self.rng.choice(self.size, size=batch_size,
                              replace=batch_size > self.size)
        return idx, np.float32(1.0)

    def buffers(self):
        return (self.states, self.actions, self.rewards, self.next_states,
                self.dones, self.demos)

    def update_priorities(self, idx, td_errors, epsilon: float = 1e-5):
        self.priorities[idx] = np.abs(np.asarray(td_errors)).reshape(-1) + epsilon

    def __len__(self) -> int:
        return self.size + len(self._pending)

    def clean_memory(self) -> None:
        self._windows = {}
        jnp = self._jnp
        self.demos = jnp.zeros_like(self.demos)
        self.states = jnp.zeros_like(self.states)
        self.next_states = jnp.zeros_like(self.next_states)
        self.actions = jnp.zeros_like(self.actions)
        self.rewards = jnp.zeros_like(self.rewards)
        self.dones = jnp.zeros_like(self.dones)
        self.priorities[:] = 0
        self._pending.clear()
        self.window = deque(maxlen=max(self.n_step, 1))
        self.position = 0
        self.size = 0

    # -- checkpointing (f32/int d2h transfers are safe) ---------------------

    def state_dict(self):
        self.flush()
        n = self.size
        d = {"states": np.asarray(self.states[:n]),
             "actions": np.asarray(self.actions[:n]),
             "rewards": np.asarray(self.rewards[:n]),
             "next_states": np.asarray(self.next_states[:n]),
             "dones": np.asarray(self.dones[:n]),
             "demos": np.asarray(self.demos[:n]),
             "position": self.position, "size": n,
             "rng_state": rng_state_json(self.rng),
             "fold_windows": _fold_windows_pickle(self.window,
                                                  self._windows)}
        if self.per:
            d["priorities"] = self.priorities[:n]
        return d

    def load_state_dict(self, d):
        jnp = self._jnp
        n = int(d["size"])
        self.clean_memory()
        jidx = jnp.arange(n)
        self.states = self.states.at[jidx].set(jnp.asarray(d["states"]))
        self.next_states = self.next_states.at[jidx].set(
            jnp.asarray(d["next_states"]))
        self.actions = self.actions.at[jidx].set(
            jnp.asarray(d["actions"], jnp.int32))
        self.rewards = self.rewards.at[jidx].set(jnp.asarray(d["rewards"]))
        if "demos" in d:
            self.demos = self.demos.at[jidx].set(jnp.asarray(d["demos"]))
        self.dones = self.dones.at[jidx].set(jnp.asarray(d["dones"]))
        self.position = int(d["position"]) % self.capacity
        self.size = n
        if "rng_state" in d:
            restore_rng(self.rng, d["rng_state"])
        if "priorities" in d:
            self.priorities[:n] = d["priorities"]
        elif self.per:
            self.priorities[:n] = 1.0
        if "fold_windows" in d:
            self.window, self._windows = _unfold_windows_pickle(
                d["fold_windows"], max(self.n_step, 1))


class NStepReplayMemory(ReplayMemory):
    """n-step return folding at push time
    (reference ``agents/DeepQNstep.py:59-99``): the stored transition is
    (s_t, a_t, sum_k gamma^k r_{t+k}, s_{t+n}, done) with early-termination
    cut at the first done inside the window."""

    def __init__(self, capacity: int, state_size: int, n_step: int,
                 gamma: float, seed: int = 0):
        super().__init__(capacity, state_size, seed)
        self.n_step = n_step
        self.gamma = gamma
        self.window: deque = deque(maxlen=n_step)
        self._windows: dict = {}     # per-env fold windows (see DeviceReplay)

    def push(self, state, action, reward, next_state, done,
             env_id=0, is_demo: float = 0.0) -> None:
        del is_demo
        if env_id == 0:
            window = self.window
        else:
            window = self._windows.get(env_id)
            if window is None:
                window = self._windows[env_id] = deque(maxlen=self.n_step)
        window.append((state, action, reward, next_state, done))
        if len(window) < self.n_step:
            return
        reward_n, next_n, done_n = self._fold(window)
        s0, a0 = window[0][0], window[0][1]
        super().push(s0, a0, reward_n, next_n, done_n)

    def _fold(self, window):
        r, next_n, done_n = window[-1][2], window[-1][3], window[-1][4]
        for _, _, rwd, nxt, dn in reversed(list(window)[:-1]):
            r = self.gamma * r * (1 - dn) + rwd
            if dn:
                next_n, done_n = nxt, dn
        return r, next_n, done_n

    def clean_memory(self) -> None:
        super().clean_memory()
        self.window = deque(maxlen=self.n_step)
        self._windows = {}

    def state_dict(self):
        d = super().state_dict()
        d["fold_windows"] = _fold_windows_pickle(self.window, self._windows)
        return d

    def load_state_dict(self, d):
        super().load_state_dict(d)
        if "fold_windows" in d:
            self.window, self._windows = _unfold_windows_pickle(
                d["fold_windows"], self.n_step)
