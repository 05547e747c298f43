"""Checkpoint / resume.

Reference behavior (``TensorRL_fixed_noiseless.py:179-183, 239-252``): every
5 episodes save policy net, optimizer state, and the full replay buffer;
``init_net`` warm start reloads all three and optionally skips the epsilon
restart.  We save the Flax param pytree + Optax state via
``flax.serialization`` (msgpack) and the array-backed replay buffer via
compressed npz, plus curriculum and RNG state so resume is exact.
"""

from __future__ import annotations

import os
import pickle

import flax.serialization
import numpy as np


def save_checkpoint(path_prefix: str, agent, env=None) -> None:
    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    with open(path_prefix + "_agent.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(agent.state_dict()))
    np.savez_compressed(path_prefix + "_replay.npz",
                        **agent.memory.state_dict())
    if env is not None:
        # curriculum + the env's RNG streams (reset-halt draws / noise
        # key), so a resumed run replays the exact trajectory
        payload = {"curricula": env.curriculum_state(),
                   "np_rng": getattr(env, "_np_rng", None),
                   "key": (np.asarray(env._key)
                           if hasattr(env, "_key") else None)}
        with open(path_prefix + "_env.pkl", "wb") as f:
            pickle.dump(payload, f)


def load_checkpoint(path_prefix: str, agent, env=None,
                    restore_replay: bool = True) -> None:
    with open(path_prefix + "_agent.msgpack", "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    # Restore into the structure of a fresh state_dict, but tolerate older
    # checkpoints that predate later-added keys (e.g. pre-round-4 payloads
    # have no 'rng_state'): from_bytes against the full target would raise
    # a key-mismatch ValueError, so drop absent keys from the target first
    # and let load_state_dict's own d.get() defaults cover them.
    target = agent.state_dict()
    for k in [k for k in target if k not in raw]:
        target.pop(k)
    restored = flax.serialization.from_state_dict(target, raw)
    agent.load_state_dict(restored)
    if restore_replay and os.path.exists(path_prefix + "_replay.npz"):
        data = np.load(path_prefix + "_replay.npz", allow_pickle=True)
        agent.memory.load_state_dict({k: data[k] for k in data.files})
    if env is not None and os.path.exists(path_prefix + "_env.pkl"):
        with open(path_prefix + "_env.pkl", "rb") as f:
            payload = pickle.load(f)
        env.load_curriculum_state(payload["curricula"])
        if payload.get("np_rng") is not None:
            env._np_rng = payload["np_rng"]
        if payload.get("key") is not None:
            import jax.numpy as jnp

            env._key = jnp.asarray(payload["key"])
