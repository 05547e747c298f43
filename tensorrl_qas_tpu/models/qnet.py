"""Q-network models.

The reference uses a plain MLP with LeakyReLU + Dropout between layers and a
linear head (``agents/DeepQ.py:147-155``).  Shipped configs use 5x1000
hidden layers, dropout 0 — the matmuls are (batch, ~4k) x (4k, 1000) etc.,
which map straight onto the MXU; batch 1000 keeps it well fed.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp


class QNetwork(nn.Module):
    """MLP: state vector -> Q-values over the action space."""

    hidden: Sequence[int]
    n_actions: int
    dropout: float = 0.0
    negative_slope: float = 0.01  # torch LeakyReLU default
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for width in self.hidden:
            x = nn.Dense(width, param_dtype=self.param_dtype)(x)
            x = nn.leaky_relu(x, negative_slope=self.negative_slope)
            if self.dropout > 0.0:
                x = nn.Dropout(rate=self.dropout,
                               deterministic=deterministic)(x)
        return nn.Dense(self.n_actions, param_dtype=self.param_dtype)(x)
