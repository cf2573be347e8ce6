"""Stability-classifier architectures.

Parity: ``minbody/model_zoo.py:18-37`` — MLP input -> 128 -> 64 -> 1,
ReLU, dropout 0.25, logits out.

TPU-first: the model is Flax (runs on the same TPU as the simulation
fleet; bfloat16-friendly matmuls).  A torch copy of the same
architecture is provided for drop-in compatibility with reference
checkpoints.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    """128-64-1 ReLU classifier with dropout 0.25 (model_zoo.py:18-33)."""

    hidden1: int = 128
    hidden2: int = 64
    dropout_rate: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Dense(self.hidden1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.hidden2, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x


def make_mlp(input_dim: int, seed: int = 0):
    """Create (module, params) for an input dimension
    (model_zoo.py:36-37)."""
    model = MLP()
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, input_dim), jnp.float32))
    return model, params


def make_torch_mlp(input_dim: int):
    """Torch twin of the reference architecture, for loading/serving
    reference ``mlp_model.pth`` checkpoints."""
    import torch.nn as tnn

    class TorchMLP(tnn.Module):
        def __init__(self, d):
            super().__init__()
            self.fc1 = tnn.Linear(d, 128)
            self.dropout1 = tnn.Dropout(0.25)
            self.fc2 = tnn.Linear(128, 64)
            self.dropout2 = tnn.Dropout(0.25)
            self.fc3 = tnn.Linear(64, 1)

        def forward(self, x):
            import torch

            x = torch.relu(self.fc1(x))
            x = self.dropout1(x)
            x = torch.relu(self.fc2(x))
            x = self.dropout2(x)
            return self.fc3(x)

    return TorchMLP(input_dim)
