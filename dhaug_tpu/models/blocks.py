"""Shared flax building blocks for the GAN nets and posenets."""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

# Kaiming-normal, matching the reference's global init_weights
# (models_baseline/mlp/linear_model.py:12-14).
kaiming = nn.initializers.he_normal()

Dtype = Optional[Any]


class DenseResBlock(nn.Module):
    """Two-Dense residual block with ReLU — the reference's ``myResNet``
    (models_Fk_GAN/special_operate.py:490-510), the shared unit of the
    generator and every critic.

    ``dtype`` sets the computation dtype (params stay fp32): pass
    jnp.bfloat16 on synthesis-heavy paths to run the matmuls at the MXU's
    native width.
    """

    dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim, kernel_init=kaiming, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, kernel_init=kaiming, dtype=self.dtype)(y)
        return nn.relu(y + x)


class DensePrelude(nn.Module):
    """Dense + ReLU input adapter (the ``previous``/``preprocess`` stage of
    the reference nets)."""

    dim: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(nn.Dense(self.dim, kernel_init=kaiming,
                                dtype=self.dtype)(x))


class ResTower(nn.Module):
    """Prelude + N residual blocks — the recurring critic branch shape."""

    dim: int
    blocks: int = 3
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = DensePrelude(self.dim, dtype=self.dtype)(x)
        for _ in range(self.blocks):
            x = DenseResBlock(self.dim, dtype=self.dtype)(x)
        return x
