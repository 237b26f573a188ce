"""Shared flax building blocks for the GAN nets and posenets."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# Kaiming-normal, matching the reference's global init_weights
# (models_baseline/mlp/linear_model.py:12-14).
kaiming = nn.initializers.he_normal()


class DenseResBlock(nn.Module):
    """Two-Dense residual block with ReLU — the reference's ``myResNet``
    (models_Fk_GAN/special_operate.py:490-510), the shared unit of the
    generator and every critic."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim, kernel_init=kaiming)(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, kernel_init=kaiming)(y)
        return nn.relu(y + x)


class DensePrelude(nn.Module):
    """Dense + ReLU input adapter (the ``previous``/``preprocess`` stage of
    the reference nets)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(nn.Dense(self.dim, kernel_init=kaiming)(x))


class ResTower(nn.Module):
    """Prelude + N residual blocks — the recurring critic branch shape."""

    dim: int
    blocks: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = DensePrelude(self.dim)(x)
        for _ in range(self.blocks):
            x = DenseResBlock(self.dim)(x)
        return x
