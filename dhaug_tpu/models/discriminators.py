"""WGAN critics: 3D (KCS + pose), 2D, and the video/motion variants.

Capability parity with models_Fk_GAN/Fk_discriminator.py:
  * Fk3DDiscriminator    <- Fk_3D_Discriminator (:149)
  * Fk2DDiscriminator    <- Fk_2D_Discriminator (:236)
  * MotionFk3DDiscriminator <- Video_motion_Fk_3D_Discriminator (:381)
  * MotionFk2DDiscriminator <- Video_motion_Fk_2D_Discriminator (:516)

The KCS feature transform lives in dhaug_tpu.ops.bones (vectorised einsum);
temporal differences are one slice-subtract instead of the reference's
per-frame Python loops (:458-460, :489-492, :570-573).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dhaug_tpu.models.blocks import DenseResBlock, DensePrelude, ResTower, kaiming
from dhaug_tpu.ops.bones import kcs_features


class Fk3DDiscriminator(nn.Module):
    """Two-branch critic on root-relative 3D poses (B, 16, 3):
    KCS(30) branch || raw-pose(48) branch -> concat -> merge(100) -> scalar."""

    dense_dim: int = 1000  # --Dis_DenseDim_3D

    @nn.compact
    def __call__(self, pose3d: jnp.ndarray) -> jnp.ndarray:
        pose3d = pose3d.reshape((-1, 16, 3))
        kcs = kcs_features(pose3d, with_lengths=True)         # (B, 30)
        kcs_out = ResTower(self.dense_dim)(kcs)
        pos_out = ResTower(self.dense_dim)(pose3d.reshape((-1, 48)))
        merged = jnp.concatenate([kcs_out, pos_out], axis=-1)
        merged = DensePrelude(100)(merged)
        merged = DenseResBlock(100)(merged)
        return nn.Dense(1, kernel_init=kaiming)(merged)


class Fk2DDiscriminator(nn.Module):
    """4-layer LeakyReLU MLP on (B, 16, 2) with one residual hop
    (d3 = lrelu(l3(d2) + d1); d4 has no activation)."""

    dense_dim: int = 1000  # --Dis_DenseDim_2D

    @nn.compact
    def __call__(self, pose2d: jnp.ndarray) -> jnp.ndarray:
        x = pose2d.reshape((-1, 32))
        d1 = nn.leaky_relu(nn.Dense(self.dense_dim, kernel_init=kaiming)(x))
        d2 = nn.leaky_relu(nn.Dense(self.dense_dim, kernel_init=kaiming)(d1))
        d3 = nn.leaky_relu(nn.Dense(self.dense_dim, kernel_init=kaiming)(d2) + d1)
        d4 = nn.Dense(self.dense_dim, kernel_init=kaiming)(d3)
        d_last = nn.leaky_relu(nn.Dense(self.dense_dim, kernel_init=kaiming)(d4))
        return nn.Dense(1, kernel_init=kaiming)(d_last)


def temporal_diff(x: jnp.ndarray) -> jnp.ndarray:
    """(B, F, ...) -> (B, F-1, ...) adjacent-frame differences."""
    return x[:, 1:] - x[:, :-1]


class MotionFk3DDiscriminator(nn.Module):
    """Video/motion 3D critic over clips (B, F, 16, 3): KCS(F*15) and
    diff-KCS((F-1)*15) branches always on; raw-3D and diff-3D branches gated
    by config flags (--motion_Dis_whether_use_3dPos/3dDiff_branch)."""

    video_frames: int
    dense_dim: int = 1000  # --video_Dis_DenseDim_3D
    use_pos_branch: bool = True
    use_diff_branch: bool = True

    @nn.compact
    def __call__(self, clip3d: jnp.ndarray) -> jnp.ndarray:
        F = self.video_frames
        clip3d = clip3d.reshape((-1, F, 16, 3))
        kcs = kcs_features(clip3d, with_lengths=False)        # (B, F, 15)

        branches = [
            ResTower(self.dense_dim)(kcs.reshape((-1, F * 15))),
            ResTower(self.dense_dim)(temporal_diff(kcs).reshape((-1, (F - 1) * 15))),
        ]
        if self.use_pos_branch:
            branches.append(ResTower(self.dense_dim)(clip3d.reshape((-1, F * 48))))
        if self.use_diff_branch:
            diff3d = temporal_diff(clip3d.reshape((-1, F, 48)))
            branches.append(ResTower(self.dense_dim)(diff3d.reshape((-1, (F - 1) * 48))))

        merged = jnp.concatenate(branches, axis=-1)
        merged = DensePrelude(100)(merged)
        merged = DenseResBlock(100)(merged)
        return nn.Dense(1, kernel_init=kaiming)(merged)


class MotionFk2DDiscriminator(nn.Module):
    """Video/motion 2D critic over clips (B, F, 16, 2): raw-2D branch +
    root-trajectory-difference branch ((F-1) x 2 of hip displacement)."""

    video_frames: int
    dense_dim: int = 1000  # --video_Dis_DenseDim_2D

    @nn.compact
    def __call__(self, clip2d: jnp.ndarray) -> jnp.ndarray:
        F = self.video_frames
        clip2d = clip2d.reshape((-1, F, 16, 2))
        pos_out = ResTower(self.dense_dim)(clip2d.reshape((-1, F * 32)))
        root_traj = clip2d[:, :, 0, :]                        # (B, F, 2)
        root_diff = temporal_diff(root_traj).reshape((-1, (F - 1) * 2))
        diff_out = ResTower(self.dense_dim)(root_diff)
        merged = jnp.concatenate([pos_out, diff_out], axis=-1)
        merged = DensePrelude(100)(merged)
        merged = DenseResBlock(100)(merged)
        return nn.Dense(1, kernel_init=kaiming)(merged)
