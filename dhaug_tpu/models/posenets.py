"""Pose-estimator zoo: MLP, SemGCN, VideoPose temporal convs, PoseFormer.

Capability parity with the reference zoo (factory
function_baseline/model_pos_preparation.py:18):

  * ``LinearModel``      <- models_baseline/mlp/linear_model.py:47 (Martinez MLP)
  * ``SemGCN``           <- models_baseline/gcn/sem_gcn.py:66
  * ``TemporalPoseNet``  <- model_VideoPose3D.py:163 (widths all 1 ==
    single-frame 'videopose') and models_Fk_GAN/mulit_farme_videopose.py:74,136
    (multi-frame dilated/strided twins).  One flax module covers all four
    reference classes: ``strided=True`` is the training-time optimized net,
    ``strided=False`` the dilated eval net, and both share an identical
    parameter pytree so weights swap between them exactly like the
    reference's interchangeable state_dicts (model_pos_preparation.py:42-50).
  * ``PoseFormer``       <- models_baseline/poseformer/model_poseformer.py:85.

All BatchNorm modules use the torch-convention ``BatchNorm`` below via the
mutable ``batch_stats`` collection; dropout draws from the 'dropout' rng.
Torch BN momentum 0.1 == flax-style 0.9.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.models.blocks import kaiming


class BatchNorm(nn.Module):
    """Torch-convention batch norm (torch.nn.BatchNorm1d semantics).

    Normalizes with the BIASED batch variance but updates the running
    variance with the UNBIASED estimate (factor n/(n-1)) — exactly what
    torch does, and what the reference posenets train with.  flax's
    nn.BatchNorm uses the biased variance for the running update too, which
    drifts eval-time behaviour from the reference by O(1/batch) per step
    (pinned by tests/test_reference_parity.py::TestPosenetUpdateParity).
    Same param/stat leaf names and auto-name ("BatchNorm_N") as the flax
    module, so transplants and checkpoints are layout-identical."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        ax = self.axis % x.ndim
        feat = x.shape[ax]
        reduce_axes = tuple(i for i in range(x.ndim) if i != ax)
        shape = [1] * x.ndim
        shape[ax] = feat
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x - mean.reshape(shape)),
                           axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + \
                    (1.0 - m) * var * (n / max(n - 1, 1))
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon)
        return y * scale.reshape(shape) + bias.reshape(shape)


def pad_hip(out15: jnp.ndarray) -> jnp.ndarray:
    """(B, 45) 15-joint prediction -> (B, 16, 3) with zero hip at joint 0."""
    B = out15.shape[0]
    return jnp.concatenate(
        [jnp.zeros((B, 3), out15.dtype), out15.reshape((B, 45))], axis=1
    ).reshape((B, 16, 3))


# ---------------------------------------------------------------------------
# Martinez-style MLP
# ---------------------------------------------------------------------------

class _LinearStage(nn.Module):
    dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Dense(self.dim, kernel_init=kaiming)(x)
        y = BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, kernel_init=kaiming)(y)
        y = BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class LinearModel(nn.Module):
    """16x2 -> 1024 -> num_stage residual stages -> 15x3, hip zero-padded."""

    linear_size: int = 1024
    num_stage: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape((x.shape[0], 32))
        y = nn.Dense(self.linear_size, kernel_init=kaiming)(x)
        y = BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        for _ in range(self.num_stage):
            y = _LinearStage(self.linear_size, self.dropout)(y, train)
        y = nn.Dense(45, kernel_init=kaiming)(y)
        return pad_hip(y)


# ---------------------------------------------------------------------------
# SemGCN
# ---------------------------------------------------------------------------

def adjacency_from_edges(num_joints: int, edges) -> np.ndarray:
    """Row-normalized symmetric adjacency with self-loops
    (models_baseline/gcn/graph_utils.py:27-45)."""
    A = np.zeros((num_joints, num_joints), np.float32)
    for i, j in edges:
        A[i, j] = 1.0
        A[j, i] = 1.0
    A = A + np.eye(num_joints, dtype=np.float32)
    rowsum = A.sum(1)
    inv = np.where(rowsum > 0, 1.0 / rowsum, 0.0)
    return (A * inv[:, None]).astype(np.float32)


def adjacency_from_skeleton(skeleton) -> np.ndarray:
    edges = [(c, p) for c, p in enumerate(skeleton.parents()) if p >= 0]
    return adjacency_from_edges(skeleton.num_joints(), edges)


class SemGraphConv(nn.Module):
    """Semantic graph conv: learned per-edge weights softmaxed over the
    adjacency support; separate self/neighbour projections
    (models_baseline/gcn/sem_graph_conv.py:9-48)."""

    out_features: int
    adj: np.ndarray  # (J, J) static support (values > 0 define the mask)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        J = self.adj.shape[0]
        rows, cols = np.where(np.asarray(self.adj) > 0)
        xavier = nn.initializers.variance_scaling(1.414 ** 2, "fan_avg", "uniform")
        W = self.param("W", xavier, (2, x.shape[-1], self.out_features))
        e = self.param("e", nn.initializers.ones, (len(rows),))
        bias = self.param("bias", nn.initializers.zeros, (self.out_features,))

        h0 = jnp.einsum("...jc,cd->...jd", x, W[0])
        h1 = jnp.einsum("...jc,cd->...jd", x, W[1])

        logits = jnp.full((J, J), -9e15, x.dtype)
        logits = logits.at[rows, cols].set(e)
        attn = nn.softmax(logits, axis=1)
        eye = jnp.eye(J, dtype=x.dtype)
        out = jnp.einsum("ij,...jd->...id", attn * eye, h0) + \
            jnp.einsum("ij,...jd->...id", attn * (1 - eye), h1)
        return out + bias


class _GraphConvBlock(nn.Module):
    out_dim: int
    adj: np.ndarray
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        x = SemGraphConv(self.out_dim, self.adj)(x)
        # BN over channels, statistics pooled across batch and joints
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         axis=-1)(x)
        if self.dropout:
            # reference applies dropout(relu(x)) then relu again
            x = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(x))
        return nn.relu(x)


class SemGCN(nn.Module):
    """(B, 16, 2) -> (B, 16, 3); hid_dim 128, num_layers residual GCN blocks."""

    adj: np.ndarray
    hid_dim: int = 128
    num_layers: int = 4
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape((x.shape[0], 16, 2))
        out = _GraphConvBlock(self.hid_dim, self.adj, self.dropout)(x, train)
        for _ in range(self.num_layers):
            res = out
            out = _GraphConvBlock(self.hid_dim, self.adj, self.dropout)(out, train)
            out = _GraphConvBlock(self.hid_dim, self.adj, self.dropout)(out, train)
            out = res + out
        return SemGraphConv(3, self.adj)(out)


# ---------------------------------------------------------------------------
# VideoPose3D temporal conv family
# ---------------------------------------------------------------------------

class TemporalPoseNet(nn.Module):
    """Temporal dilated/strided conv posenet over (B, T, 16, 2).

    strided=True: training net — convolutions with stride == width collapse
    the receptive field to one output frame (TemporalModelOptimized1f).
    strided=False: evaluation net — dilated convolutions keep all valid
    frames (TemporalModel); used for whole-sequence inference.

    out_joints=15 + pad_hip_joint=True reproduces the single-frame
    'videopose' head (model_VideoPose3D.py:99); out_joints=16 without pad is
    the multi-frame variant.  Parameter pytrees are identical between the
    twins, so train weights load straight into the eval net.
    """

    filter_widths: Tuple[int, ...]
    out_joints: int = 16
    pad_hip_joint: bool = False
    channels: int = 1024
    dropout: float = 0.25
    strided: bool = True

    def receptive_field(self) -> int:
        rf = 1
        for w in self.filter_widths:
            rf *= w
        return rf

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B = x.shape[0]
        if x.ndim == 2:          # (B, 32) single-frame flat input
            x = x.reshape((B, 1, 16, 2))
        elif x.ndim == 3:        # (B, 16, 2)
            x = x[:, None]
        T = x.shape[1]
        x = x.reshape((B, T, 32))

        w0 = self.filter_widths[0]
        x = nn.Conv(self.channels, (w0,), strides=(w0,) if self.strided else (1,),
                    padding="VALID", use_bias=False, kernel_init=kaiming,
                    name="expand_conv")(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         name="expand_bn")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(x))

        next_dilation = w0
        for i, w in enumerate(self.filter_widths[1:]):
            if self.strided:
                res = x[:, w // 2 :: w]
            else:
                pad = (w - 1) * next_dilation // 2
                res = x[:, pad : x.shape[1] - pad]
            y = nn.Conv(self.channels, (w,),
                        strides=(w,) if self.strided else (1,),
                        kernel_dilation=(1,) if self.strided else (next_dilation,),
                        padding="VALID", use_bias=False, kernel_init=kaiming,
                        name=f"conv_{i}a")(x)
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn_{i}a")(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y))
            y2 = nn.Conv(self.channels, (1,), padding="VALID", use_bias=False,
                         kernel_init=kaiming, name=f"conv_{i}b")(y)
            y2 = BatchNorm(use_running_average=not train, momentum=0.9,
                              name=f"bn_{i}b")(y2)
            y2 = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(y2))
            x = res + y2
            next_dilation *= w

        x = nn.Conv(self.out_joints * 3, (1,), padding="VALID",
                    kernel_init=kaiming, name="shrink")(x)    # (B, T_out, J*3)

        if self.pad_hip_joint:
            # single-frame head: T_out == 1, 15 joints -> 16 with zero hip
            out = x.reshape((B, self.out_joints * 3))
            return pad_hip(out)
        return x.reshape((B, -1, self.out_joints, 3))


# ---------------------------------------------------------------------------
# PoseFormer
# ---------------------------------------------------------------------------

class _MHABlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    drop_path: float
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            deterministic=not train, dropout_rate=self.dropout)(h, h)
        if self.drop_path > 0:
            # stochastic depth: drop the whole residual branch per sample
            h = nn.Dropout(self.drop_path, broadcast_dims=(1, 2),
                           deterministic=not train)(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio))(h)
        # exact (erf) GELU — torch nn.GELU's default, used by the reference's
        # Mlp (model_poseformer.py:20); flax's default is the tanh approx
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if self.drop_path > 0:
            h = nn.Dropout(self.drop_path, broadcast_dims=(1, 2),
                           deterministic=not train)(h)
        return x + h


class PoseFormer(nn.Module):
    """Spatial transformer per frame + temporal transformer + weighted mean
    over frames -> centre-frame 3D pose (B, 1, J, 3)."""

    num_frame: int = 9
    num_joints: int = 16
    embed_dim_ratio: int = 32
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        F, J, C = self.num_frame, self.num_joints, self.embed_dim_ratio
        embed_dim = C * J
        x = x.reshape((-1, F, J, 2))
        B = x.shape[0]

        # spatial transformer over joints, per frame
        h = nn.Dense(C, name="patch_embed")(x.reshape((B * F, J, 2)))
        spatial_pos = self.param("spatial_pos_embed",
                                 nn.initializers.zeros, (1, J, C))
        h = h + spatial_pos
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            h = _MHABlock(C, self.num_heads, self.mlp_ratio, float(dpr[i]),
                          self.dropout)(h, train)
        h = nn.LayerNorm(epsilon=1e-6, name="spatial_norm")(h)
        h = h.reshape((B, F, embed_dim))

        # temporal transformer over frames
        temporal_pos = self.param("temporal_pos_embed",
                                  nn.initializers.zeros, (1, F, embed_dim))
        h = h + temporal_pos
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for i in range(self.depth):
            h = _MHABlock(embed_dim, self.num_heads, self.mlp_ratio,
                          float(dpr[i]), self.dropout)(h, train)
        h = nn.LayerNorm(epsilon=1e-6, name="temporal_norm")(h)

        # weighted mean over frames (the reference's 1x1 Conv1d over frames)
        weights = self.param("frame_weights", nn.initializers.lecun_normal(),
                             (F, 1))
        frame_bias = self.param("frame_bias", nn.initializers.zeros, (1,))
        h = jnp.einsum("bfe,fo->boe", h, weights) + frame_bias[:, None]

        # the reference's head LayerNorm is a plain nn.LayerNorm (torch
        # default eps 1e-5), NOT the eps-1e-6 partial used by the blocks
        # (model_poseformer.py:142-145)
        h = nn.LayerNorm(epsilon=1e-5)(h)
        out = nn.Dense(J * 3, name="head")(h)
        return out.reshape((B, 1, J, 3))
