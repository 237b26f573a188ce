"""FK-GAN generator: noise -> joint angles + root -> DH-FK -> world pose.

Capability parity with Fk_Generator / Video_Fk_Generator
(models_Fk_GAN/Fk_generator.py:79,264).  TPU-first differences:

  * The network is a pure flax module producing the raw 35-dim head output;
    angle scatter/rescale, bone-length scaling, and the FK evaluation are a
    pure function (:func:`synthesize_poses`) of (head output, bone lengths,
    scaler, config) — so one jit compiles the whole noise->pose pipeline and
    nothing mutates module state (the reference threads a stateful FK class
    and a numpy RandomState through the forward pass).
  * The per-index Python scatter loop (Fk_generator.py:134-141) is a constant
    index-gather; the per-joint range rescale (:143-166) is one fused
    multiply-add with constant (37,) scale/offset vectors.
  * Video mode reuses the same pose assembly with an extra frame axis —
    the reference duplicates ~200 lines between the two generators.

Head-output layout quirk preserved exactly: the head emits 35 values; values
[0:31] fill the 31 non-structurally-zero slots of the 37-dim
[34 DOF + 3 global-rot] vector in order, value 31 is unused, and values
[32:35] are the root (tanh x 10) — as in Fk_generator.py:121-141.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.models.blocks import DenseResBlock, DensePrelude, kaiming
from dhaug_tpu.ops import fk as fkops

# Structurally-zero DOF slots (joint5, joint10, joint23, joint24, joint29,
# joint34 — Fk_generator.py:136).
ZERO_SLOTS = (4, 9, 22, 23, 28, 33)
NONZERO_SLOTS = tuple(i for i in range(37) if i not in ZERO_SLOTS)  # 31 slots

# GAN per-joint angle ranges (Fk_generator.py:41-76) + global rotation
# (Fk_generator.py:35-39), as (lo, hi) over the 37-dim vector.
_GAN_RANGES = (
    (-110, 65), (-110, 65), (-110, 180), (-180, 0), (0, 0),
    (-65, 110), (-65, 110), (-110, 180), (-180, 0), (0, 0),
    (-180, 180), (-180, 180), (-180, 180), (-180, 180), (-180, 180),
    (-180, 180), (-180, 180), (-180, 180), (-180, 180), (-180, 180),
    (-180, 180), (-180, 180), (0, 0), (0, 0),
    (-155, 65), (-155, 65), (-100, 180), (0, 180), (0, 0),
    (-65, 155), (-65, 155), (-100, 180), (0, 180), (0, 0),
    (-180, 180), (-180, 180), (-180, 180),
)
GAN_RANGE_LO = np.array([lo for lo, _ in _GAN_RANGES], np.float32)
GAN_RANGE_HI = np.array([hi for _, hi in _GAN_RANGES], np.float32)
GAN_RANGE_SCALE = (GAN_RANGE_HI - GAN_RANGE_LO) / 2.0
GAN_RANGE_MID = (GAN_RANGE_HI + GAN_RANGE_LO) / 2.0

# 8 mirrored bone-scaler groups -> 15 FK bones; thorax (bone 7) is never
# scaled (Fk_generator.py:216-230).
_SCALER_GROUPS = np.zeros((8, 15), np.float32)
for bone, group in enumerate([0, 0, 1, 1, 2, 2, 3, -1, 4, 4, 5, 5, 6, 6, 7]):
    if group >= 0:
        _SCALER_GROUPS[group, bone] = 1.0


class GeneratorConfig(NamedTuple):
    dense_dim: int = 1000          # --Gen_DenseDim
    output_dim: int = 35           # --GAN_OUTPUT_DIM
    noise_dim: int = 128
    use_pre_angle: bool = True     # --GAN_whether_use_preAngle
    use_global_rot: bool = True    # --whether_use_RT
    video_frames: int = 1          # >1 selects Video_Fk_Generator behaviour
    bf16_trunk: bool = False       # compute trunk matmuls in bfloat16
                                   # (fp32 params; FK/geometry stay fp32)


class FkGeneratorNet(nn.Module):
    """The dense trunk: noise (B, 128) -> head (B, F*35).

    Single-frame when ``video_frames == 1``; the video generator emits all
    frames of a clip from one noise vector (Fk_generator.py:290).
    """

    cfg: GeneratorConfig

    @nn.compact
    def __call__(self, noise: jnp.ndarray) -> jnp.ndarray:
        dt = jnp.bfloat16 if self.cfg.bf16_trunk else None
        x = DensePrelude(self.cfg.dense_dim, dtype=dt)(noise)
        x = DenseResBlock(self.cfg.dense_dim, dtype=dt)(x)
        x = DenseResBlock(self.cfg.dense_dim, dtype=dt)(x)
        x = DenseResBlock(self.cfg.dense_dim, dtype=dt)(x)
        out = nn.Dense(self.cfg.video_frames * self.cfg.output_dim,
                       kernel_init=kaiming, dtype=dt)(x)
        return out.astype(jnp.float32)


def head_to_angles(head: jnp.ndarray, cfg: GeneratorConfig):
    """Raw head output (..., 35) -> (angles37 degrees, root (..., 3)).

    Applies tanh squashing, the 31-slot scatter, the per-joint range rescale
    (or the x180 fallback), and the use_global_rot gate."""
    squashed = jnp.tanh(head)
    root = squashed[..., 32:35] * 10.0
    vals31 = squashed[..., :31]

    batch_shape = head.shape[:-1]
    angles37 = jnp.zeros(batch_shape + (37,), head.dtype)
    angles37 = angles37.at[..., np.array(NONZERO_SLOTS)].set(vals31)

    if cfg.use_pre_angle:
        # x * (hi-lo)/2 + (hi+lo)/2; zero-range slots have scale = mid = 0.
        angles37 = angles37 * jnp.asarray(GAN_RANGE_SCALE) + jnp.asarray(GAN_RANGE_MID)
    else:
        angles37 = angles37 * 180.0

    if not cfg.use_global_rot:
        angles37 = angles37.at[..., 34:].set(0.0)
    return angles37, root


def scale_bone_lengths(bone_len: jnp.ndarray, scaler8: jnp.ndarray) -> jnp.ndarray:
    """Apply the 8-group mirrored bone scalers: new = len * (1 + group ratio);
    thorax untouched (Fk_generator.py:216-230).  bone_len (..., 15) FK order;
    scaler8 (..., 8) in [-0.2, 0.2]."""
    import jax
    # geometry-path contraction: pin fp32 (TPU default bf16 accumulation
    # would put ~0.5 mm of noise on the synthesized bone lengths)
    ratio15 = jnp.einsum("gb,...g->...b", jnp.asarray(_SCALER_GROUPS), scaler8,
                         precision=jax.lax.Precision.HIGHEST)
    return bone_len * (1.0 + ratio15)


def synthesize_poses(head: jnp.ndarray, bone_len: jnp.ndarray,
                     scaler8: jnp.ndarray, cfg: GeneratorConfig,
                     use_pallas: bool = False, mesh=None,
                     interpret: bool = False) -> jnp.ndarray:
    """Assemble world poses from the generator head output.

    head:     (B, F*35) raw trunk output
    bone_len: (B, 15) FK-order bone lengths harvested from a real batch
    scaler8:  (B, 8) bone-length scaler ratios (shared across a clip's frames,
              Fk_generator.py:383-390)
    returns   (B, 16, 3) world poses, or (B, F, 16, 3) in video mode.

    ``use_pallas`` routes the FK chain through the fused Pallas kernel
    (ops/fk_pallas.py) — 5.7x faster on TPU, and DIFFERENTIABLE via the
    custom_vjp with the hand-derived reverse-chain backward kernel
    (fk_world_pose_pallas_vjp; gradcheck vs the XLA path in
    tests/test_fk_pallas.py), so it serves both the stop-gradient critic
    fakes and the generator updates.  Under a GSPMD data ``mesh`` the kernel
    is shard_mapped over 'data' (pallas_call does not partition
    automatically); ``interpret`` runs the kernel in interpreter mode (CPU
    test meshes / the multi-chip dryrun).
    """
    B = head.shape[0]
    F = cfg.video_frames
    head = head.reshape((B, F, cfg.output_dim))
    angles37, root = head_to_angles(head, cfg)

    scaled_bl = scale_bone_lengths(bone_len, scaler8)       # (B, 15)
    scaled_bl = jnp.broadcast_to(scaled_bl[:, None, :], (B, F, 15))

    if use_pallas:
        from dhaug_tpu.ops.fk_pallas import (fk_world_pose_pallas_sharded,
                                             fk_world_pose_pallas_vjp)
        fk_args = (angles37[..., :33].reshape((B * F, 33)),
                   scaled_bl.reshape((B * F, 15)),
                   angles37[..., 34:37].reshape((B * F, 3)),
                   root.reshape((B * F, 3)))
        if mesh is not None:
            pose16 = fk_world_pose_pallas_sharded(
                mesh, *fk_args, interpret=interpret).reshape((B, F, 16, 3))
        else:
            pose16 = fk_world_pose_pallas_vjp(
                *fk_args, interpret=interpret).reshape((B, F, 16, 3))
    else:
        pose16 = fkops.fk_world_pose(fkops.FKInputs(
            angles=angles37[..., :33],
            bone_len=scaled_bl,
            global_rot=angles37[..., 34:37],
            root=root,
        ), n_joints=16)                                      # (B, F, 16, 3)

    if F == 1:
        return pose16[:, 0]
    return pose16


def sample_scaler8(key, batch_size: int, mode: str) -> jnp.ndarray:
    """Bone-length scaler ratios per reference --bone_len_scaler semantics:
    'different' = independent per group, 'same' = one ratio broadcast to all
    groups, '' = zeros.  Ratios are uniform over {-0.200..0.199} like the
    reference's randint(-200, 200)/1000 (Fk_generator.py:195-210)."""
    import jax
    if mode == "different":
        ints = jax.random.randint(key, (batch_size, 8), -200, 200)
        return ints.astype(jnp.float32) / 1000.0
    if mode == "same":
        ints = jax.random.randint(key, (batch_size, 1), -200, 200)
        return jnp.broadcast_to(ints.astype(jnp.float32) / 1000.0, (batch_size, 8))
    if mode == "":
        return jnp.zeros((batch_size, 8), jnp.float32)
    raise ValueError(f"bone_len_scaler mode {mode!r}")
