"""Pose augmentation primitives: left/right flip, time reversal, re-skin.

The left/right flip with joint swap appears throughout the reference
(e.g. function_aug/model_pos_train.py:47-61, model_fk_gan_train.py:319-341);
here it is one gather with a precomputed permutation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dhaug_tpu.data.h36m import JOINTS_LEFT_16, JOINTS_RIGHT_16

# permutation that swaps left<->right 16-joint slots
_FLIP_PERM = np.arange(16)
for l, r in zip(JOINTS_LEFT_16, JOINTS_RIGHT_16):
    _FLIP_PERM[l], _FLIP_PERM[r] = r, l


def flip_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Mirror a 16-joint pose (..., 16, C) in x and swap left/right joints.
    Works for 2D and 3D."""
    flipped = pose.at[..., 0].multiply(-1.0)
    return flipped[..., _FLIP_PERM, :]


def flip_intrinsics(cam: jnp.ndarray) -> jnp.ndarray:
    """Negate principal-point x and tangential-distortion x for a flipped
    image (video_mode_operate.py:172-174).  cam (..., >=9)."""
    cam = cam.at[..., 2].multiply(-1.0)
    return cam.at[..., 7].multiply(-1.0)


def time_reverse(clip: jnp.ndarray) -> jnp.ndarray:
    """Reverse the frame axis of (..., F, J, C) clips — the 'playback'
    augmentation (video_GAN_fun.py:219-232)."""
    return jnp.flip(clip, axis=-3)
