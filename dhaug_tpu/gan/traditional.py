"""The non-GAN "traditional" random FK augmenter (--data_enhancement_method
normal).

Rebuilds handler_but_generater (forward_kinematics_DH_model.py:931-1152) and
traditional_solutions_FK_generator (model_fk_gan_train.py:37-93) as one
vectorized, jittable sampler: per-pose constraint tables become constant
(lo, hi) vectors, the random-DOF-subset selection becomes a rank mask, and
the 10k-pose loop becomes a single batched FK call.  Bone lengths and roots
are harvested from a pool of real poses instead of per-pose dict lookups.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.models.generator import scale_bone_lengths
from dhaug_tpu.ops import fk as fkops
from dhaug_tpu.ops.bones import bone_lengths_fk
from dhaug_tpu.ops.camera import project_to_2d, world_to_camera_batch

# Traditional per-joint angle ranges (forward_kinematics_DH_model.py:935-971),
# (lo, hi) for joints 1..34.  joint24 has no range in the reference (empty
# dict) and is excluded from the packed output; we give it (0, 0).
_TRAD_RANGES = (
    (-90, 45), (-90, 45), (-45, 120), (-135, 0), (0, 0),
    (-45, 90), (-45, 90), (-45, 120), (-135, 0), (0, 0),
    (-25, 25), (-10, 90), (-20, 20), (-20, 20), (-10, 45),
    (-25, 25), (-20, 20), (0, 0), (-20, 20), (-90, 90),
    (-20, 90), (-45, 45), (0, 0), (0, 0),
    (-135, 45), (-135, 45), (-45, 180), (0, 135), (0, 0),
    (-45, 135), (-45, 135), (-45, 180), (0, 135), (0, 0),
)
TRAD_LO = np.array([lo for lo, _ in _TRAD_RANGES], np.float32)   # (34,)
TRAD_HI = np.array([hi for _, hi in _TRAD_RANGES], np.float32)
# global rotation ranges (:972-976)
TRAD_GLOBAL_LO = np.array([-20.0, -20.0, -180.0], np.float32)
TRAD_GLOBAL_HI = np.array([20.0, 20.0, 180.0], np.float32)
_ANGLE_SIGMA = 60.0
# packed 33-layout drops joint24 (index 23)
_PACK_34_TO_33 = np.array([i for i in range(34) if i != 23])


class TraditionalConfig(NamedTuple):
    n_poses: int = 10000            # --generator_whole_number
    use_dataset_bone_len: bool = True   # --generator_choose_BoneLen
    use_dataset_root: bool = True       # --generator_choose_root_pos
    use_global_rot: bool = True         # --generator_global_rot
    bone_len_scaler: str = "different"  # --bone_len_scaler


def sample_traditional_angles(key, n: int):
    """(angles33 deg, global_rot3 deg) for n poses.  Each pose activates a
    random-size random subset of the 34 DOFs; active DOFs draw from a
    clipped Gaussian centred mid-range with sigma 60
    (forward_kinematics_DH_model.py:1002-1026)."""
    k_count, k_rank, k_norm, k_glob = jax.random.split(key, 4)
    mu = (TRAD_LO + TRAD_HI) / 2.0
    raw = mu + _ANGLE_SIGMA * jax.random.normal(k_norm, (n, 34))
    raw = jnp.clip(raw, jnp.asarray(TRAD_LO), jnp.asarray(TRAD_HI))

    count = jax.random.randint(k_count, (n, 1), 0, 34)
    scores = jax.random.uniform(k_rank, (n, 34))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    active = ranks < count
    angles34 = jnp.where(active, raw, 0.0)
    angles33 = angles34[:, _PACK_34_TO_33]

    g_mu = (TRAD_GLOBAL_LO + TRAD_GLOBAL_HI) / 2.0
    g = g_mu + _ANGLE_SIGMA * jax.random.normal(k_glob, (n, 3))
    global_rot = jnp.clip(g, jnp.asarray(TRAD_GLOBAL_LO), jnp.asarray(TRAD_GLOBAL_HI))
    return angles33, global_rot


def generate_traditional_poses(key, pose_pool_16: jnp.ndarray,
                               cfg: TraditionalConfig):
    """Sample cfg.n_poses augmented world poses.

    pose_pool_16: (P, 16, 3) real *world* poses to harvest bone lengths and
    roots from (the reference picks random dataset frames per pose,
    forward_kinematics_DH_model.py:993-1000).
    Returns (pose16_world (N, 16, 3), angles33, global_rot, bone_len, root).
    """
    n = cfg.n_poses
    k_ang, k_bl, k_root, k_scaler = jax.random.split(key, 4)
    angles33, global_rot = sample_traditional_angles(k_ang, n)
    if not cfg.use_global_rot:
        global_rot = jnp.zeros_like(global_rot)
    # first pose is the rest pose (frame_num > 0 gate, :1013,1032)
    angles33 = angles33.at[0].set(0.0)
    global_rot = global_rot.at[0].set(0.0)

    pool_bl = bone_lengths_fk(pose_pool_16)
    if cfg.use_dataset_bone_len:
        bl_idx = jax.random.randint(k_bl, (n,), 0, pose_pool_16.shape[0])
        bone_len = pool_bl[bl_idx]
    else:
        bone_len = jnp.broadcast_to(pool_bl[:1], (n, 15))

    if cfg.use_dataset_root:
        root_idx = jax.random.randint(k_root, (n,), 0, pose_pool_16.shape[0])
        root = pose_pool_16[root_idx, 0]
    else:
        root = jnp.zeros((n, 3))

    from dhaug_tpu.models.generator import sample_scaler8
    scaler = sample_scaler8(k_scaler, n, cfg.bone_len_scaler)
    bone_len = scale_bone_lengths(bone_len, scaler)

    pose16 = fkops.fk_world_pose(fkops.FKInputs(
        angles=angles33, bone_len=bone_len, global_rot=global_rot, root=root),
        n_joints=16)
    return pose16, angles33, global_rot, bone_len, root


def project_through_cameras(pose16_world: jnp.ndarray, cam_quats, cam_trans,
                            cam_intrs):
    """Project a pose set through every (subject, camera) pair — the
    traditional path feeds the posenet with all 4 cameras of every train
    subject (model_fk_gan_train.py:52-84).

    Returns (pos3d_cam (C*N, 16, 3), pos2d (C*N, 16, 2))."""
    outs_3d, outs_2d = [], []
    n = pose16_world.shape[0]
    for c in range(cam_quats.shape[0]):
        cam3d = world_to_camera_batch(pose16_world, cam_quats[c][None],
                                      cam_trans[c][None])
        intr = jnp.broadcast_to(cam_intrs[c][None], (n, 9))
        outs_3d.append(cam3d)
        outs_2d.append(project_to_2d(cam3d, intr))
    return jnp.concatenate(outs_3d), jnp.concatenate(outs_2d)
