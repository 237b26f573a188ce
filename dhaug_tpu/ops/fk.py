"""Denavit-Hartenberg forward kinematics for the 16-joint DH-AUG human model.

This is the TPU-native rebuild of the reference's stateful
``Forward_Kinematics_DH_Model`` (DH-AUG_master/models_Fk_GAN/
forward_kinematics_DH_model.py:194).  Design differences:

  * **Pure function of data.**  The reference pre-broadcasts every DH table to
    a fixed ``batch_size * receptive_field`` on the GPU at construction
    (forward_kinematics_DH_model.py:274-352) and mutates them per call
    (:571-589).  Here the tables are compile-time constants and
    :func:`fk_world_pose` maps over arbitrary leading batch dims; ``vmap`` /
    broadcasting replace the baked-in batch.
  * **(R, p) chain recurrence instead of 4x4 chain products.**  The reference
    multiplies full 4x4 homogeneous matrices sequentially with ``torch.bmm`` +
    ``torch.clone`` (:659-677).  Only the translation column is ever read, so
    we carry a 3x3 rotation and a 3-vector:  R_i = R_{i-1} @ Q_i,
    p_i = R_{i-1} @ t_i + p_{i-1}.  The <=14-step chains are unrolled at trace
    time — no data-dependent control flow, everything fuses under jit.
  * Angles are packed in one (..., 33) array in chain order
    [right_leg(5), left_leg(5), body(13), right_hand(5), left_hand(5)], the
    same order both reference generator paths slice
    (Fk_generator.py:179-184, forward_kinematics_DH_model.py:1074-1078).

Numerical conventions copied exactly from the reference:
  * modified-DH link matrix (forward_kinematics_DH_model.py:54-78):
      [[cos t, -sin t,      0,        a],
       [sin t cos al, cos t cos al, -sin al, -sin al * d],
       [sin t sin al, cos t sin al,  cos al,  cos al * d],
       [0, 0, 0, 1]]
    with alpha/theta in **degrees**.
  * global rotation = Rx @ Ry @ Rz XYZ Euler, degrees
    (forward_kinematics_DH_model.py:120-139).
  * 15 bone lengths in FK order (forward_kinematics_DH_model.py:46-49) rewrite
    the a/d entries (:571-589); chain joints scatter into the 32-slot H36M
    layout (:751-817).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# The chain matmuls are tiny (3x3) but feed bone-length-exact geometry; TPU
# default (bf16 accumulate) costs ~16 mm of bone-length error, so force full
# fp32 MXU passes — measured cost is nil at these shapes.
_PRECISION = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Static skeleton specification (degrees / canonical metres).
# Constants transcribed from forward_kinematics_DH_model.py:234-261.
# ---------------------------------------------------------------------------

RIGHT_LEG_ALPHA = (0.0, -90.0, -90.0, 0.0, 0.0)
RIGHT_LEG_A = (0.25, 0.0, 0.0, 0.6, 0.5)
RIGHT_LEG_D = (0.0, 0.0, 0.0, 0.0, 0.0)
RIGHT_LEG_THETA = (0.0, -90.0, 180.0, 0.0, 0.0)

LEFT_LEG_ALPHA = (0.0, 90.0, 90.0, 0.0, 0.0)
LEFT_LEG_A = (-0.25, 0.0, 0.0, 0.6, 0.5)
LEFT_LEG_D = (0.0, 0.0, 0.0, 0.0, 0.0)
LEFT_LEG_THETA = (180.0, -90.0, 0.0, 0.0, 0.0)

BODY_ALPHA = (0.0, -90.0, -90.0, -90.0, -90.0, -90.0, -90.0,
              -90.0, -90.0, -90.0, -90.0, -90.0, 90.0)
BODY_A = (0.0,) * 12 + (0.15,)
BODY_D = (0.0, 0.0, 0.0, 0.25, 0.0, 0.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
BODY_THETA = (90.0, -90.0, -90.0, -90.0, -90.0, -90.0, -90.0,
              -90.0, -90.0, -90.0, -90.0, 0.0, 0.0)

RIGHT_HAND_ALPHA = (-90.0, -90.0, -90.0, 0.0, 0.0)
RIGHT_HAND_A = (-0.3, 0.0, 0.0, 0.4, 0.35)
RIGHT_HAND_D = (0.0, 0.0, 0.0, 0.0, 0.0)
RIGHT_HAND_THETA = (-180.0, -90.0, 180.0, 0.0, 0.0)

LEFT_HAND_ALPHA = (-90.0, 90.0, 90.0, 0.0, 0.0)
LEFT_HAND_A = (0.3, 0.0, 0.0, 0.4, 0.35)
LEFT_HAND_D = (0.0, 0.0, 0.0, 0.0, 0.0)
LEFT_HAND_THETA = (0.0, -90.0, 0.0, 0.0, 0.0)

# 15 bones in FK order: pairs of 16-joint indices
# (forward_kinematics_DH_model.py:46-49).
USED_16KEY_15BONE_TABLE = (
    (5, 6), (2, 3), (4, 5), (1, 2),
    (0, 4), (0, 1), (0, 7), (7, 8), (8, 10), (8, 13),
    (10, 11), (13, 14), (11, 12), (14, 15),
    (8, 9),
)
BONE_NAMES = (
    "left_small_leg", "right_small_leg", "left_big_leg", "right_big_leg",
    "left_hip", "right_hip", "waist", "thorax", "left_shoulder",
    "right_shoulder", "left_big_arm", "right_big_arm", "left_small_arm",
    "right_small_arm", "neck",
)
# Canonical bone lengths of init_Fk_DH_angle (forward_kinematics_DH_model.py:840-854).
CANONICAL_BONE_LEN = (0.5, 0.5, 0.6, 0.6, 0.25, 0.25, 0.25, 0.2,
                      0.4, 0.4, 0.4, 0.4, 0.35, 0.35, 0.15)

# chain-packed 33-angle layout
RIGHT_LEG_SLICE = slice(0, 5)
LEFT_LEG_SLICE = slice(5, 10)
BODY_SLICE = slice(10, 23)
RIGHT_HAND_SLICE = slice(23, 28)
LEFT_HAND_SLICE = slice(28, 33)
N_CHAIN_ANGLES = 33

# H36M 32-slot scatter: (slot, chain, chain_joint_index)
# (forward_kinematics_DH_model.py:751-817)
H36M_32_TO_16_TABLE = (0, 1, 2, 3, 6, 7, 8, 12, 13, 15, 17, 18, 19, 25, 26, 27)

_SCATTER = (
    (0, "body", 0),        # Hip
    (1, "right_leg", 0),   # RHip
    (2, "right_leg", 3),   # RKnee
    (3, "right_leg", 4),   # RAnkle
    (6, "left_leg", 0),    # LHip
    (7, "left_leg", 3),    # LKnee
    (8, "left_leg", 4),    # LAnkle
    (12, "body", 3),       # Spine
    (13, "body", 6),       # Thorax
    (14, "body", 12),      # Neck/Nose
    (15, "body", 12),      # Head (same as neck endpoint in the reference)
    (17, "left_hand", 9),  # LShoulder
    (18, "left_hand", 12),  # LElbow
    (19, "left_hand", 13),  # LWrist
    (25, "right_hand", 9),  # RShoulder
    (26, "right_hand", 12),  # RElbow
    (27, "right_hand", 13),  # RWrist
)

_DEG = np.pi / 180.0


class FKInputs(NamedTuple):
    """Batched FK inputs.  All leading dims broadcast together.

    angles:     (..., 33) joint angles in degrees, chain-packed order
                [right_leg(5), left_leg(5), body(13), right_hand(5), left_hand(5)]
    bone_len:   (..., 15) bone lengths in metres, FK bone order
    global_rot: (..., 3) XYZ Euler global rotation, degrees
    root:       (..., 3) world-space root (hip) translation, metres
    """
    angles: jnp.ndarray
    bone_len: jnp.ndarray
    global_rot: jnp.ndarray
    root: jnp.ndarray


def euler_xyz_rotation(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Rx @ Ry @ Rz from (..., 3) XYZ Euler angles in degrees.

    Matches rotationMatrix (forward_kinematics_DH_model.py:120-191).
    """
    rad = angles_deg * _DEG
    cx, cy, cz = jnp.cos(rad[..., 0]), jnp.cos(rad[..., 1]), jnp.cos(rad[..., 2])
    sx, sy, sz = jnp.sin(rad[..., 0]), jnp.sin(rad[..., 1]), jnp.sin(rad[..., 2])
    # Closed-form product of Rx(x) @ Ry(y) @ Rz(z).
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = sx * sy * cz + cx * sz
    r11 = -sx * sy * sz + cx * cz
    r12 = -sx * cy
    r20 = -cx * sy * cz + sx * sz
    r21 = cx * sy * sz + sx * cz
    r22 = cx * cy
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def _link_rot_trans(alpha_deg: float, a, d, theta_deg: jnp.ndarray):
    """Rotation block Q (..., 3, 3) and translation t (..., 3) of one DH link.

    ``alpha`` is a per-link constant; ``a``/``d`` are scalars or (...,) arrays
    (bone lengths); ``theta`` is the per-sample joint angle in degrees.
    """
    al = alpha_deg * _DEG
    ca, sa = np.cos(al), np.sin(al)
    th = theta_deg * _DEG
    ct, st = jnp.cos(th), jnp.sin(th)
    zero = jnp.zeros_like(ct)
    Q = jnp.stack([
        jnp.stack([ct, -st, zero], axis=-1),
        jnp.stack([st * ca, ct * ca, jnp.full_like(ct, -sa)], axis=-1),
        jnp.stack([st * sa, ct * sa, jnp.full_like(ct, ca)], axis=-1),
    ], axis=-2)
    a = jnp.broadcast_to(jnp.asarray(a, dtype=ct.dtype), ct.shape)
    d = jnp.broadcast_to(jnp.asarray(d, dtype=ct.dtype), ct.shape)
    t = jnp.stack([a, -sa * d, ca * d], axis=-1)
    return Q, t


def _run_chain(alphas, a_list, d_list, theta0, angles, start_R=None, start_p=None):
    """Unrolled (R, p) chain walk.  Returns list of joint positions (..., 3)
    and the list of cumulative rotations (for chain reuse by the arm chains).

    angles: (..., L) joint angles in degrees added to the theta offsets.
    a_list/d_list entries may be (...,) bone-length arrays.
    """
    positions = []
    rotations = []
    R = start_R
    p = start_p
    for i in range(len(alphas)):
        Q, t = _link_rot_trans(alphas[i], a_list[i], d_list[i], theta0[i] + angles[..., i])
        if R is None:
            p = t
            R = Q
        else:
            p = p + jnp.einsum("...ij,...j->...i", R, t, precision=_PRECISION)
            R = jnp.einsum("...ij,...jk->...ik", R, Q, precision=_PRECISION)
        positions.append(p)
        rotations.append(R)
    return positions, rotations


def fk_world_pose(inputs: FKInputs, n_joints: int = 32) -> jnp.ndarray:
    """Evaluate the DH human model.  Returns world pose (..., 32, 3) (or the
    16-joint gather when ``n_joints == 16``).

    Semantics match ``change_3d_joint_angle`` (forward_kinematics_DH_model.py:354):
    bone lengths rewrite a/d, five chains are walked, the global XYZ rotation
    is applied to every chain point, joints scatter into H36M 32-slot layout
    (unused slots stay zero *before* the root is added — the root offset is
    added to all 32 slots, reproducing :819-820), then root translates all.
    """
    ang = inputs.angles
    bl = inputs.bone_len
    dtype = ang.dtype

    (l_small_leg, r_small_leg, l_big_leg, r_big_leg, l_hip, r_hip, waist,
     thorax, l_shoulder, r_shoulder, l_big_arm, r_big_arm, l_small_arm,
     r_small_arm, neck) = [bl[..., i] for i in range(15)]

    # Bone lengths into the a/d slots (forward_kinematics_DH_model.py:571-589).
    right_leg_a = [r_hip, 0.0, 0.0, r_big_leg, r_small_leg]
    left_leg_a = [-l_hip, 0.0, 0.0, l_big_leg, l_small_leg]
    body_a = [0.0] * 12 + [neck]
    body_d = [0.0, 0.0, 0.0, waist, 0.0, 0.0, thorax, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    right_hand_a = [-r_shoulder, 0.0, 0.0, r_big_arm, r_small_arm]
    left_hand_a = [l_shoulder, 0.0, 0.0, l_big_arm, l_small_arm]

    right_leg_pos, _ = _run_chain(RIGHT_LEG_ALPHA, right_leg_a, RIGHT_LEG_D,
                                  RIGHT_LEG_THETA, ang[..., RIGHT_LEG_SLICE])
    left_leg_pos, _ = _run_chain(LEFT_LEG_ALPHA, left_leg_a, LEFT_LEG_D,
                                 LEFT_LEG_THETA, ang[..., LEFT_LEG_SLICE])
    body_pos, body_rot = _run_chain(BODY_ALPHA, body_a, body_d,
                                    BODY_THETA, ang[..., BODY_SLICE])

    # Arm chains share the first 9 body links (forward_kinematics_DH_model.py:440,446):
    # their link 9 continues from body cumulative rotation/position at index 8.
    shoulder_R = body_rot[8]
    shoulder_p = body_pos[8]
    right_hand_tail, _ = _run_chain(RIGHT_HAND_ALPHA, right_hand_a, RIGHT_HAND_D,
                                    RIGHT_HAND_THETA, ang[..., RIGHT_HAND_SLICE],
                                    start_R=shoulder_R, start_p=shoulder_p)
    left_hand_tail, _ = _run_chain(LEFT_HAND_ALPHA, left_hand_a, LEFT_HAND_D,
                                   LEFT_HAND_THETA, ang[..., LEFT_HAND_SLICE],
                                   start_R=shoulder_R, start_p=shoulder_p)
    # Hand chain joint index j (9..13) = tail index j-9.
    chains = {
        "right_leg": right_leg_pos,
        "left_leg": left_leg_pos,
        "body": body_pos,
        "right_hand": {9 + i: p for i, p in enumerate(right_hand_tail)},
        "left_hand": {9 + i: p for i, p in enumerate(left_hand_tail)},
    }

    def chain_point(chain, idx):
        c = chains[chain]
        return c[idx]

    # Gather the 17 referenced points, rotate them all at once by the global
    # rotation, then scatter.
    points = jnp.stack([chain_point(c, j) for (_, c, j) in _SCATTER], axis=-2)
    R_glob = euler_xyz_rotation(inputs.global_rot.astype(dtype))
    points = jnp.einsum("...ij,...nj->...ni", R_glob, points, precision=_PRECISION)

    batch_shape = points.shape[:-2]
    pose32 = jnp.zeros(batch_shape + (32, 3), dtype=dtype)
    slots = np.array([s for (s, _, _) in _SCATTER])
    pose32 = pose32.at[..., slots, :].set(points)
    pose32 = pose32 + inputs.root[..., None, :]
    if n_joints == 32:
        return pose32
    elif n_joints == 16:
        return pose32[..., np.array(H36M_32_TO_16_TABLE), :]
    raise ValueError(f"n_joints must be 16 or 32, got {n_joints}")


def fk_world_pose_16(inputs: FKInputs) -> jnp.ndarray:
    return fk_world_pose(inputs, n_joints=16)


def init_fk_dh_angle(dtype=jnp.float32) -> jnp.ndarray:
    """Canonical zero-angle pose with canonical bone lengths — the golden
    fixture of init_Fk_DH_angle (forward_kinematics_DH_model.py:824-858).
    Returns (32, 3)."""
    inputs = FKInputs(
        angles=jnp.zeros((N_CHAIN_ANGLES,), dtype),
        bone_len=jnp.asarray(CANONICAL_BONE_LEN, dtype),
        global_rot=jnp.zeros((3,), dtype),
        root=jnp.zeros((3,), dtype),
    )
    return fk_world_pose(inputs)
