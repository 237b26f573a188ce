"""Bone-vector algebra and kinematic-chain-space (KCS) features.

Capability parity with two reference modules that use *different* bone
orderings (a real trap, documented in SURVEY.md §2):

  * **FK order** (models_Fk_GAN/special_operate.py:513-539,
    ``Fk_get_boneVecByPose3d``): the 15 bones in the order the FK model and
    discriminators use — legs first, then torso, shoulders, arms, neck.
  * **H36M kinematic-tree order** (utils/gan_utils.py:90-119,
    ``get_BoneVecbypose3d``): parent->child order used by the bone-length
    re-skin augmentation (``random_bl_aug``) and its inverse
    ``get_pose3dbyBoneVec``.

The reference materializes per-batch incidence matrices with
``Tensor.repeat`` (special_operate.py:534); here the (16, 15) matrices are
module-level constants and a single einsum does the batched contraction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops.fk import USED_16KEY_15BONE_TABLE

# Incidence contractions are signed gathers in disguise; run them at full
# fp32 precision on TPU (default bf16 accumulation costs ~1e-2 absolute
# error on metre-scale poses, which poisons bone-length fidelity).
_PRECISION = jax.lax.Precision.HIGHEST

# H36M kinematic-tree bone list (parent, child) in gan_utils order
# (utils/gan_utils.py:96-112).
H36M_TREE_BONES = (
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8),
    (8, 9), (8, 10), (10, 11), (11, 12), (8, 13), (13, 14), (14, 15),
)


def _incidence(bones) -> np.ndarray:
    """(16, n_bones) matrix C with C[parent, b] = -1, C[child, b] = +1 so that
    pose^T @ C gives bone vectors child - parent."""
    C = np.zeros((16, len(bones)), dtype=np.float32)
    for b, (parent, child) in enumerate(bones):
        C[parent, b] = -1.0
        C[child, b] = 1.0
    return C


_C_FK = _incidence(USED_16KEY_15BONE_TABLE)          # FK bone order
_C_TREE = _incidence(H36M_TREE_BONES)                # kinematic-tree order

# Inverse map: accumulate tree-ordered bone vectors along the root paths to
# recover joint offsets from the root (utils/gan_utils.py:56-86).
_TREE_PATHS = {}
_parent_of = {child: parent for parent, child in H36M_TREE_BONES}
_bone_of_child = {child: b for b, (parent, child) in enumerate(H36M_TREE_BONES)}
for j in range(1, 16):
    path = []
    node = j
    while node != 0:
        path.append(_bone_of_child[node])
        node = _parent_of[node]
    _TREE_PATHS[j] = path
_C_TREE_INV = np.zeros((15, 16), dtype=np.float32)
for j, path in _TREE_PATHS.items():
    for b in path:
        _C_TREE_INV[b, j] = 1.0

# 9 mirrored bone-ratio groups -> 15 bones (utils/gan_utils.py:14-30):
# legs/arms share a ratio between left and right.
_BLR_9_TO_15 = np.zeros((9, 15), dtype=np.float32)
for bone, group in enumerate([0, 1, 2, 0, 1, 2, 3, 4, 5, 6, 7, 8, 6, 7, 8]):
    _BLR_9_TO_15[group, bone] = 1.0


def bone_vectors_fk(pose16: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, 3) -> (..., 15, 3) bone vectors in FK order."""
    return jnp.einsum("jb,...jc->...bc", jnp.asarray(_C_FK), pose16, precision=_PRECISION)


def bone_vectors_tree(pose16: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, 3) -> (..., 15, 3) bone vectors in H36M kinematic-tree order."""
    return jnp.einsum("jb,...jc->...bc", jnp.asarray(_C_TREE), pose16, precision=_PRECISION)


def pose_from_bone_vectors_tree(bones: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`bone_vectors_tree`: (..., 15, 3) -> (..., 16, 3)
    root-relative pose (root at origin)."""
    return jnp.einsum("bj,...bc->...jc", jnp.asarray(_C_TREE_INV), bones, precision=_PRECISION)


def bone_lengths(bone_vecs: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(bone_vecs ** 2, axis=-1) + eps)


def bone_lengths_fk(pose16: jnp.ndarray) -> jnp.ndarray:
    """(..., 16, 3) -> (..., 15) bone lengths in FK order.  This is what the
    GAN generator harvests from real batches (Fk_generator.py:107-111)."""
    return bone_lengths(bone_vectors_fk(pose16))


def bone_unit_vectors_tree(pose16: jnp.ndarray) -> jnp.ndarray:
    vecs = bone_vectors_tree(pose16)
    return vecs / bone_lengths(vecs)[..., None]


def reskin_pose(pose16: jnp.ndarray, new_lengths_tree: jnp.ndarray) -> jnp.ndarray:
    """Replace the pose's bone lengths with ``new_lengths_tree`` (tree order,
    (..., 15)) keeping bone directions and root position — the core of
    ``random_bl_aug`` (function_aug/dataloader_update.py:18-41)."""
    root = pose16[..., :1, :]
    rel = pose16 - root
    unit = bone_unit_vectors_tree(rel)
    new_bones = unit * new_lengths_tree[..., None]
    return pose_from_bone_vectors_tree(new_bones) + root


def blaugment9to15(pose16: jnp.ndarray, bl: jnp.ndarray, blr9: jnp.ndarray) -> jnp.ndarray:
    """Apply 9 mirrored bone-length ratios to a pose
    (utils/gan_utils.py:7-52).  bl: (..., 15) base lengths (tree order);
    blr9: (..., 9) ratios; new length = bl * (1 + ratio)."""
    blr15 = jnp.einsum("gb,...g->...b", jnp.asarray(_BLR_9_TO_15), blr9, precision=_PRECISION)
    return reskin_pose(pose16, bl * (1.0 + blr15))


# ---------------------------------------------------------------------------
# KCS features for the discriminators
# ---------------------------------------------------------------------------

# Adjacent-bone pairs whose cosine angle feeds the 3D critic, in FK bone
# order indices (Fk_discriminator.py:81-140).
_KCS_PAIRS = (
    (0, 2),    # left small leg / left big leg
    (1, 3),    # right small leg / right big leg
    (2, 4),    # left big leg / left hip
    (3, 5),    # right big leg / right hip
    (4, 5),    # left hip / right hip
    (4, 6),    # left hip / waist
    (5, 6),    # right hip / waist
    (6, 7),    # waist / thorax
    (7, 14),   # thorax / neck
    (7, 8),    # thorax / left shoulder
    (7, 9),    # thorax / right shoulder
    (8, 10),   # left shoulder / left big arm
    (9, 11),   # right shoulder / right big arm
    (10, 12),  # left big arm / left small arm
    (11, 13),  # right big arm / right small arm
)
_KCS_A = np.array([a for a, _ in _KCS_PAIRS])
_KCS_B = np.array([b for _, b in _KCS_PAIRS])


def kcs_features(pose16: jnp.ndarray, with_lengths: bool = True) -> jnp.ndarray:
    """Kinematic-chain-space features: 15 inter-bone cosines (+ 15 bone
    lengths when ``with_lengths``).  (..., 16, 3) -> (..., 30) or (..., 15).

    ``with_lengths=True`` matches ``special_KCS_Input_transform``
    (Fk_discriminator.py:36-146); ``False`` is the video/motion variant
    (:269-377).
    """
    vecs = bone_vectors_fk(pose16)
    lens = bone_lengths(vecs)
    va = vecs[..., _KCS_A, :]
    vb = vecs[..., _KCS_B, :]
    cos = jnp.sum(va * vb, axis=-1) / (lens[..., _KCS_A] * lens[..., _KCS_B])
    if with_lengths:
        return jnp.concatenate([cos, lens], axis=-1)
    return cos
