"""3DPW / external-dataset joint-layout conversion tables.

Parity with the mapping constants the reference keeps for 3DPW evaluation
(models_Fk_GAN/special_operate.py:28-36, flag --Path_3DPW) — dead code on
the reference's main path, exposed here as working converters so external
24-joint (SMPL), VIBE-14 or COCO-16 predictions can be scored with this
framework's 16-joint metrics.
"""
from __future__ import annotations

import numpy as np

# theirs -> ours (H36M-16 slot)
PW3D_TO_16POINTS_TABLE = {1: 4, 2: 1, 6: 7, 4: 5, 5: 2, 7: 6, 8: 3, 15: 9,
                          16: 10, 17: 13, 18: 11, 19: 14, 20: 12, 21: 15}

PW3D_TO_16POINTS_TABLE_FROM_VIBE = {0: 3, 1: 2, 2: 1, 3: 4, 4: 5, 5: 6,
                                    6: 15, 7: 14, 8: 13, 9: 10, 10: 11,
                                    11: 12, 12: 9}

PW3D_TO_16POINTS_TABLE_FROM_COCO = {0: 9, 1: 8, 2: 13, 3: 14, 4: 15, 5: 10,
                                    6: 11, 7: 12, 8: 1, 9: 2, 10: 3, 11: 4,
                                    12: 5, 13: 6}


def convert_to_16(joints: np.ndarray, table: dict) -> np.ndarray:
    """(N, J_src, C) -> (N, 16, C) via a theirs->ours index table; unmapped
    slots are zero (the reference leaves them uninitialized buffers)."""
    out = np.zeros(joints.shape[:1] + (16,) + joints.shape[2:], joints.dtype)
    for src, dst in table.items():
        out[:, dst] = joints[:, src]
    return out
