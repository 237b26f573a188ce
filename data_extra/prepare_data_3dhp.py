#!/usr/bin/env python
"""Prepare the MPI-INF-3DHP cross-dataset test set (2929 frames).

Capability parity with DH-AUG_master/data_extra/prepare_data_3dhp.py and its
companion notebook: converts SPIN's ``mpi_inf_3dhp_valid.npz`` (keys
``imgname``, ``part`` (2D+conf), ``S`` (3D+conf)) into the framework's
16-joint layout and writes ``test_set/test_3dhp.npz`` with:
    pose3d: (N, 16, 3) camera-space metres
    pose2d: (N, 16, 2) normalized screen coordinates, confidence-masked

Conversion recipe (reference prepare_data_3dhp.py:29-104):
  * joint reorder [14,2,1,0,3,4,5,16,12,18,9,10,11,8,7,6]
    (Pelvis, right leg, left leg, Spine, Neck, Head, left arm, right arm
    interleaved into the H36M-16 slots);
  * per-sequence frame size — TS1-TS4: 2048x2048, TS5/TS6: 1920x1080 —
    with the aspect-preserving normalization (x/w*2-1, y/w*2-h/w), zeroing
    joints whose confidence mask is 0;
  * 3D taken as-is from ``S`` (already metres).

A generic 17-joint-annotation path is kept for npz files that already carry
``pose3d``/``pose2d`` arrays.

Run: python prepare_data_3dhp.py --source dataset_extras/mpi_inf_3dhp_valid.npz
"""
import argparse
import os
import sys

import numpy as np

# SPIN 19-joint -> H36M-16 reorder (reference prepare_data_3dhp.py:27).
SPIN_REORDER = [14, 2, 1, 0, 3, 4, 5, 16, 12, 18, 9, 10, 11, 8, 7, 6]

# The 3DHP annotated 17-joint set maps to our 16-joint layout as follows
# (ours <- theirs index within the 17-joint minimal set):
H36M16_FROM_3DHP17 = [14, 8, 9, 10, 11, 12, 13, 15, 1, 16, 5, 6, 7, 2, 3, 4]


def convert_spin(data) -> tuple:
    """SPIN mpi_inf_3dhp_valid.npz -> (pose3d (N,16,3), pose2d (N,16,2))."""
    names = np.asarray(data["imgname"])
    part = np.asarray(data["part"])     # (N, J, 3): x, y, conf
    S = np.asarray(data["S"])           # (N, J, 4): x, y, z, conf
    n = names.shape[0]

    sel = np.asarray(SPIN_REORDER)
    p2 = part[:, sel, :2].astype(np.float32)
    mask = part[:, sel, 2:3].astype(np.float32)
    p3 = S[:, sel, :3].astype(np.float32)

    # per-sequence frame size from the image path (TS5/TS6 are 1920x1080)
    is_small = np.array([("/TS5/" in str(f)) or ("/TS6/" in str(f))
                         for f in names])
    w = np.where(is_small, 1920.0, 2048.0).astype(np.float32)[:, None, None]
    h = np.where(is_small, 1080.0, 2048.0).astype(np.float32)[:, None, None]
    offset = np.concatenate([np.ones_like(w), h / w], axis=-1)
    pose2d = (p2 / w * 2.0 - offset) * mask
    assert pose2d.shape == (n, 16, 2)
    return p3, pose2d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, type=str,
                    help="SPIN-format mpi_inf_3dhp valid npz (imgname/part/S) "
                         "or a generic npz with pose3d/pose2d 17-joint arrays")
    ap.add_argument("--res", default=2048.0, type=float,
                    help="frame size for the generic 17-joint path")
    args = ap.parse_args(argv)

    data = np.load(args.source, allow_pickle=True)
    if "S" in data:
        pose3d, pose2d = convert_spin(data)
    else:
        # Generic path: npz already carrying 17-joint 3DHP annotations
        pose3d17 = data["pose3d"]   # (N, 17, 3) mm, camera space
        pose2d17 = data["pose2d"]   # (N, 17, 2) pixels
        sel = np.asarray(H36M16_FROM_3DHP17)
        pose3d = pose3d17[:, sel] / 1000.0
        pose3d = pose3d - pose3d[:, :1]
        pose2d = pose2d17[:, sel].astype(np.float32)
        pose2d = pose2d / args.res * 2 - 1

    os.makedirs("test_set", exist_ok=True)
    out = os.path.join("test_set", "test_3dhp.npz")
    np.savez_compressed(out, pose3d=np.asarray(pose3d, np.float32),
                        pose2d=np.asarray(pose2d, np.float32))
    print(f"wrote {out}: {pose3d.shape[0]} frames")


if __name__ == "__main__":
    main(sys.argv[1:])
