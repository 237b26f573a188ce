#!/usr/bin/env python
"""Prepare Human3.6M npz files from the official release.

Capability parity with DH-AUG_master/data/prepare_data_h36m.py: produces
``data_3d_h36m.npz`` ({'positions_3d': {subject: {action: (N, 32, 3) world
metres}}}) and ``data_2d_h36m_gt.npz`` (ground-truth 2D obtained by
projecting through the calibrated cameras, pixel coordinates) in this
directory.  Two sources are supported, like the reference:

  --from-archive h36m.zip      the "D3 positions" .cdf archive
  --from-source  <dir>         a directory of per-subject .mat exports

Run inside data/:  python prepare_data_h36m.py --from-archive h36m.zip
(Requires the licensed H36M release; this repo ships synthetic stand-ins —
dhaug_tpu.data.synthetic — so the training stack runs without it.)
"""
import argparse
import os
import sys
import zipfile
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
OUTPUT_3D = "data_3d_h36m"
OUTPUT_2D = "data_2d_h36m_gt"


def load_cdf_positions(path):
    try:
        import cdflib
    except ImportError as e:  # pragma: no cover - cdflib not in this image
        raise SystemExit("cdflib is required to read the official .cdf files; "
                         "pip install cdflib on a machine with the dataset") from e
    hf = cdflib.CDF(path)
    positions = hf["Pose"].reshape(-1, 32, 3) / 1000.0
    return positions.astype(np.float32)


def load_mat_positions(path):
    import h5py
    with h5py.File(path, "r") as hf:
        positions = np.asarray(hf["data"])[0].reshape(-1, 32, 3) / 1000.0
    return positions.astype(np.float32)


def collect_3d(args):
    output = {}
    if args.from_archive:
        workdir = os.path.abspath("extract_tmp")
        os.makedirs(workdir, exist_ok=True)
        with zipfile.ZipFile(args.from_archive) as zf:
            zf.extractall(workdir)
        for subject in SUBJECTS:
            output[subject] = {}
            pattern = os.path.join(workdir, subject, "MyPoseFeatures",
                                   "D3_Positions", "*.cdf")
            for f in sorted(glob(pattern)):
                action = os.path.splitext(os.path.basename(f))[0].replace("_", " ")
                output[subject][action] = load_cdf_positions(f)
    elif args.from_source:
        for subject in SUBJECTS:
            output[subject] = {}
            for f in sorted(glob(os.path.join(args.from_source, subject,
                                              "MyPoseFeatures", "D3_Positions",
                                              "*.mat"))):
                action = os.path.splitext(os.path.basename(f))[0].replace("_", " ")
                output[subject][action] = load_mat_positions(f)
    else:
        raise SystemExit("pass --from-archive or --from-source")
    return output


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-archive", default="", type=str)
    ap.add_argument("--from-source", default="", type=str)
    args = ap.parse_args(argv)

    print("==> Collecting 3D poses...")
    positions_3d = collect_3d(args)
    print(f"==> Saving {OUTPUT_3D}.npz ...")
    np.savez_compressed(OUTPUT_3D, positions_3d=positions_3d)

    print("==> Computing ground-truth 2D by camera projection...")
    from dhaug_tpu.data.h36m import H36M_32_To_16_Table, normalized_camera
    from dhaug_tpu.data.loaders import np_world_to_camera

    def project(pose16, cam):
        f, c = cam["intrinsic"][:2], cam["intrinsic"][2:4]
        k, p = cam["intrinsic"][4:7], cam["intrinsic"][7:9]
        X = np_world_to_camera(pose16, cam["orientation"], cam["translation"])
        XX = np.clip(X[..., :2] / X[..., 2:], -1, 1)
        r2 = np.sum(XX ** 2, axis=-1, keepdims=True)
        radial = 1 + np.sum(k * np.concatenate([r2, r2 ** 2, r2 ** 3], -1),
                            axis=-1, keepdims=True)
        tan = np.sum(p * XX, axis=-1, keepdims=True)
        norm2d = f * (XX * (radial + tan) + p * r2) + c
        w, h = cam["res_w"], cam["res_h"]
        pix = norm2d.copy()
        pix[..., 0] = (norm2d[..., 0] + 1) * w / 2
        pix[..., 1] = (norm2d[..., 1] + h / w) * w / 2
        return pix.astype(np.float32)

    positions_2d = {}
    table = np.asarray(H36M_32_To_16_Table)
    for subject, actions in positions_3d.items():
        positions_2d[subject] = {}
        for action, pose32 in actions.items():
            cams_2d = []
            pose16 = pose32[:, table]
            for cam_idx in range(4):
                cams_2d.append(project(pose16, normalized_camera(subject, cam_idx)))
            positions_2d[subject][action] = cams_2d
    print(f"==> Saving {OUTPUT_2D}.npz ...")
    # metadata rides along exactly as the reference writes it
    # (DH-AUG_master/data/prepare_data_h36m.py:131-135): the PROCESSED
    # 16-joint skeleton's size and left/right symmetry groups.  Nothing in
    # DH-AUG reads it, but VideoPose3D-lineage tooling does.
    from dhaug_tpu.data.h36m import JOINTS_LEFT_16, JOINTS_RIGHT_16
    metadata = {
        "num_joints": len(table),
        "keypoints_symmetry": [list(JOINTS_LEFT_16), list(JOINTS_RIGHT_16)],
    }
    np.savez_compressed(OUTPUT_2D, positions_2d=positions_2d,
                        metadata=metadata)
    print("Done.")


if __name__ == "__main__":
    main(sys.argv[1:])
