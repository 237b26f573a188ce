#!/usr/bin/env python
"""Standalone preflight validation of a dataset directory.

Checks data_3d_h36m.npz, data_2d_h36m_<kp>.npz, test_3dhp.npz and the
bone-length template asset for format, units (metres vs millimetres), joint
counts and normalization BEFORE a multi-hour training run can be started on
them.  The training CLIs run the same checks automatically whenever
--synthetic_data is false.

Example:
    python scripts/validate_data.py --data_root /data/h36m --keypoints cpn
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=".", type=str)
    ap.add_argument("--keypoints", default="gt", type=str)
    args = ap.parse_args(argv)

    from dhaug_tpu.data.validate import validate_dataset_dir
    validate_dataset_dir(args.data_root, args.keypoints)


if __name__ == "__main__":
    main(sys.argv[1:])
