"""End-to-end data preparation for the runners.

Capability parity with special_operate.fk_data_preparation
(models_Fk_GAN/special_operate.py:39-125) and the baseline
data_preparation (function_baseline/data_preparation.py — which is
bit-rotted in the reference, SURVEY.md §2.2; this one works for every
entry point).  Adds the hermetic --synthetic_data path.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from dhaug_tpu.data.h36m import TEST_SUBJECTS, Human36mDataset
from dhaug_tpu.data.loaders import (PoseBuffer, PoseDataset, PoseTarget,
                                    create_2d_data, fetch, read_3d_data)


@dataclass
class DataBundle:
    dataset: Human36mDataset
    keypoints: dict
    train_det2d3d: PoseDataset
    train_gt2d3d: PoseDataset
    target_2d: PoseTarget
    target_3d: PoseTarget
    h36m_test: PoseDataset
    mpi3d: PoseBuffer
    actions_valid: list
    subjects_train: List[str]
    subjects_test: List[str]
    action_filter: Optional[List[str]]
    # raw per-sequence lists for the video pipeline / dataloader updates
    poses_train: list = field(default_factory=list)
    poses_train_2d: list = field(default_factory=list)
    actions_train: list = field(default_factory=list)
    cams_train: list = field(default_factory=list)


def train_subject_list(args) -> List[str]:
    if args.s1only:
        return ["S1"]
    if getattr(args, "s1s5only", False):
        return ["S1", "S5"]
    return ["S1", "S5", "S6", "S7", "S8"]


def prepare_data(args, per_frame_cam: bool = True) -> DataBundle:
    """Load (or fabricate) the dataset and build every sampler the single-
    frame pipeline needs."""
    root = args.data_root
    p3d = os.path.join(root, "data", f"data_3d_{args.dataset}.npz")
    if getattr(args, "synthetic_data", False):
        # per-file no-op when everything already exists (so a pre-seeded
        # fixture dir only gains the pieces it is missing, e.g. the
        # detected-2D file for --keypoints cpn)
        from dhaug_tpu.data.synthetic import ensure_synthetic_dataset
        ensure_synthetic_dataset(root, seed=args.random_seed)
    else:
        # real data: preflight units/shapes/normalization BEFORE any
        # accelerator work (a wrong-unit npz otherwise wastes a multi-hour
        # run); raises DataValidationError with an actionable message
        from dhaug_tpu.data.validate import validate_dataset_dir
        # the bone-template asset feeds only the GAN re-skin; baseline /
        # evaluate CLIs (parse_baseline_args has no data_enhancement_method)
        # must not hard-fail on its absence
        validate_dataset_dir(
            root, getattr(args, "keypoints", "gt"),
            require_templates=hasattr(args, "data_enhancement_method"))

    if args.dataset != "h36m":
        raise KeyError("Invalid dataset")

    dataset = Human36mDataset(p3d)
    subjects_train = train_subject_list(args)
    subjects_test = list(TEST_SUBJECTS)

    dataset = read_3d_data(dataset)
    keypoints = create_2d_data(
        os.path.join(root, "data", f"data_2d_{args.dataset}_{args.keypoints}.npz"),
        dataset)

    action_filter = None if args.actions == "*" else args.actions.split(",")
    if action_filter is not None:
        action_filter = [dataset.define_actions(a)[0] for a in action_filter]

    stride = args.downsample
    min_motion = 200.0 if getattr(args, "video_over_200mm", False) and \
        getattr(args, "single_or_multi_train_mode", "single") == "multi" else None

    poses_train, poses_train_2d, actions_train, cams_train = fetch(
        subjects_train, dataset, keypoints, action_filter, stride, train=True,
        with_extrinsics=True, per_frame_cam=per_frame_cam,
        min_motion_mm=min_motion)
    poses_valid, poses_valid_2d, actions_valid, cams_valid = fetch(
        subjects_test, dataset, keypoints, action_filter, stride, train=False,
        with_extrinsics=per_frame_cam, per_frame_cam=per_frame_cam)

    if per_frame_cam:
        train_ds = PoseDataset.from_lists(poses_train, poses_train_2d, cams_train)
        valid_ds = PoseDataset.from_lists(poses_valid, poses_valid_2d, cams_valid)
    else:
        train_ds = PoseDataset(
            np.concatenate(poses_train), np.concatenate(poses_train_2d),
            np.zeros((sum(p.shape[0] for p in poses_train), 1), np.float32))
        valid_ds = PoseDataset(
            np.concatenate(poses_valid), np.concatenate(poses_valid_2d),
            np.zeros((sum(p.shape[0] for p in poses_valid), 1), np.float32))

    mpi3d_path = os.path.join(root, "data_extra", "test_set", "test_3dhp.npz")
    mpi = np.load(mpi3d_path)
    mpi3d = PoseBuffer.from_lists([mpi["pose3d"]], [mpi["pose2d"]])

    return DataBundle(
        dataset=dataset,
        keypoints=keypoints,
        train_det2d3d=train_ds,
        train_gt2d3d=PoseDataset(train_ds.poses_3d.copy(),
                                 train_ds.poses_2d.copy(), train_ds.cams.copy()),
        target_2d=PoseTarget(train_ds.poses_2d.copy()),
        target_3d=PoseTarget(train_ds.poses_3d.copy()),
        h36m_test=valid_ds,
        mpi3d=mpi3d,
        actions_valid=[a for seq in actions_valid for a in seq],
        subjects_train=subjects_train,
        subjects_test=subjects_test,
        action_filter=action_filter,
        poses_train=poses_train,
        poses_train_2d=poses_train_2d,
        actions_train=actions_train,
        cams_train=cams_train,
    )


def world_pose_pool(bundle: DataBundle, max_poses: int = 20000,
                    seed: int = 0) -> np.ndarray:
    """A (P, 16, 3) pool of real *world* poses for bone-length/root
    harvesting by the traditional augmenter (the reference samples random
    dataset frames, forward_kinematics_DH_model.py:883-929).  World poses
    are recovered per-sequence from the camera extrinsics."""
    from dhaug_tpu.data.loaders import np_camera_to_world
    rng = np.random.default_rng(seed)
    pools = []
    for pose_cam, cam in zip(bundle.poses_train, bundle.cams_train):
        cam = np.asarray(cam)
        if cam.ndim == 1:
            q, t = cam[9:13], cam[13:16]
        else:
            q, t = cam[0, 9:13], cam[0, 13:16]
        pools.append(np_camera_to_world(pose_cam, q, t))
    pool = np.concatenate(pools).astype(np.float32)
    if pool.shape[0] > max_poses:
        pool = pool[rng.choice(pool.shape[0], max_poses, replace=False)]
    return pool
