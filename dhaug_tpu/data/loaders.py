"""Host-side data pipeline: npz ingestion, flattening, fixed-shape batching.

Capability parity with DH-AUG_master/utils/data_utils.py (read_3d_data,
create_2d_data, fetch) and common/data_loader.py (PoseDataSet / PoseBuffer /
PoseTarget...).  TPU-first differences:

  * everything is plain numpy on the host; batches are fixed-shape with
    drop-remainder (XLA never sees a ragged batch, so nothing recompiles —
    the reference instead skips short batches in the train loop,
    model_fk_gan_train.py:276),
  * samplers are stateless epoch generators over pre-concatenated arrays
    (no per-item Dataset indirection, no worker processes — the arrays are
    handed to ``jax.device_put`` wholesale by the training loops).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# numpy camera helpers (host prep; device code uses dhaug_tpu.ops.camera)
# ---------------------------------------------------------------------------

def np_qrot(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    w = q[..., :1]
    qvec = q[..., 1:]
    uv = np.cross(qvec, v)
    uuv = np.cross(qvec, uv)
    return v + 2.0 * (w * uv + uuv)


def np_world_to_camera(X: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    Rt = np.concatenate([R[..., :1], -R[..., 1:]], axis=-1)
    Rt = np.broadcast_to(Rt, X.shape[:-1] + (4,))
    return np_qrot(Rt, X - t)


def np_camera_to_world(X: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    R = np.broadcast_to(R, X.shape[:-1] + (4,))
    return np_qrot(R, X) + t


def np_normalize_screen(points: np.ndarray, w: float, h: float) -> np.ndarray:
    out = points.copy()
    out[..., 0] = out[..., 0] / w * 2.0 - 1.0
    out[..., 1] = out[..., 1] / w * 2.0 - h / w
    return out


# ---------------------------------------------------------------------------
# npz ingestion
# ---------------------------------------------------------------------------

def read_3d_data(dataset):
    """Attach per-camera camera-space 3D ('positions_3d') to every action.
    Mirrors utils/data_utils.py:26-39."""
    for subject in dataset.subjects():
        for action in dataset[subject].keys():
            anim = dataset[subject][action]
            positions_3d = []
            for cam in anim["cameras"]:
                pos_3d = np_world_to_camera(
                    anim["positions"], R=cam["orientation"], t=cam["translation"])
                positions_3d.append(pos_3d.astype(np.float32))
            anim["positions_3d"] = positions_3d
    return dataset


def create_2d_data(data_path, dataset):
    """Load a data_2d_*.npz and normalize to screen coordinates.
    Mirrors utils/data_utils.py:11-23."""
    keypoints = np.load(data_path, allow_pickle=True)["positions_2d"].item()
    for subject in keypoints.keys():
        for action in keypoints[subject]:
            for cam_idx, kps in enumerate(keypoints[subject][action]):
                cam = dataset.cameras()[subject][cam_idx]
                kps = np.asarray(kps, dtype=np.float32)
                kps[..., :2] = np_normalize_screen(
                    kps[..., :2], w=cam["res_w"], h=cam["res_h"])
                keypoints[subject][action][cam_idx] = kps
    return keypoints


def fetch(subjects, dataset, keypoints, action_filter=None, stride: int = 1,
          train: bool = True, parse_3d_poses: bool = True,
          with_extrinsics: bool = False, per_frame_cam: bool = True,
          min_motion_mm: Optional[float] = None):
    """Flatten (subject, action, camera) into parallel sequence lists.

    Mirrors utils/data_utils.py:42-126 with the two call modes unified:
    ``per_frame_cam=True`` replicates the camera record per frame (the
    reference's 'single' mode), ``False`` keeps one record per sequence
    ('multi' mode).  ``min_motion_mm`` implements the --video_over_200mm
    inter-frame motion filter (:98-124).
    """
    out_poses_3d, out_poses_2d, out_actions, out_cam = [], [], [], []
    for subject in subjects:
        for action in keypoints[subject].keys():
            if action_filter is not None:
                if not any(action.split(" ")[0] == a for a in action_filter):
                    continue
            poses_2d = keypoints[subject][action]
            for i in range(len(poses_2d)):
                out_poses_2d.append(np.asarray(poses_2d[i], np.float32))
                out_actions.append([action.split(" ")[0]] * poses_2d[i].shape[0])
            if parse_3d_poses and "positions_3d" in dataset[subject][action]:
                poses_3d = dataset[subject][action]["positions_3d"]
                assert len(poses_3d) == len(poses_2d), "Camera count mismatch"
                base2d = len(out_poses_2d) - len(poses_2d)
                for i in range(len(poses_3d)):
                    # detector exports often cover trailing video frames past
                    # the mocap: trim the 2D to the 3D length (the preflight
                    # validator's documented contract, data/validate.py) so
                    # the flattened 3D/2D lists stay frame-aligned
                    n3 = np.asarray(poses_3d[i]).shape[0]
                    j = base2d + i
                    if out_poses_2d[j].shape[0] < n3:
                        raise ValueError(
                            f"{subject}/{action} cam {i}: 2D has "
                            f"{out_poses_2d[j].shape[0]} frames < 3D {n3}")
                    if out_poses_2d[j].shape[0] > n3:
                        out_poses_2d[j] = out_poses_2d[j][:n3]
                        out_actions[j] = out_actions[j][:n3]
                    out_poses_3d.append(np.asarray(poses_3d[i], np.float32))
                    cam = dataset[subject][action]["cameras"][i]["intrinsic"]
                    if with_extrinsics:
                        cam = np.concatenate([
                            cam,
                            dataset[subject][action]["cameras"][i]["orientation"],
                            dataset[subject][action]["cameras"][i]["translation"],
                        ]).astype(np.float32)
                    else:
                        cam = np.asarray(cam, np.float32)
                    if per_frame_cam:
                        out_cam.append(np.tile(cam[None], (poses_3d[i].shape[0], 1)))
                    else:
                        out_cam.append(cam)

    if len(out_poses_3d) == 0:
        out_poses_3d = None
    elif len(out_poses_3d) != len(out_poses_2d):
        # Partial 3D: some (subject, action) carried positions_3d and some
        # did not, so the 3D/cam lists are positionally misaligned with the
        # 2D/action lists — every downstream consumer (ChunkWindows,
        # UnchunkedSequences, the per-action eval grouping) zips them by
        # index and would silently pair sequences wrongly.  The reference
        # has the same latent hazard (utils/data_utils.py:59-61 guards 3D
        # per action); fail loudly instead.
        missing = [f"{s}/{a}" for s in subjects
                   for a in keypoints[s].keys()
                   if (action_filter is None
                       or any(a.split(" ")[0] == f for f in action_filter))
                   and "positions_3d" not in dataset[s][a]]
        raise ValueError(
            f"fetch: {len(out_poses_2d)} 2D sequences but only "
            f"{len(out_poses_3d)} have 3D — actions without positions_3d: "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''}. Run "
            "read_3d_data on every action or drop the 2D-only actions.")

    if stride > 1 and train:
        for i in range(len(out_poses_2d)):
            out_poses_2d[i] = out_poses_2d[i][::stride]
            out_actions[i] = out_actions[i][::stride]
            if out_poses_3d is not None:
                out_poses_3d[i] = out_poses_3d[i][::stride]
                if per_frame_cam:
                    out_cam[i] = out_cam[i][::stride]

    if min_motion_mm is not None and train and out_poses_3d is not None:
        # Drop frames whose max joint displacement from the previously KEPT
        # frame is below the threshold.  The reference's `continue` skips its
        # `prev_kp3d = kp3d` update (utils/data_utils.py:110-122), so the
        # comparison is cumulative since the last kept frame — a sequence
        # moving steadily below the threshold per frame still keeps a frame
        # every time the accumulated motion crosses it.  (Unlike the
        # reference we also filter the action/cam rows, keeping all four
        # lists frame-aligned.)
        for i in range(len(out_poses_3d)):
            seq3d, seq2d = out_poses_3d[i], out_poses_2d[i]
            keep = [0]
            prev = seq3d[0]
            for f in range(1, seq3d.shape[0]):
                if np.any(np.linalg.norm(prev - seq3d[f], axis=1) * 1000.0 >= min_motion_mm):
                    keep.append(f)
                    prev = seq3d[f]
            keep = np.asarray(keep)
            out_poses_3d[i] = seq3d[keep]
            out_poses_2d[i] = seq2d[keep]
            out_actions[i] = [out_actions[i][k] for k in keep]
            if per_frame_cam:
                out_cam[i] = out_cam[i][keep]

    return out_poses_3d, out_poses_2d, out_actions, out_cam


# ---------------------------------------------------------------------------
# fixed-shape epoch samplers
# ---------------------------------------------------------------------------

@dataclass
class PoseDataset:
    """Concatenated (3D, 2D, cam) frame-level dataset with fixed-shape
    shuffled batching (PoseDataSet, common/data_loader.py:9)."""

    poses_3d: np.ndarray   # (N, 16, 3)
    poses_2d: np.ndarray   # (N, 16, 2)
    cams: np.ndarray       # (N, C)

    @classmethod
    def from_lists(cls, poses_3d: Sequence, poses_2d: Sequence, cams: Sequence):
        return cls(
            np.concatenate([np.asarray(p, np.float32) for p in poses_3d]),
            np.concatenate([np.asarray(p, np.float32) for p in poses_2d]),
            np.concatenate([np.asarray(c, np.float32) for c in cams]),
        )

    def __len__(self):
        return self.poses_3d.shape[0]

    def batches(self, rng: np.random.Generator, batch_size: int,
                shuffle: bool = True, drop_last: bool = True) -> Iterator[tuple]:
        n = len(self)
        idx = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            sel = idx[s:s + batch_size]
            yield self.poses_3d[sel], self.poses_2d[sel], self.cams[sel]

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self)
        return n // batch_size if drop_last else -(-n // batch_size)


@dataclass
class PoseBuffer:
    """(3D, 2D) pairs without camera records (PoseBuffer,
    common/data_loader.py:39) — used for the 3DHP test set."""

    poses_3d: np.ndarray
    poses_2d: np.ndarray

    @classmethod
    def from_lists(cls, poses_3d, poses_2d):
        return cls(
            np.concatenate([np.asarray(p, np.float32) for p in poses_3d]),
            np.concatenate([np.asarray(p, np.float32) for p in poses_2d]),
        )

    def __len__(self):
        return self.poses_3d.shape[0]

    def batches(self, batch_size: int) -> Iterator[tuple]:
        for s in range(0, len(self), batch_size):
            yield self.poses_3d[s:s + batch_size], self.poses_2d[s:s + batch_size]


@dataclass
class PoseTarget:
    """Single-array target sampler (PoseTarget, common/data_loader.py:62)."""

    poses: np.ndarray

    @classmethod
    def from_lists(cls, poses):
        return cls(np.concatenate([np.asarray(p, np.float32) for p in poses]))

    def __len__(self):
        return self.poses.shape[0]

    def batches(self, rng: np.random.Generator, batch_size: int,
                shuffle: bool = True, drop_last: bool = True) -> Iterator[np.ndarray]:
        n = len(self)
        idx = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        for s in range(0, stop, batch_size):
            yield self.poses[idx[s:s + batch_size]]


@dataclass
class PoseTarget2D:
    """2D targets + confidence mask channel (PoseTarget2D,
    common/data_loader.py:92)."""

    poses_2d: np.ndarray

    @classmethod
    def from_lists(cls, poses_2d):
        return cls(np.concatenate([np.asarray(p, np.float32) for p in poses_2d]))

    def __len__(self):
        return self.poses_2d.shape[0]

    def batches(self, rng: np.random.Generator, batch_size: int,
                shuffle: bool = True, drop_last: bool = True) -> Iterator[tuple]:
        n = len(self)
        idx = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (n % batch_size) if drop_last else n
        mask = np.ones((batch_size, self.poses_2d.shape[1], 1), np.float32)
        for s in range(0, stop, batch_size):
            sel = idx[s:s + batch_size]
            yield self.poses_2d[sel], mask[: len(sel)]


@dataclass
class CmuPoseTarget:
    """(3D, 2D, cam) sampler where cameras cycle independently of poses —
    parity with the reference's leftover CmuDatasetPoseTarget
    (common/data_loader.py:109-129) for external-dataset targets."""

    poses_3d: np.ndarray
    poses_2d: np.ndarray
    cams: np.ndarray

    def __len__(self):
        return len(self.poses_3d)

    def batches(self, rng: np.random.Generator, batch_size: int,
                drop_last: bool = True) -> Iterator[tuple]:
        n = len(self)
        idx = rng.permutation(n)
        stop = n - (n % batch_size) if drop_last else n
        n_cams = self.cams.shape[0]
        for s in range(0, stop, batch_size):
            sel = idx[s:s + batch_size]
            yield (self.poses_3d[sel], self.poses_2d[sel],
                   self.cams[sel % max(n_cams - 1, 1)])


def pad_to_batch(arrays: List[np.ndarray], batch_size: int):
    """Edge-pad the leading axis of each array to a multiple of
    ``batch_size``; returns (padded_arrays, valid_count).  Used by eval loops
    so the last partial batch keeps a fixed XLA shape."""
    n = arrays[0].shape[0]
    pad = (-n) % batch_size
    if pad == 0:
        return arrays, n
    out = []
    for a in arrays:
        pad_block = np.repeat(a[-1:], pad, axis=0)
        out.append(np.concatenate([a, pad_block], axis=0))
    return out, n
