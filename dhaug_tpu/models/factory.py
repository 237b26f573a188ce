"""Posenet factory keyed on --posenet_name.

Capability parity with model_pos_preparation
(function_baseline/model_pos_preparation.py:18-87): the same five names
produce the same architectures; 'train'/'test' flags select the
strided/dilated twins for the multi-frame nets.  Returns the flax module
plus an init helper that builds (params, batch_stats) for a given input
shape.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from dhaug_tpu.models.posenets import (LinearModel, PoseFormer, SemGCN,
                                       TemporalPoseNet,
                                       adjacency_from_skeleton)

POSENET_NAMES = ("gcn", "mlp", "videopose", "mulit_farme_videopose",
                 "mulit_farme_poseformer")


def receptive_field(architecture: str) -> int:
    """'3,3' -> 9; '3,3,3' -> 27 (video_mode_operate.py:411-415)."""
    rf = 1
    for w in architecture.split(","):
        rf *= int(w)
    return rf


def make_posenet(posenet_name: str, *, stages: int = 4, dropout: float = 0.25,
                 architecture: str = "3,3,3", skeleton=None,
                 flag: str = "train"):
    """Build the posenet module.  Input conventions per model:
    gcn/mlp/videopose take (B, 16, 2) (or (B, 32)); the multi-frame models
    take (B, T, 16, 2)."""
    if posenet_name == "gcn":
        if skeleton is None:
            raise ValueError("gcn posenet needs a skeleton")
        adj = adjacency_from_skeleton(skeleton)
        return SemGCN(adj=adj, hid_dim=128, num_layers=stages, dropout=dropout)
    if posenet_name == "mlp":
        return LinearModel(num_stage=stages, dropout=dropout)
    if posenet_name == "videopose":
        widths = tuple([1] * (stages + 1))
        return TemporalPoseNet(filter_widths=widths, out_joints=15,
                               pad_hip_joint=True, dropout=0.25, strided=True)
    if posenet_name == "mulit_farme_videopose":
        widths = tuple(int(x) for x in architecture.split(","))
        return TemporalPoseNet(filter_widths=widths, out_joints=16,
                               pad_hip_joint=False, dropout=0.25,
                               strided=(flag == "train"))
    if posenet_name == "mulit_farme_poseformer":
        rf = receptive_field(architecture)
        return PoseFormer(num_frame=rf, num_joints=16,
                          drop_path_rate=0.1 if flag == "train" else 0.0)
    raise ValueError(f"posenet_name invalid: {posenet_name}")


def example_input(posenet_name: str, batch: int = 2,
                  architecture: str = "3,3,3") -> jnp.ndarray:
    if posenet_name in ("gcn", "mlp", "videopose"):
        return jnp.zeros((batch, 16, 2), jnp.float32)
    rf = receptive_field(architecture)
    return jnp.zeros((batch, rf, 16, 2), jnp.float32)


def init_posenet(model, key, example) -> Tuple[dict, dict]:
    """Initialize (params, batch_stats) — batch_stats may be empty for
    nets without BatchNorm."""
    variables = model.init({"params": key, "dropout": key}, example, train=False)
    return variables["params"], variables.get("batch_stats", {})
