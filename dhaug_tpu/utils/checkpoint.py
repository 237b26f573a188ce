"""Checkpoint save/load with working resume.

The reference only ever saves the posenet weights
(``save_ckpt`` -> ckpt_<suffix>.pth.tar of model_pos.state_dict(),
utils/utils.py:129-134) and its --resume/--GAN_resume flags have no load
path (SURVEY.md §5).  Here the FULL training state — posenet, generator,
all critics, optimizer states, RNG key, epoch counters — round-trips
through flax msgpack serialization, so resume actually works.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_ckpt(state: dict, ckpt_dir: str, suffix: str | None = None) -> str:
    """Save a pytree dict as ckpt_<suffix>.ckpt.  ``state`` may contain
    NetState objects, raw pytrees, ints, and numpy arrays."""
    if suffix is None:
        suffix = "epoch_{:04d}".format(state.get("epoch", 0))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{suffix}.ckpt")
    with open(path, "wb") as f:
        pickle.dump(_to_host(state), f)
    return path


def load_ckpt(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_into(template: Any, saved: Any) -> Any:
    """Graft saved arrays onto a freshly-initialized pytree ``template``
    (keeps aux static structure, validates shapes)."""
    flat_t, treedef = jax.tree.flatten(template)
    flat_s = jax.tree.leaves(saved)
    if len(flat_t) != len(flat_s):
        raise ValueError(
            f"checkpoint structure mismatch: {len(flat_s)} saved leaves vs "
            f"{len(flat_t)} template leaves")
    out = []
    for t, s in zip(flat_t, flat_s):
        s = np.asarray(s)
        if hasattr(t, "shape") and tuple(t.shape) != tuple(s.shape):
            raise ValueError(f"shape mismatch {t.shape} vs {s.shape}")
        out.append(s)
    return jax.tree.unflatten(treedef, out)
