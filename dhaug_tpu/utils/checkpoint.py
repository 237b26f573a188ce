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


def fetch_tree(tree: Any) -> Any:
    """Device->host fetch of a pytree in O(dtype groups) transfers instead of
    one per leaf.

    Through this environment's tunneled TPU runtime every synchronous fetch
    costs ~40 ms of round-trip latency regardless of size (bulk bandwidth is
    ~14 MB/s), so fetching a train state leaf-by-leaf pays hundreds of round
    trips.  Small leaves of each dtype are concatenated on device (one tiny
    compiled program per structure, persistent-cached) and split on the
    host; leaves above ``_PACK_MAX_BYTES`` are bandwidth-bound anyway and
    stream individually (packing them would only add an HBM copy)."""
    import jax.numpy as jnp

    _PACK_MAX_BYTES = 4 << 20
    leaves, treedef = jax.tree.flatten(tree)
    out = list(leaves)
    by_group: dict = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            if x.nbytes > _PACK_MAX_BYTES:
                out[i] = np.asarray(x)               # large: direct stream
            else:
                # group by (dtype, device placement): concatenating leaves
                # committed to different devices/shardings is an error, so
                # each distinct placement packs separately (uncommitted
                # arrays share the default-device group)
                ids = tuple(sorted(d.id for d in x.sharding.device_set)) \
                    if getattr(x, "committed", True) else ("uncommitted",)
                by_group.setdefault((jnp.dtype(x.dtype), ids), []).append(i)
        elif isinstance(x, np.ndarray):
            out[i] = np.asarray(x)
    for _, idxs in by_group.items():
        try:
            flat = jnp.concatenate([leaves[i].ravel() for i in idxs]) \
                if len(idxs) > 1 else leaves[idxs[0]].ravel()
            host = np.asarray(flat)                  # one tunnel round trip
        except ValueError:
            # placement mix the grouping didn't anticipate: per-leaf fetch
            for i in idxs:
                out[i] = np.asarray(leaves[i])
            continue
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree.unflatten(treedef, out)


def save_ckpt(state: dict, ckpt_dir: str, suffix: str | None = None) -> str:
    """Save a pytree dict as ckpt_<suffix>.ckpt.  ``state`` may contain
    NetState objects, raw pytrees, ints, and numpy arrays."""
    if suffix is None:
        suffix = "epoch_{:04d}".format(state.get("epoch", 0))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{suffix}.ckpt")
    with open(path, "wb") as f:
        pickle.dump(fetch_tree(state), f)
    return path


def load_ckpt(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_ckpt_orbax(state: dict, ckpt_dir: str, suffix: str = "orbax") -> str:
    """Orbax-backed checkpoint for deployment pipelines that standardize on
    orbax layouts.  Array pytrees go through orbax; non-array leaves (RNG
    bit-generator dicts, counters, strings) ride a pickled sidecar — orbax
    only stores arrays/scalars.  ``load_ckpt_orbax`` reassembles the dict."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{suffix}"))
    state = fetch_tree(state)  # bulk device->host in O(dtype) transfers
    arrays = {}
    others = {}
    # None leaves (e.g. dhpp1_best before the first eval) must be REAL
    # leaves riding the sidecar: the default flatten treats None as an
    # empty subtree, which load_ckpt_orbax would then resurface as a
    # keyless leaf -> KeyError on resume
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        state, is_leaf=lambda x: x is None)
    for keypath, leaf in flat:
        key = jax.tree_util.keystr(keypath)
        numeric_array = (isinstance(leaf, (jax.Array, np.ndarray))
                         and np.issubdtype(np.asarray(leaf).dtype, np.number))
        # Python scalars ride the sidecar, NOT orbax: int leaves include
        # 128-bit PCG64 RNG state words that overflow int64 (np.asarray
        # would silently produce an object array orbax can't store), and
        # exact type round-tripping matters for np_rng.bit_generator.state
        if numeric_array:
            arrays[key] = np.asarray(leaf)
        else:
            others[key] = leaf
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), arrays, force=True)
    with open(os.path.join(path, "aux.pkl"), "wb") as f:
        pickle.dump({"others": others, "treedef": treedef}, f)
    return path


def load_ckpt_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(os.path.join(os.path.abspath(path), "arrays"))
    with open(os.path.join(path, "aux.pkl"), "rb") as f:
        aux = pickle.load(f)
    leaves_by_key = {**arrays, **aux["others"]}
    treedef = aux["treedef"]
    # rebuild in treedef order; a unique sentinel (NOT None — None would be
    # collapsed into an empty subtree on re-flatten) marks leaf positions
    sentinel = object()
    structure = jax.tree_util.tree_unflatten(
        treedef, [sentinel] * treedef.num_leaves)
    flat, _ = jax.tree_util.tree_flatten_with_path(
        structure, is_leaf=lambda x: x is sentinel)
    ordered = [leaves_by_key[jax.tree_util.keystr(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def save_snapshot(state: dict, ckpt_dir: str, suffix: str,
                  fmt: str = "pickle") -> str:
    """Format-dispatching full-state snapshot save (--ckpt_format):
    'pickle' -> one ckpt_<suffix>.ckpt file; 'orbax' -> a ckpt_<suffix>/
    orbax directory (arrays via orbax, non-array leaves in a sidecar)."""
    if fmt == "orbax":
        return save_ckpt_orbax(state, ckpt_dir, suffix=suffix)
    if fmt != "pickle":
        raise ValueError(f"unknown --ckpt_format {fmt!r} (pickle|orbax)")
    return save_ckpt(state, ckpt_dir, suffix=suffix)


def load_snapshot(path: str) -> dict:
    """Load a snapshot saved by :func:`save_snapshot` in either format —
    orbax snapshots are directories, pickle snapshots are files."""
    if os.path.isdir(path):
        return load_ckpt_orbax(path)
    return load_ckpt(path)


def resolve_posenet_weights(ckpt: dict, params: Any, batch_stats: Any):
    """Graft a loaded snapshot's posenet weights onto freshly-initialized
    ``(params, batch_stats)`` across ALL layouts this framework and the
    reference write: 'state_dict' (the reference's run_baseline.py:64),
    'model_pos' (run_Fk_GAN.py:176,181 — the layout the reference's own
    evaluator crashes on, SURVEY §2.2), and the full-state 'pos_state' of
    --snapshot/--resume checkpoints.  Shared by run_evaluate.py and
    run_baseline.py's --pretrain warm-start so the supported layouts cannot
    diverge between the two CLIs."""
    saved = ckpt.get("state_dict", ckpt.get("model_pos"))
    if saved is None and "pos_state" in ckpt:
        # full-state resume checkpoint: the posenet lives in its NetState
        pos_state = ckpt["pos_state"]
        saved = pos_state.params
        if getattr(pos_state, "batch_stats", None):
            batch_stats = restore_into(batch_stats, pos_state.batch_stats)
    if saved is None:
        raise SystemExit(
            f"unsupported checkpoint format: keys {sorted(ckpt)} (expected "
            "'state_dict', 'model_pos', or a full-state 'pos_state')")
    params = restore_into(params, saved)
    if ckpt.get("batch_stats"):
        batch_stats = restore_into(batch_stats, ckpt["batch_stats"])
    return params, batch_stats


def restore_into(template: Any, saved: Any) -> Any:
    """Graft saved arrays onto a freshly-initialized pytree ``template``
    (keeps aux static structure; validates leaf KEY PATHS and shapes).

    Key paths are compared, not just flattened order: a checkpoint from a
    different architecture whose leaf count and shapes coincidentally match
    (e.g. two 3-block towers with transposed layer widths) must raise, not
    graft silently."""
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(saved)
    if len(flat_t) != len(flat_s):
        raise ValueError(
            f"checkpoint structure mismatch: {len(flat_s)} saved leaves vs "
            f"{len(flat_t)} template leaves")
    mismatched = [
        (jax.tree_util.keystr(kt), jax.tree_util.keystr(ks))
        for (kt, _), (ks, _) in zip(flat_t, flat_s)
        if jax.tree_util.keystr(kt) != jax.tree_util.keystr(ks)]
    if mismatched:
        head = "; ".join(f"template {t} vs saved {s}"
                         for t, s in mismatched[:3])
        raise ValueError(
            f"checkpoint key-path mismatch ({len(mismatched)} of "
            f"{len(flat_t)} leaves differ): {head}. The checkpoint was "
            "saved from a different model/optimizer architecture.")
    out = []
    for (kt, t), (_, s) in zip(flat_t, flat_s):
        s = np.asarray(s)
        if hasattr(t, "shape") and tuple(t.shape) != tuple(s.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(kt)}: "
                f"template {tuple(t.shape)} vs saved {tuple(s.shape)}")
        out.append(s)
    return jax.tree_util.tree_unflatten(treedef, out)
