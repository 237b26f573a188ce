"""Posenet training and evaluation steps (single-frame and video).

Rebuilds function_aug/model_pos_train.py:13 (train_posenet),
function_baseline/model_pos_train.py:18, function_aug/model_pos_eval.py:16
(evaluate) and the video variants (video_mode_operate.py:532,652,769) as
compiled JAX steps.  The flip / time-reversal duplicated optimizer steps of
the reference are reproduced by re-invoking the same compiled step on the
transformed batch (identical update dynamics, one compilation).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops.augment import flip_pose, time_reverse
from dhaug_tpu.ops.metrics import mpjpe, p_mpjpe_per_sample
from dhaug_tpu.train.state import NetState


def root_relative(pose: jnp.ndarray) -> jnp.ndarray:
    """Subtract the hip joint (joint 0) along the joint axis."""
    return pose - pose[..., :1, :]


def make_posenet_train_step(model, tx, criterion: str = "mse"):
    """criterion 'mse' (single-frame, nn.MSELoss) or 'mpjpe' (video)."""

    def loss_of(outputs, targets):
        if criterion == "mse":
            return jnp.mean((outputs - targets) ** 2)
        return mpjpe(outputs, targets)

    @jax.jit
    def step(state: NetState, inputs_2d, targets_3d_rel, key):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                outputs, mutated = model.apply(
                    variables, inputs_2d, train=True,
                    rngs={"dropout": key}, mutable=["batch_stats"])
                new_stats = mutated["batch_stats"]
            else:
                outputs = model.apply(variables, inputs_2d, train=True,
                                      rngs={"dropout": key})
                new_stats = state.batch_stats
            return loss_of(outputs, targets_3d_rel), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(params=params, batch_stats=new_stats,
                             opt_state=opt_state), loss

    return step


def train_epoch(step, state: NetState, batches, key, *,
                flip: bool = True, playback: bool = False,
                video: bool = False) -> Tuple[NetState, float]:
    """One pass over ``batches`` of (inputs_2d, targets_3d).

    Reproduces the reference's duplicated-step schedule: base step, optional
    time-reversed step (video playback aug), optional flipped step, optional
    flipped+reversed step — each a full optimizer update
    (video_mode_operate.py:551-629).  targets are root-centred here."""
    losses = []
    for inputs_2d, targets_3d in batches:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        inputs_2d = jnp.asarray(inputs_2d)
        targets = root_relative(jnp.asarray(targets_3d))
        state, loss = step(state, inputs_2d, targets, k1)
        losses.append(loss)
        if playback and video:
            state, _ = step(state, time_reverse(inputs_2d), targets, k2)
        if flip:
            state, _ = step(state, flip_pose(inputs_2d),
                            flip_pose(targets), k3)
            if playback and video:
                state, _ = step(state, time_reverse(flip_pose(inputs_2d)),
                                flip_pose(targets), k4)
    # one host fetch for the whole epoch's losses
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
    return state, mean_loss


def make_posenet_epoch_fn(model, tx, criterion: str = "mse",
                          flip: bool = True, playback: bool = False):
    """A whole posenet training pass as ONE compiled program: lax.scan over
    (n_batches, B) index rows of device-resident epoch arrays, with the
    optional flip-duplicated (and, for video clips, time-reversal playback)
    Adam steps inside the scan body.  Replaces hundreds of per-batch
    dispatches (each costs tens of ms of host time through this
    environment's TPU tunnel)."""
    step = make_posenet_train_step(model, tx, criterion)

    # donate the net state on TPU: callers thread the returned state (see
    # train_epoch_scan); CPU ignores donation, so gate on backend
    _donate = (0,) if jax.default_backend() == "tpu" else ()

    @functools.partial(jax.jit, donate_argnums=_donate)
    def epoch_fn(state: NetState, dev2d, dev3d, idx, key):
        keys = jax.random.split(key, idx.shape[0])

        def body(state, inp):
            sel, k = inp
            k1, k2, k3, k4 = jax.random.split(k, 4)
            x = dev2d[sel]
            y = root_relative(dev3d[sel])
            state, loss = step(state, x, y, k1)
            if playback:  # reversed clip, same target (video_mode_operate.py:577-590)
                state, _ = step(state, time_reverse(x), y, k2)
            if flip:
                xf, yf = flip_pose(x), flip_pose(y)
                state, _ = step(state, xf, yf, k3)
                if playback:
                    state, _ = step(state, time_reverse(xf), yf, k4)
            return state, loss

        state, losses = jax.lax.scan(body, state, (idx, keys))
        return state, jnp.mean(losses)

    return epoch_fn


def make_video_window_epoch_fn(model, tx, window: int,
                               criterion: str = "mpjpe", flip: bool = True,
                               playback: bool = False):
    """Scan-epoch for the real video posenet pass: clip windows are gathered
    ON DEVICE inside the scan from the edge-padded sequence concatenation
    (see data/chunked.ChunkWindows) — inputs are (n_batches, B) window-start
    and centre-frame index matrices."""
    step = make_posenet_train_step(model, tx, criterion)

    _donate = (0,) if jax.default_backend() == "tpu" else ()

    @functools.partial(jax.jit, donate_argnums=_donate)
    def epoch_fn(state: NetState, big2d, big3d, start2d, idx3d, key):
        win = jnp.arange(window)
        keys = jax.random.split(key, start2d.shape[0])

        def body(state, inp):
            s2, i3, k = inp
            k1, k2, k3, k4 = jax.random.split(k, 4)
            x = big2d[s2[:, None] + win[None]]        # (B, F, 16, 2)
            y = root_relative(big3d[i3][:, None])     # (B, 1, 16, 3)
            state, loss = step(state, x, y, k1)
            if playback:
                state, _ = step(state, time_reverse(x), y, k2)
            if flip:
                xf, yf = flip_pose(x), flip_pose(y)
                state, _ = step(state, xf, yf, k3)
                if playback:
                    state, _ = step(state, time_reverse(xf), yf, k4)
            return state, loss

        state, losses = jax.lax.scan(body, state, (start2d, idx3d, keys))
        return state, jnp.mean(losses)

    return epoch_fn


def train_epoch_scan(epoch_fn, state: NetState, poses_2d, poses_3d,
                     np_rng, batch_size: int, key, mesh=None):
    """Drive a scan-epoch function: build the shuffled (n_batches, B) index
    matrix, run the single dispatch, return (state, mean loss).

    With ``mesh`` (--data_parallel_devices) the same compiled program runs
    data-parallel: epoch arrays/state replicated, index rows sharded over
    'data', gradient all-reduce inserted by GSPMD."""
    n = poses_2d.shape[0]
    n_batches = n // batch_size
    if n_batches == 0:
        return state, float("nan")
    idx = np_rng.permutation(n)[: n_batches * batch_size]
    idx = jnp.asarray(idx.reshape(n_batches, batch_size))
    dev2d, dev3d = jnp.asarray(poses_2d), jnp.asarray(poses_3d)
    if mesh is not None:
        from dhaug_tpu.parallel.mesh import (place_state, replicate,
                                             shard_index_rows)
        dev2d, dev3d = replicate(mesh, dev2d), replicate(mesh, dev3d)
        idx = shard_index_rows(mesh, idx)
        state = place_state(mesh, state)
    state, loss = epoch_fn(state, dev2d, dev3d, idx, key)
    return state, float(loss)


def make_posenet_eval_step(model):
    @jax.jit
    def forward(params, batch_stats, inputs_2d):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, inputs_2d, train=False)

    @jax.jit
    def forward_flip(params, batch_stats, inputs_2d):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, inputs_2d, train=False)
        out_f = model.apply(variables, flip_pose(inputs_2d), train=False)
        return (out + flip_pose(out_f)) / 2.0

    return forward, forward_flip


@jax.jit
def _per_sample_metrics(outputs_3d, targets_3d):
    """Per-frame P1/P2 (mm) and per-joint error (mm); frames flattened."""
    out = root_relative(outputs_3d).reshape((-1, 16, 3))
    tgt = root_relative(targets_3d).reshape((-1, 16, 3))
    err_mm = jnp.linalg.norm(out - tgt, axis=-1) * 1000.0      # (N, 16)
    p1 = jnp.mean(err_mm, axis=-1)
    p2 = p_mpjpe_per_sample(out, tgt) * 1000.0
    return p1, p2, err_mm


_AUC_THRESHOLDS = np.linspace(0.0, 150.0, 31)


def make_eval_epoch_fn(model, flip: bool = False):
    """Whole-evaluation-set inference + per-frame P1/P2/per-joint-error as
    ONE compiled program: a lax.scan over (n_batches, B) index rows of the
    device-resident eval arrays.  Replaces ~100 per-batch dispatches (each
    costs ~30 ms of host time through this environment's TPU tunnel) with a
    single dispatch per evaluation.  ``flip`` enables the flip-averaged
    inference used for 3DHP (function_aug/model_pos_eval.py:38-52).

    Returns fn(params, batch_stats, dev2d, dev3d, idx) ->
    (p1 (n, B), p2 (n, B), err_mm (n, B, 16)); the caller masks padding."""

    @jax.jit
    def eval_fn(params, batch_stats, dev2d, dev3d, idx):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def body(_, sel):
            x = dev2d[sel]
            y = dev3d[sel]
            out = model.apply(variables, x, train=False)
            if flip:
                out_f = model.apply(variables, flip_pose(x), train=False)
                out = (out + flip_pose(out_f)) / 2.0
            p1, p2, err = _per_sample_metrics(out, y)
            return None, (p1, p2, err)

        _, (p1, p2, err) = jax.lax.scan(body, None, idx)
        return p1, p2, err

    return eval_fn


def evaluate_scan(eval_fn, params, batch_stats, dev2d, dev3d,
                  batch_size: int, mesh=None) -> Dict[str, float]:
    """Drive a scan-eval function over the full set (edge-padded remainder,
    padding masked out of every statistic).  Exact per-frame weighting as
    :func:`evaluate`.

    With ``mesh`` (--data_parallel_devices) the per-iteration batch is
    sharded over 'data' like the training scans, so the 4 per-epoch
    evaluations run data-parallel instead of on one chip."""
    n = int(dev2d.shape[0])
    if n == 0:
        return {k: float("nan") for k in ("p1", "p2", "pck", "auc")}
    n_batches = -(-n // batch_size)
    pad_to = n_batches * batch_size
    idx = np.minimum(np.arange(pad_to), n - 1)     # edge-pad with last frame
    idx = jnp.asarray(idx.reshape(n_batches, batch_size))
    if mesh is not None and batch_size % mesh.shape["data"] == 0:
        from dhaug_tpu.parallel.mesh import (place_state, replicate,
                                             shard_index_rows)
        dev2d, dev3d = replicate(mesh, dev2d), replicate(mesh, dev3d)
        params = place_state(mesh, params)
        if batch_stats:
            batch_stats = replicate(mesh, batch_stats)
        idx = shard_index_rows(mesh, idx)
    p1, p2, err = eval_fn(params, batch_stats, dev2d, dev3d, idx)
    # one host fetch for everything
    p1 = np.asarray(p1).reshape(-1)[:n]
    p2 = np.asarray(p2).reshape(-1)[:n]
    err = np.asarray(err).reshape(-1, err.shape[-1])[:n]
    return {
        "p1": float(np.mean(p1)),
        "p2": float(np.mean(p2)),
        "pck": float(np.mean(err < 150.0) * 100.0),
        "auc": float(np.mean([np.mean(err < t) * 100.0
                              for t in _AUC_THRESHOLDS])),
    }


def evaluate_sequences(forward, params, batch_stats, batches,
                       flip_forward=None) -> Dict[str, float]:
    """Whole-sequence evaluation with the reference's SEQUENCE-weighted
    aggregation (video_mode_operate.py:769-862): the UnchunkedGenerator
    yields batch=1 whole sequences, so every AverageMeter update there
    carries num_poses == 1 — each camera sequence contributes EQUALLY to the
    published number regardless of its frame count (unlike the single-frame
    protocol's per-frame weighting).  ``batches`` yields
    (inputs_2d (1, T(+pad bucket), 16, 2), targets_3d (1, T', 16, 3), valid)
    where ``valid`` masks bucket padding out of the per-sequence means."""
    fwd = flip_forward if flip_forward is not None else forward
    p1s, p2s, pcks, aucs = [], [], [], []
    for batch in batches:
        inputs_2d, targets_3d = batch[0], batch[1]
        valid = batch[2] if len(batch) > 2 else None
        outputs = fwd(params, batch_stats, jnp.asarray(inputs_2d))
        p1, p2, err = _per_sample_metrics(outputs, jnp.asarray(targets_3d))
        if valid is not None:
            p1, p2, err = p1[:valid], p2[:valid], err[:valid]
        # per-sequence means, each later counted with weight 1
        p1s.append(jnp.mean(p1))
        p2s.append(jnp.mean(p2))
        frac = jnp.stack([jnp.mean(err < t) * 100.0
                          for t in _AUC_THRESHOLDS])
        pcks.append(frac[-1])          # threshold 150 is the last entry
        aucs.append(jnp.mean(frac))
    if not p1s:
        return {k: float("nan") for k in ("p1", "p2", "pck", "auc")}
    # one host fetch for the whole evaluation
    stacked = np.asarray(jnp.stack([jnp.stack(p1s), jnp.stack(p2s),
                                    jnp.stack(pcks), jnp.stack(aucs)]))
    return {
        "p1": float(stacked[0].mean()),
        "p2": float(stacked[1].mean()),
        "pck": float(stacked[2].mean()),
        "auc": float(stacked[3].mean()),
    }


def evaluate(forward, params, batch_stats, batches,
             flip_forward=None) -> Dict[str, float]:
    """Batched evaluation; exact per-frame-weighted P1/P2 (mm) and per-joint
    PCK@150 / AUC (%), matching the reference's AverageMeter accumulation.

    ``batches`` yields (inputs_2d, targets_3d[, valid_count]); a trailing
    valid_count masks out padded frames so every batch can keep a fixed XLA
    shape.  ``flip_forward`` enables the flip-averaged inference used for
    3DHP (function_aug/model_pos_eval.py:38-52)."""
    p1s, p2s, errs = [], [], []
    fwd = flip_forward if flip_forward is not None else forward
    for batch in batches:
        inputs_2d, targets_3d = batch[0], batch[1]
        valid = batch[2] if len(batch) > 2 else None
        inputs_2d = jnp.asarray(inputs_2d)
        targets_3d = jnp.asarray(targets_3d)
        outputs = fwd(params, batch_stats, inputs_2d)
        p1, p2, err = _per_sample_metrics(outputs, targets_3d)
        # stay on device; a single host fetch happens after the loop
        if valid is not None:
            p1, p2, err = p1[:valid], p2[:valid], err[:valid]
        p1s.append(p1)
        p2s.append(p2)
        errs.append(err)
    if not p1s:
        return {k: float("nan") for k in ("p1", "p2", "pck", "auc")}
    p1 = np.asarray(jnp.concatenate(p1s))
    p2 = np.asarray(jnp.concatenate(p2s))
    err = np.asarray(jnp.concatenate(errs))
    return {
        "p1": float(np.mean(p1)),
        "p2": float(np.mean(p2)),
        "pck": float(np.mean(err < 150.0) * 100.0),
        "auc": float(np.mean([np.mean(err < t) * 100.0 for t in _AUC_THRESHOLDS])),
    }
