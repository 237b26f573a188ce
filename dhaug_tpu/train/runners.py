"""Shared runner plumbing for the CLI entry points."""
from __future__ import annotations

import datetime
import os
from typing import Iterator, Tuple

import jax
import numpy as np

from dhaug_tpu.train.data_prep import DataBundle
from dhaug_tpu.utils.log import Logger, Summary


def setup_jax(args):
    """Platform override + persistent compile cache (TPU compiles through
    this environment's tunnel are minutes-slow without it)."""
    if getattr(args, "jax_platform", ""):
        jax.config.update("jax_platforms", args.jax_platform)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def make_run_dir(args) -> str:
    """checkpoint/<note>/<posenet>/<keypoints>/<timestamp>_<note>/ — the
    reference's layout (run_Fk_GAN.py:79-83)."""
    run_dir = os.path.join(args.checkpoint, args.posenet_name, args.keypoints,
                           datetime.datetime.now().isoformat() + "_" + args.note)
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "tmp"), exist_ok=True)
    return run_dir


def make_logger(run_dir: str, args) -> Tuple[Logger, Summary]:
    logger = Logger(os.path.join(run_dir, "log.txt"), args)
    logger.set_names(["epoch", "lr", "error_h36m_p1", "error_h36m_p2",
                      "error_3dhp_p1", "error_3dhp_p2", "PCK", "AUC"])
    summary = Summary(run_dir)
    summary.create_summary()
    return logger, summary


def eval_batches(poses_3d: np.ndarray, poses_2d: np.ndarray,
                 batch_size: int) -> Iterator[tuple]:
    """Fixed-shape eval batching: full batches plus one edge-padded remainder
    batch carrying its valid count (so jit sees at most one shape).  Arrays
    are uploaded to device once; batches are on-device slices."""
    import jax.numpy as jnp
    n = poses_3d.shape[0]
    dev3d = jnp.asarray(poses_3d)
    dev2d = jnp.asarray(poses_2d)
    full = n - (n % batch_size)
    for s in range(0, full, batch_size):
        yield dev2d[s:s + batch_size], dev3d[s:s + batch_size], batch_size
    if full < n:
        rem = n - full
        pad = batch_size - rem
        p2 = jnp.concatenate([dev2d[full:], jnp.repeat(dev2d[-1:], pad, 0)])
        p3 = jnp.concatenate([dev3d[full:], jnp.repeat(dev3d[-1:], pad, 0)])
        yield p2, p3, rem


def cache_eval_arrays(bundle) -> None:
    """Replace the bundle's static evaluation arrays with device-resident
    copies so the per-epoch evaluations don't re-upload them (multi-MB
    host->device transfers cost ~30 ms each through this environment's
    tunnel)."""
    import jax.numpy as jnp
    bundle.h36m_test.poses_2d = jnp.asarray(bundle.h36m_test.poses_2d)
    bundle.h36m_test.poses_3d = jnp.asarray(bundle.h36m_test.poses_3d)
    bundle.mpi3d.poses_2d = jnp.asarray(bundle.mpi3d.poses_2d)
    bundle.mpi3d.poses_3d = jnp.asarray(bundle.mpi3d.poses_3d)


def write_eval_scalars(writer, epoch: int, h36m: dict, dhp: dict,
                       tag: str) -> None:
    """Per-epoch evaluation scalars with the reference's TensorBoard tags
    (function_aug/model_pos_eval.py:81-85): posenet_H36M_test/p1score<tag>
    etc. and posenet_mpi3d_loader_flip/... for the flip-averaged 3DHP eval.
    ``tag`` is '_fake' or '_real' (which posenet pass was just trained)."""
    if writer is None:
        return
    for key, scores, flipaug in (("H36M_test", h36m, ""),
                                 ("mpi3d_loader", dhp, "_flip")):
        base = f"posenet_{key}{flipaug}"
        writer.add_scalar(f"{base}/p1score{tag}", scores.get("p1", 0.0), epoch)
        writer.add_scalar(f"{base}/p2score{tag}", scores.get("p2", 0.0), epoch)
        writer.add_scalar(f"{base}/_pck{tag}", scores.get("pck", 0.0), epoch)
        writer.add_scalar(f"{base}/_auc{tag}", scores.get("auc", 0.0), epoch)


def evaluate_both(forward, flip_forward, params, batch_stats, bundle: DataBundle,
                  batch_size: int):
    """H36M (no flip) + 3DHP (flip-averaged) evaluation — the reference's
    evaluate_posenet pairing (function_aug/model_pos_eval.py:93-109)."""
    from dhaug_tpu.train.posenet import evaluate
    h36m = evaluate(forward, params, batch_stats,
                    eval_batches(bundle.h36m_test.poses_3d,
                                 bundle.h36m_test.poses_2d, batch_size))
    dhp = evaluate(forward, params, batch_stats,
                   eval_batches(bundle.mpi3d.poses_3d,
                                bundle.mpi3d.poses_2d, batch_size),
                   flip_forward=flip_forward)
    return h36m, dhp


def make_eval_both_scan(model, bundle: DataBundle, batch_size: int,
                        mesh=None):
    """Single-dispatch-per-set evaluation pair: one compiled scan program
    evaluates all of H36M S9/S11 and one (flip-averaged) all of 3DHP,
    replacing the per-batch dispatch loop of :func:`evaluate_both` (~100
    dispatches x ~30 ms tunnel round trip per epoch at production sizes).
    Metrics are numerically identical (exact per-frame weighting; asserted
    in tests/test_train.py).  Call ``cache_eval_arrays(bundle)`` first so
    the eval arrays are device-resident.  ``mesh``
    (--data_parallel_devices) shards each scan iteration's batch over
    'data' so the 4 per-epoch evaluations run data-parallel too."""
    import jax.numpy as jnp

    from dhaug_tpu.train.posenet import evaluate_scan, make_eval_epoch_fn
    eval_plain = make_eval_epoch_fn(model, flip=False)
    eval_flip = make_eval_epoch_fn(model, flip=True)
    h2d = jnp.asarray(bundle.h36m_test.poses_2d)
    h3d = jnp.asarray(bundle.h36m_test.poses_3d)
    m2d = jnp.asarray(bundle.mpi3d.poses_2d)
    m3d = jnp.asarray(bundle.mpi3d.poses_3d)
    if mesh is not None:
        # replicate the static eval sets ONCE here; evaluate_scan's per-call
        # replicate() then no-ops on them (parallel/mesh._put skips arrays
        # already placed) instead of re-broadcasting MBs 4x per epoch
        from dhaug_tpu.parallel.mesh import replicate
        h2d, h3d, m2d, m3d = (replicate(mesh, x)
                              for x in (h2d, h3d, m2d, m3d))

    def run(params, batch_stats):
        h36m = evaluate_scan(eval_plain, params, batch_stats, h2d, h3d,
                             batch_size, mesh=mesh)
        dhp = evaluate_scan(eval_flip, params, batch_stats, m2d, m3d,
                            batch_size, mesh=mesh)
        return h36m, dhp

    return run
