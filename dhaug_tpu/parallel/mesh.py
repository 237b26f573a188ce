"""Device mesh construction and sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2: no torch.distributed
anywhere); parallelism here is a greenfield TPU design:

  * 1-D ``data`` mesh over ICI for the GAN and posenet steps — the batch
    (1024 poses) is the parallel axis; parameters are replicated and XLA
    inserts the gradient all-reduce.
  * optional 2-D (data, model) mesh: the 1000-wide dense layers of the
    generator/critics shard over ``model`` (tensor parallelism) for pod-scale
    synthesis where activations dominate HBM.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh; model_axis=1 gives pure data parallelism."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_unchecked(fn, **kwargs):
    """shard_map with replication checking off, across jax versions.

    jax >= 0.6 exposes top-level ``jax.shard_map(check_vma=...)``; in the
    0.4.35-0.5 transition window the top-level symbol exists but still takes
    ``check_rep``, so feature-detect the kwarg instead of trusting the
    import location.  Checking is disabled because pallas_call out_shapes
    carry no vma info (ops/fk_pallas.py) and the sharded synthesis body is
    deterministic per shard (parallel/sharded.py)."""
    import inspect
    try:
        from jax import shard_map  # jax >= 0.6
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    if "check_vma" in inspect.signature(shard_map).parameters:
        return shard_map(fn, check_vma=False, **kwargs)
    return shard_map(fn, check_rep=False, **kwargs)  # pragma: no cover


def _put(x, sh: NamedSharding):
    """device_put that skips arrays already laid out as requested — the
    per-epoch placement calls in the training loops must not re-broadcast
    the static epoch data every epoch."""
    cur = getattr(x, "sharding", None)
    if cur is not None and getattr(x, "ndim", None) is not None:
        try:
            if cur.is_equivalent_to(sh, x.ndim):
                return x
        except Exception:
            pass
    return jax.device_put(x, sh)


def shard_batch(mesh: Mesh, *arrays):
    """device_put arrays with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    out = tuple(_put(a, sh) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh (no-op for leaves already
    replicated on it)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, sh), tree)


def shard_index_rows(mesh: Mesh, arr):
    """Place an (n_batches, B, ...) epoch-index (or per-iteration data) array
    with the per-iteration batch axis sharded over 'data'.  Inside a scan
    each step slices one row, so the gathered batch comes out sharded over
    the mesh and every downstream matmul/update runs data-parallel with XLA
    inserting the gradient all-reduces."""
    return _put(arr, NamedSharding(mesh, P(None, "data")))


def mesh_from_args(args) -> Optional[Mesh]:
    """Build the (data, model) mesh requested by --data_parallel_devices /
    --model_parallel_devices (both 0/1 = single device, no mesh).  Validates
    device count and batch divisibility up front so a user asking for 8
    chips can never silently get 1."""
    n_data = int(getattr(args, "data_parallel_devices", 0) or 0)
    n_model = int(getattr(args, "model_parallel_devices", 0) or 0)
    n_data, n_model = max(n_data, 1), max(n_model, 1)
    if n_data * n_model <= 1:
        return None
    devs = jax.devices()
    total = n_data * n_model
    if len(devs) < total:
        raise SystemExit(
            f"--data_parallel_devices {n_data} x --model_parallel_devices "
            f"{n_model} requests {total} devices but only {len(devs)} JAX "
            f"device(s) are visible on platform '{devs[0].platform}'")
    if args.batch_size % n_data != 0:
        raise SystemExit(
            f"--batch_size {args.batch_size} is not divisible by "
            f"--data_parallel_devices {n_data}")
    mesh = make_mesh(total, model_axis=n_model)
    print(f"==> Parallel mesh: {total} x {devs[0].platform} "
          f"({dict(mesh.shape)})")
    return mesh


# Dense widths >= this shard over 'model'; the production nets' wide layers
# are 1000-4096 (Gen_DenseDim/Dis_DenseDim defaults and the posenet MLP's
# 1024), narrow glue layers (<=100) stay replicated.
TP_MIN_WIDTH = 512


def shard_params_tp(mesh: Mesh, params, min_width: int = TP_MIN_WIDTH):
    """Tensor-parallel placement: shard wide Dense kernels/biases over the
    'model' axis (last dim), replicate everything else.  With GSPMD, jit
    propagates these shardings through the matmuls and inserts the
    collectives."""
    def place(path, x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[-1] >= min_width \
                and x.shape[-1] % mesh.shape["model"] == 0:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def assert_model_sharded(mesh: Optional[Mesh], *trees, what="GAN net states"):
    """Fail loudly when a non-unit 'model' axis sharded NOTHING across the
    given state trees — otherwise a user asking for tensor parallelism whose
    dense widths don't divide by --model_parallel_devices gets silent full
    replication (model_axis x the chips for zero speedup).  Nets that
    legitimately have no wide layers (e.g. a 128-wide GCN posenet) should
    not be passed here."""
    if mesh is None or mesh.shape.get("model", 1) == 1:
        return
    for tree in trees:
        for x in jax.tree.leaves(tree):
            spec = getattr(getattr(x, "sharding", None), "spec", None)
            if spec is not None and "model" in spec:
                return
    raise SystemExit(
        f"--model_parallel_devices {mesh.shape['model']} sharded no layer "
        f"of the {what}: no Dense width >= {TP_MIN_WIDTH} is divisible by "
        f"{mesh.shape['model']}. Pick a divisor of Gen_DenseDim / "
        "Dis_DenseDim (defaults 1000) or drop --model_parallel_devices.")


def place_state(mesh: Mesh, tree, min_width: int = TP_MIN_WIDTH):
    """Mesh placement for a net/optimizer state pytree: pure data
    parallelism replicates everything; with a non-unit 'model' axis the wide
    Dense kernels/biases (and their Adam moments, which share shapes) shard
    over 'model' so GSPMD partitions the matmuls (tensor parallelism)."""
    if mesh.shape.get("model", 1) == 1:
        return replicate(mesh, tree)
    return shard_params_tp(mesh, tree, min_width=min_width)
