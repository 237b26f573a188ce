"""Pod-scale pose synthesis: bulk FK-GAN sampling (the "DH-3DHP"-style
dataset generation, BASELINE.json config #5) — noise is split per device,
poses come back sharded; one all_gather at the end if a host copy is
wanted.  Parameters ride replicated (or tensor-sharded over 'model'); the
per-chip work is embarrassingly parallel, so XLA/GSPMD inserts no
collectives until the optional host gather — there is no hand-written
collective here by design.  (Sharded *training* runs the production epoch
programs — gan/wgan.py::epoch_step etc. — under the mesh; a separate fused
mega-step used to live here but no runner used it and it was removed.)
"""
from __future__ import annotations

import jax

from dhaug_tpu.models.generator import GeneratorConfig, sample_scaler8, synthesize_poses


def make_sharded_synthesizer(gen_apply, gen_cfg: GeneratorConfig,
                             bone_scaler_mode: str = "different",
                             noise_dim: int = 128, mesh=None,
                             use_pallas_fk: bool = False,
                             interpret: bool = False):
    """Compiled bulk pose synthesis: (params, bone_len (B,15), key) -> poses.

    Without a ``mesh`` (or on a 1-device mesh) this is one jitted program;
    ``use_pallas_fk`` routes the DH chain through the fused kernel
    (ops/fk_pallas.py) on the inference path.

    Under a multi-device ``mesh`` the WHOLE per-shard body — noise draw,
    generator trunk (``gen_apply`` may be the fused Pallas trunk,
    models/trunk_pallas.py, which GSPMD cannot partition), scaler draw and
    FK — runs inside one ``shard_map`` over 'data': params ride replicated,
    bone_len arrives batch-sharded, poses come back sharded, and ICI carries
    nothing until the optional host gather.  Each shard folds its
    ``axis_index`` into the key, so the global noise set differs from the
    single-device draw for the same key (sampling semantics only — the
    output distribution is identical).  ``interpret`` runs the Pallas
    kernels in interpreter mode for CPU test meshes.
    """

    def body(gen_params, bone_len, key):
        B = bone_len.shape[0]
        k_n, k_s = jax.random.split(key)
        noise = jax.random.normal(k_n, (B, noise_dim))
        head = gen_apply(gen_params, noise)
        scaler = sample_scaler8(k_s, B, bone_scaler_mode)
        return synthesize_poses(head, bone_len, scaler, gen_cfg,
                                use_pallas=use_pallas_fk, interpret=interpret)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(body)

    # the in/out specs below shard over 'data' only; a mesh with a non-unit
    # 'model' axis would silently replicate the whole body model_axis× —
    # fail loudly instead (the production caller, scripts/
    # synthesize_dataset.py:70, always builds a data-only mesh)
    if "model" in mesh.shape and mesh.shape["model"] != 1:
        raise ValueError(
            "make_sharded_synthesizer shards over the 'data' axis only; got "
            f"a mesh with model={mesh.shape['model']}. Build the synthesis "
            "mesh with make_mesh(n_dev, model_axis=1) so every device "
            "carries a distinct batch shard.")

    from jax.sharding import PartitionSpec as P

    def per_shard(gen_params, bone_len, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return body(gen_params, bone_len, key)

    spec_in = (P(), P("data"), P())
    kwargs = dict(mesh=mesh, in_specs=spec_in, out_specs=P("data"))
    from dhaug_tpu.parallel.mesh import shard_map_unchecked
    return jax.jit(shard_map_unchecked(per_shard, **kwargs))
