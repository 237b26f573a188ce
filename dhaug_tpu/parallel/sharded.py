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
import jax.numpy as jnp

from dhaug_tpu.models.generator import GeneratorConfig, sample_scaler8, synthesize_poses


def make_sharded_synthesizer(gen_apply, gen_cfg: GeneratorConfig,
                             bone_scaler_mode: str = "different",
                             noise_dim: int = 128):
    """Compiled bulk pose synthesis: (params, bone_len (B,15), key) -> poses.
    Shard the bone_len batch over 'data' and the fakes come back sharded —
    per-chip work is embarrassingly parallel, ICI carries nothing until the
    optional host gather."""

    @jax.jit
    def synthesize(gen_params, bone_len, key):
        B = bone_len.shape[0]
        k_n, k_s = jax.random.split(key)
        noise = jax.random.normal(k_n, (B, noise_dim))
        head = gen_apply(gen_params, noise)
        scaler = sample_scaler8(k_s, B, bone_scaler_mode)
        return synthesize_poses(head, bone_len, scaler, gen_cfg)

    return synthesize
