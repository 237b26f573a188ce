"""Sharded training step assembly + pod-scale pose synthesis.

``full_train_step``: one compiled program covering the whole DH-AUG
iteration — critic updates (3D + 2D with gradient penalty), a generator
update, and a posenet update on the freshly synthesized fakes — with the
batch sharded over the mesh's ``data`` axis and parameters replicated
(or tensor-sharded over ``model``).  XLA/GSPMD inserts the gradient
all-reduces over ICI; there is no hand-written collective here by design.

``synthesize_sharded``: bulk FK-GAN sampling (the "DH-3DHP"-style dataset
generation, BASELINE.json config #5) — noise is split per device, poses come
back sharded; one all_gather at the end if a host copy is wanted.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dhaug_tpu.gan.wgan import GanHyper, make_single_frame_steps
from dhaug_tpu.models.generator import GeneratorConfig, sample_scaler8, synthesize_poses


class ShardedGanPosenet(NamedTuple):
    """Callable bundle for the sharded end-to-end step."""
    train_step: callable


def make_full_train_step(gen_apply, d3d_apply, d2d_apply, posenet_apply,
                         gen_tx, d3d_tx, d2d_tx, pos_tx,
                         gen_cfg: GeneratorConfig, hyper: GanHyper,
                         cam_quats, cam_trans, cam_intrs):
    """One jitted mega-step: critics + generator + posenet-on-fakes.

    Used by the multi-chip dry run and by throughput-oriented training where
    per-phase host round-trips would leave ICI idle.  All optimizer updates
    are expressed functionally; under a Mesh the caller shards the batch
    arguments over 'data'.
    """
    steps = make_single_frame_steps(gen_apply, d3d_apply, d2d_apply,
                                    d3d_tx, d2d_tx, gen_tx, gen_cfg, hyper,
                                    cam_quats, cam_trans, cam_intrs)

    def posenet_update(pos_state, inputs_2d, targets_3d_rel, key):
        def loss_fn(params):
            out = posenet_apply(params, pos_state.batch_stats, inputs_2d, key)
            pred, new_stats = out
            return jnp.mean((pred - targets_3d_rel) ** 2), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pos_state.params)
        updates, opt_state = pos_tx.update(grads, pos_state.opt_state,
                                           pos_state.params)
        params = jax.tree.map(lambda p, u: p + u, pos_state.params, updates)
        return pos_state.replace(params=params, batch_stats=new_stats,
                                 opt_state=opt_state), loss

    @jax.jit
    def train_step(gen_state, d3d_state, d2d_state, pos_state,
                   real_3d_cam, cam_param16, target_2d, key):
        k_c, k_g, k_p = jax.random.split(key, 3)
        (d3d_state, d2d_state, cam_idx, bone_len, fake_cam3d, fake_2d, intr,
         metrics) = steps.critics_step(
            d3d_state, d2d_state, gen_state.params,
            real_3d_cam, cam_param16, target_2d, k_c)
        gen_state, gm = steps.generator_step(
            gen_state, d3d_state.params, d2d_state.params, bone_len, cam_idx, k_g)
        fake_rel = fake_cam3d - fake_cam3d[:, :1]
        pos_state, pos_loss = posenet_update(pos_state, fake_2d, fake_rel, k_p)
        metrics = {**metrics, **gm, "pos_loss": pos_loss}
        return gen_state, d3d_state, d2d_state, pos_state, metrics

    return ShardedGanPosenet(train_step=train_step)


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
