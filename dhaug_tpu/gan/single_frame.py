"""Single-frame FK-GAN epoch orchestration.

Rebuilds the epoch bodies of run_Fk_GAN.py's single-frame mode:
  * ``reskin_dataset``  <- dataloader_update + random_bl_aug
    (function_aug/dataloader_update.py:18-107): every epoch the real train
    3D is re-skinned with random bone-length templates and re-projected.
    Vectorized over the whole dataset in fixed-size chunks (one XLA program)
    instead of a DataLoader pass.
  * ``build_gan`` / ``run_gan_epoch`` <- my_get_poseFk_model +
    GAN_solutions_FK_generator (model_fk_gan_train.py:97-128, 236-510):
    critics every iteration, generator every 5th, fakes buffered into the
    posenet's fake loader.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.data.loaders import PoseDataset, PoseTarget
from dhaug_tpu.gan.wgan import (GanHyper, SingleFrameSteps, camera_bank,
                                make_single_frame_steps)
from dhaug_tpu.models.discriminators import Fk2DDiscriminator, Fk3DDiscriminator
from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
from dhaug_tpu.ops.bones import reskin_pose
from dhaug_tpu.ops.camera import project_to_2d
from dhaug_tpu.train.state import NetState, adam_gan, make_state

_RESKIN_CHUNK = 16384


@jax.jit
def _reskin_chunk(poses_3d, cams, templates, idx):
    new3d = reskin_pose(poses_3d, templates[idx])
    new2d = project_to_2d(new3d, cams[:, :9])
    return new3d, new2d


def reskin_dataset(ds: PoseDataset, templates: np.ndarray,
                   rng: np.random.Generator) -> PoseDataset:
    """Random bone-length template re-skin of every frame + re-projection.
    Returns a new PoseDataset whose pose arrays are DEVICE-resident jax
    arrays (its only consumer, the GAN epoch, batches them with on-device
    index gathers — no host round trip)."""
    n = len(ds)
    templates_j = jnp.asarray(templates)
    chunks3d, chunks2d = [], []
    for s in range(0, n, _RESKIN_CHUNK):
        e = min(s + _RESKIN_CHUNK, n)
        # fixed chunk shape: pad the tail by repetition
        pad = _RESKIN_CHUNK - (e - s)
        sl3 = np.concatenate([ds.poses_3d[s:e], ds.poses_3d[e - 1:e].repeat(pad, 0)]) \
            if pad else ds.poses_3d[s:e]
        slc = np.concatenate([ds.cams[s:e], ds.cams[e - 1:e].repeat(pad, 0)]) \
            if pad else ds.cams[s:e]
        idx = rng.integers(0, templates.shape[0], size=_RESKIN_CHUNK)
        new3d, new2d = _reskin_chunk(jnp.asarray(sl3), jnp.asarray(slc),
                                     templates_j, jnp.asarray(idx))
        chunks3d.append(new3d[: e - s])
        chunks2d.append(new2d[: e - s])
    out3d = jnp.concatenate(chunks3d) if len(chunks3d) > 1 else chunks3d[0]
    out2d = jnp.concatenate(chunks2d) if len(chunks2d) > 1 else chunks2d[0]
    return PoseDataset(out3d, out2d, ds.cams)


class GanBundle(NamedTuple):
    gen_state: NetState
    d3d_state: NetState
    d2d_state: NetState
    steps: SingleFrameSteps
    gen_cfg: GeneratorConfig
    hyper: GanHyper


def build_gan(args, train_subjects, key, mesh=None) -> GanBundle:
    """Create G + D3d + D2d with Adam(lr, 0.5/0.9) each — the reference's
    my_get_poseFk_model (model_fk_gan_train.py:97-128).

    ``mesh`` is the --data_parallel_devices mesh: the compiled steps then run
    the Pallas critic-phase synthesis shard_mapped over 'data' instead of
    silently downgrading to the XLA FK path.  (Non-TPU callers that want the
    kernel in interpreter mode construct GanHyper(use_pallas_fk=True,
    pallas_interpret=True) directly — see __graft_entry__.py and
    tests/test_parallel.py.)"""
    gen_cfg = GeneratorConfig(
        dense_dim=args.Gen_DenseDim,
        output_dim=args.GAN_OUTPUT_DIM,
        use_pre_angle=args.GAN_whether_use_preAngle,
        use_global_rot=args.whether_use_RT,
        video_frames=1,
        bf16_trunk=bool(getattr(args, "bf16_trunk", False)),
    )
    from dhaug_tpu.ops.fk_pallas import fk_pallas_supported
    on_tpu = fk_pallas_supported()
    hyper = GanHyper(
        lambda_gp=float(args.GAN_LAMBDA),
        w3d=args.GAN_3d_loss_weight,
        w2d=args.GAN_2d_loss_weight,
        flip=args.flip_GAN_model_input,
        bone_len_scaler=args.bone_len_scaler,
        # fused FK on the stop_gradient critic fakes; shard_mapped when a
        # data mesh is active (see make_single_frame_steps)
        use_pallas_fk=on_tpu,
        pallas_interpret=not on_tpu,
    )

    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=args.Dis_DenseDim_3D)
    d2d = Fk2DDiscriminator(dense_dim=args.Dis_DenseDim_2D)

    k1, k2, k3 = jax.random.split(key, 3)
    gen_params = gen.init(k1, jnp.zeros((2, 128)))["params"]
    d3d_params = d3d.init(k2, jnp.zeros((2, 16, 3)))["params"]
    d2d_params = d2d.init(k3, jnp.zeros((2, 16, 2)))["params"]

    gen_tx = adam_gan(args.lr_g)
    d3d_tx = adam_gan(args.lr_d)
    d2d_tx = adam_gan(args.lr_d)

    quats, trans, intrs = camera_bank(train_subjects)
    steps = make_single_frame_steps(
        lambda p, x: gen.apply({"params": p}, x),
        lambda p, x: d3d.apply({"params": p}, x),
        lambda p, x: d2d.apply({"params": p}, x),
        d3d_tx, d2d_tx, gen_tx, gen_cfg, hyper, quats, trans, intrs,
        mesh=mesh)

    return GanBundle(
        gen_state=make_state(gen_tx, gen_params),
        d3d_state=make_state(d3d_tx, d3d_params),
        d2d_state=make_state(d2d_tx, d2d_params),
        steps=steps, gen_cfg=gen_cfg, hyper=hyper)


def dump_angle_heatmap(gan: GanBundle, key, path: str, batch: int = 512):
    """Distribution heatmap of the generator's 37 DOF/rot angles — the
    reference dumps one every 500 generator calls (Fk_generator.py:172-175) —
    plus the paper-figure knee-pair density
    (special_operate.my_draw_distribute_for_paper)."""
    import jax

    from dhaug_tpu.models.generator import FkGeneratorNet, head_to_angles
    from dhaug_tpu.utils.viz import (plot_angle_pair_density,
                                     plot_dof_angle_heatmap)
    net = FkGeneratorNet(gan.gen_cfg)
    noise = jax.random.normal(key, (batch, 128))
    head = net.apply({"params": gan.gen_state.params}, noise)
    angles37, _ = head_to_angles(head.reshape(batch, -1, 35), gan.gen_cfg)
    flat = np.asarray(angles37).reshape(-1, 37)
    plot_dof_angle_heatmap(flat, path)
    root, ext = os.path.splitext(path)
    plot_angle_pair_density(flat, f"{root}_knee_pair{ext or '.jpg'}",
                            title="generated knee-DOF pair density")


def run_gan_epoch(gan: GanBundle, gt2d3d: PoseDataset, target_2d: PoseTarget,
                  target_3d: PoseTarget, batch_size: int,
                  np_rng: np.random.Generator, key, summary,
                  writer=None, record_dir: Optional[str] = None,
                  mesh=None) -> tuple[GanBundle, Optional[PoseDataset]]:
    """One GAN pass over the epoch's batches.  Returns the updated states and
    the fake (cam-3D, 2D, intrinsics) dataset for posenet co-training.

    ``mesh`` (from --data_parallel_devices) runs the SAME compiled epoch
    program data-parallel: epoch arrays and net states are replicated, the
    per-iteration index rows are sharded over the mesh's 'data' axis, so each
    scan step's gathered batch lands sharded and GSPMD inserts the gradient
    all-reduces over ICI.  Metrics match the single-device run to reduction
    order (tests/test_parallel.py asserts rtol 1e-4)."""
    steps = gan.steps

    # Device-resident epoch data: upload once; the WHOLE epoch (critic
    # updates every iteration, generator every 5th, fake buffering) runs as
    # one compiled lax.scan program — a single dispatch instead of hundreds
    # of per-batch round trips (model_fk_gan_train.py:273-510's loop).
    dev_3d = jnp.asarray(gt2d3d.poses_3d)
    dev_cam = jnp.asarray(gt2d3d.cams)
    dev_t2d = jnp.asarray(target_2d.poses)
    n = len(gt2d3d)
    n_t2d = len(target_2d)
    # the reference zips independently shuffled loaders, truncating to the
    # shortest (model_fk_gan_train.py:273); target_3d bounds the count even
    # though only its length matters here
    n_batches = min(n, n_t2d, len(target_3d)) // batch_size
    if n_batches == 0:
        return gan, None
    idx_real = np_rng.permutation(n)[: n_batches * batch_size]
    idx_t2d = np_rng.permutation(n_t2d)[: n_batches * batch_size]
    idx_real = jnp.asarray(idx_real.reshape(n_batches, batch_size))
    idx_t2d = jnp.asarray(idx_t2d.reshape(n_batches, batch_size))

    gen_in, d3d_in, d2d_in = gan.gen_state, gan.d3d_state, gan.d2d_state
    if mesh is not None:
        from dhaug_tpu.parallel.mesh import (assert_model_sharded,
                                             place_state, replicate,
                                             shard_index_rows)
        dev_3d, dev_cam, dev_t2d = (replicate(mesh, x)
                                    for x in (dev_3d, dev_cam, dev_t2d))
        idx_real = shard_index_rows(mesh, idx_real)
        idx_t2d = shard_index_rows(mesh, idx_t2d)
        gen_in, d3d_in, d2d_in = (place_state(mesh, s)
                                  for s in (gen_in, d3d_in, d2d_in))
        assert_model_sharded(mesh, gen_in, d3d_in, d2d_in)

    key, k_epoch = jax.random.split(key)
    gen_state, d3d_state, d2d_state, outs = steps.epoch_step(
        gen_in, d3d_in, d2d_in,
        dev_3d, dev_cam, dev_t2d, idx_real, idx_t2d,
        jnp.asarray(summary.train_iter_num, jnp.int32), k_epoch)
    fake3d, fake2d, intr, scalars = outs

    gen_steps = sum(1 for b in range(n_batches)
                    if (summary.train_iter_num + b) % 5 == 4)
    summary.train_discrim_iter_num += n_batches
    summary.train_fakepose_iter_num += gen_steps
    iter_base = summary.train_iter_num
    summary.train_iter_num += n_batches

    # stacked per-iteration metrics: ONE packed device->host transfer
    # (fetch_tree groups the same-dtype stacks; per-leaf np.asarray would pay
    # a ~30-40 ms tunnel round trip per key) serving both the writer block
    # and the epoch-mean scalars below
    from dhaug_tpu.utils.checkpoint import fetch_tree
    scalars = fetch_tree(scalars)

    if writer is not None:
        # tag names follow the reference's writer names
        # (model_fk_gan_train.py:225-228,316,384: Fk_d3d / plain d2d
        # _D_real/_D_fake/_Wasserstein_D under train_G_iter_PoseFk/)
        tag_of = {"3d_d_real": "Fk_d3d_D_real", "3d_d_fake": "Fk_d3d_D_fake",
                  "3d_wasserstein": "Fk_d3d_Wasserstein_D",
                  "3d_d_cost": "Fk_d3d_D_cost",
                  # the reference names the 2D critic writer plain 'd2d'
                  # (model_fk_gan_train.py:384), unlike 'Fk_d3d' (:316) —
                  # its own inconsistency, reproduced for dashboard parity
                  "2d_d_real": "d2d_D_real", "2d_d_fake": "d2d_D_fake",
                  "2d_wasserstein": "d2d_Wasserstein_D",
                  "2d_d_cost": "d2d_D_cost"}
        # critic tags EVERY iteration — the reference's add_scalar calls are
        # unconditional per critic update (model_fk_gan_train.py:225-230);
        # the scalars are already host-side after the one packed fetch, so
        # full-cadence logging costs no extra device round trips
        for b in range(n_batches):
            it = iter_base + b
            for k2, tag in tag_of.items():
                writer.add_scalar(f"train_G_iter_PoseFk/{tag}",
                                  float(scalars[k2][b]), it)
        # G_cost exists only on the every-5th generator iterations (NaN
        # elsewhere); the reference logs EVERY generator update (:481-484)
        # and the scalars are already host-side — one packed fetch above
        g_cost = scalars["g_cost"]
        for b in np.where(~np.isnan(g_cost))[0]:
            writer.add_scalar("train_G_iter_PoseFk/G_cost",
                              float(g_cost[b]), iter_base + int(b))

    gan = gan._replace(gen_state=gen_state, d3d_state=d3d_state,
                       d2d_state=d2d_state)

    # angle-distribution heatmap every ~500 iterations, matching the
    # reference's cadence (Fk_generator.py:172-175): dump when this epoch
    # crossed a 500-iteration boundary (or at the very start)
    crossed_500 = (iter_base // 500) != (summary.train_iter_num // 500)
    if record_dir is not None and (crossed_500 or iter_base == 0):
        # fresh subkey: the epoch key was already consumed above, and reusing
        # it would correlate the heatmap's probe noise with the epoch draws
        key, k_heat = jax.random.split(key)
        dump_angle_heatmap(
            gan, k_heat,
            os.path.join(record_dir,
                         f"34DOF_3GlobalRot_heatmap_{iter_base + 1}.jpg"))

    # epoch-mean critic scalars for the caller's Wasserstein curve (reusing
    # the host copies fetched above); g_cost is NaN off the every-5th
    # generator iterations and may be all-NaN in a short epoch — skip it then
    # rather than warn/record NaN
    epoch_scalars = {
        "3d_wasserstein": float(np.nanmean(scalars["3d_wasserstein"])),
        "2d_wasserstein": float(np.nanmean(scalars["2d_wasserstein"])),
    }
    g_cost_vals = scalars["g_cost"]
    if np.isfinite(g_cost_vals).any():
        epoch_scalars["g_cost"] = float(np.nanmean(g_cost_vals))
    summary.record_epoch_scalars(epoch_scalars)

    # fake buffers stay DEVICE-resident: the posenet phase consumes them with
    # on-device gathers, so no host round trip of ~50 MB per epoch
    B = batch_size
    fake_ds = PoseDataset(fake3d.reshape(n_batches * B, 16, 3),
                          fake2d.reshape(n_batches * B, 16, 2),
                          intr.reshape(n_batches * B, 9))
    return gan, fake_ds
