"""Video-mode FK-GAN: 5-model WGAN-GP epoch (generator + 2 single-frame
critics + 2 motion critics).

Rebuilds video_mode_GAN_solutions_FK_generator (video_GAN_fun.py:79-601) and
video_mode_my_get_poseFk_model (model_fk_gan_train.py:131-173):

  * single-frame critics judge every frame of every clip independently
    (batch B*F); motion critics judge whole clips (batch B) and only start
    after --single_dis_warmup_epoch;
  * augmentation axes: left/right flip (extra critic updates) and time
    reversal "playback" (extra *motion*-critic updates,
    video_GAN_fun.py:219-232);
  * the generator's every-5th-iteration update scores up to 4 critics with
    weights w3d/w2d/w3d_motion/w2d_motion; its flip branches are detached in
    the reference (:493-499) and reproduced with stop_gradient, while the
    playback branches carry gradient (:469-482);
  * real clips are root-centred per frame before the 3D critics
    (video_GAN_fun.py:181), so root trajectory information reaches only the
    2D motion critic.

Deviation from the reference (deliberate): video_GAN_fun.py:467 reshapes the
3D fake with 16*2 before the generator-step playback branch — a latent shape
bug (SURVEY.md §2.2) that scrambles frames; here the reshape is the correct
16*3.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.gan.wgan import GanHyper, camera_bank, make_critic_step
from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                             Fk3DDiscriminator,
                                             MotionFk2DDiscriminator,
                                             MotionFk3DDiscriminator)
from dhaug_tpu.models.generator import (FkGeneratorNet, GeneratorConfig,
                                        sample_scaler8, synthesize_poses)
from dhaug_tpu.ops.augment import flip_pose, time_reverse
from dhaug_tpu.ops.bones import bone_lengths_fk
from dhaug_tpu.ops.camera import (camera_to_world_batch, project_to_2d,
                                  world_to_camera_batch)
from dhaug_tpu.train.state import NetState, adam_gan, make_state


class VideoGanBundle(NamedTuple):
    gen_state: NetState
    d3d_state: NetState
    d2d_state: NetState
    md3d_state: NetState
    md2d_state: NetState
    steps: "VideoSteps"
    gen_cfg: GeneratorConfig
    hyper: GanHyper
    playback: bool


class VideoSteps(NamedTuple):
    critics_step: callable     # static arg: use_motion
    generator_step: callable   # static arg: use_motion
    epoch_step: callable       # whole epoch as one scan program


def build_video_gan(args, train_subjects, video_frames: int, key,
                    mesh=None, use_pallas_fk=None) -> VideoGanBundle:
    """``mesh`` as in single_frame.build_gan: the Pallas critic-phase
    synthesis is shard_mapped over the data mesh instead of silently
    downgrading to the XLA FK path in multi-chip training.

    ``use_pallas_fk`` overrides the backend auto-detection (None) — pass
    False to pin the XLA FK lowering, e.g. for backend-independent cost
    analysis of the critic-phase program."""
    gen_cfg = GeneratorConfig(
        dense_dim=args.Gen_DenseDim, output_dim=args.GAN_OUTPUT_DIM,
        use_pre_angle=args.GAN_whether_use_preAngle,
        use_global_rot=args.whether_use_RT, video_frames=video_frames,
        bf16_trunk=bool(getattr(args, "bf16_trunk", False)))
    from dhaug_tpu.ops.fk_pallas import fk_pallas_supported
    on_tpu = fk_pallas_supported()
    pallas = on_tpu if use_pallas_fk is None else bool(use_pallas_fk)
    hyper = GanHyper(
        lambda_gp=float(args.GAN_LAMBDA), w3d=args.GAN_3d_loss_weight,
        w2d=args.GAN_2d_loss_weight,
        w3d_motion=args.GAN_3d_motion_loss_weight,
        w2d_motion=args.GAN_2d_motion_loss_weight,
        flip=args.flip_GAN_model_input, bone_len_scaler=args.bone_len_scaler,
        use_pallas_fk=pallas,
        pallas_interpret=not on_tpu)

    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=args.Dis_DenseDim_3D)
    d2d = Fk2DDiscriminator(dense_dim=args.Dis_DenseDim_2D)
    md3d = MotionFk3DDiscriminator(
        video_frames=video_frames, dense_dim=args.video_Dis_DenseDim_3D,
        use_pos_branch=args.motion_Dis_whether_use_3dPos_branch,
        use_diff_branch=args.motion_Dis_whether_use_3dDiff_branch)
    md2d = MotionFk2DDiscriminator(video_frames=video_frames,
                                   dense_dim=args.video_Dis_DenseDim_2D)

    F = video_frames
    k = jax.random.split(key, 5)
    gen_params = gen.init(k[0], jnp.zeros((2, 128)))["params"]
    d3d_params = d3d.init(k[1], jnp.zeros((2, 16, 3)))["params"]
    d2d_params = d2d.init(k[2], jnp.zeros((2, 16, 2)))["params"]
    md3d_params = md3d.init(k[3], jnp.zeros((2, F, 16, 3)))["params"]
    md2d_params = md2d.init(k[4], jnp.zeros((2, F, 16, 2)))["params"]

    txs = {n: adam_gan(args.lr_d if n != "gen" else args.lr_g)
           for n in ("gen", "d3d", "d2d", "md3d", "md2d")}

    gen_apply = lambda p, x: gen.apply({"params": p}, x)
    d3d_apply = lambda p, x: d3d.apply({"params": p}, x)
    d2d_apply = lambda p, x: d2d.apply({"params": p}, x)
    md3d_apply = lambda p, x: md3d.apply({"params": p}, x)
    md2d_apply = lambda p, x: md2d.apply({"params": p}, x)

    quats, trans, intrs = camera_bank(train_subjects)
    playback = bool(args.GAN_video_playback_input)
    steps = make_video_steps(
        gen_apply, d3d_apply, d2d_apply, md3d_apply, md2d_apply,
        txs["d3d"], txs["d2d"], txs["md3d"], txs["md2d"], txs["gen"],
        gen_cfg, hyper, quats, trans, intrs, playback, mesh=mesh)

    return VideoGanBundle(
        gen_state=make_state(txs["gen"], gen_params),
        d3d_state=make_state(txs["d3d"], d3d_params),
        d2d_state=make_state(txs["d2d"], d2d_params),
        md3d_state=make_state(txs["md3d"], md3d_params),
        md2d_state=make_state(txs["md2d"], md2d_params),
        steps=steps, gen_cfg=gen_cfg, hyper=hyper, playback=playback)


def make_video_steps(gen_apply, d3d_apply, d2d_apply, md3d_apply, md2d_apply,
                     d3d_tx, d2d_tx, md3d_tx, md2d_tx, gen_tx,
                     gen_cfg: GeneratorConfig, hyper: GanHyper,
                     cam_quats, cam_trans, cam_intrs, playback: bool,
                     mesh=None) -> VideoSteps:
    """Build the compiled programs of the video GAN epoch from the net apply
    fns + optimizers — the video twin of wgan.make_single_frame_steps (used
    directly by the update-level reference-parity tests, which substitute
    SGD; production goes through build_video_gan)."""
    F = gen_cfg.video_frames
    d3d_step = make_critic_step(d3d_apply, d3d_tx, hyper.lambda_gp)
    d2d_step = make_critic_step(d2d_apply, d2d_tx, hyper.lambda_gp)
    md3d_step = make_critic_step(md3d_apply, md3d_tx, hyper.lambda_gp)
    # The reference updates the motion-2D critic WITHOUT dis_mode='motion'
    # (video_GAN_fun.py:341,355,393), so its GP interpolates and takes
    # gradient norms per FRAME (batch B*F of 16*2 rows), not per clip like
    # the motion-3D critic — reproduced via gp_granularity.
    md2d_step = make_critic_step(md2d_apply, md2d_tx, hyper.lambda_gp,
                                 gp_granularity=F)

    quats, trans, intrs = cam_quats, cam_trans, cam_intrs
    n_cams = quats.shape[0]
    flip = hyper.flip

    def synth_fake(gen_params, bone_len, key, use_pallas: bool = False,
                   noise=None, scaler8=None):
        """``noise`` / ``scaler8`` override the random draws — used by the
        update-level reference-parity tests to inject the reference's
        torch.randn / FK_DH_Class.random draws; production passes None."""
        B = bone_len.shape[0]
        k_n, k_s = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_n, (B, hyper.noise_dim))
        head = gen_apply(gen_params, noise)
        if scaler8 is None:
            scaler8 = sample_scaler8(k_s, B, hyper.bone_len_scaler)
        return synthesize_poses(head, bone_len, scaler8, gen_cfg,
                                use_pallas=use_pallas, mesh=mesh,
                                interpret=hyper.pallas_interpret)  # (B,F,16,3)

    @functools.partial(jax.jit, static_argnames=("use_motion",))
    def critics_step(d3d_state, d2d_state, md3d_state, md2d_state, gen_params,
                     real_3d_clip, cam16, real_2d_clip, key, use_motion: bool,
                     noise=None, scaler8=None, cam_idx=None, alphas=None):
        """real_3d_clip (B, F, 16, 3) camera space; cam16 (B, 16);
        real_2d_clip (B, F, 16, 2).

        ``noise``/``scaler8``/``cam_idx``/``alphas`` override the random
        draws (parity tests only).  ``alphas`` is a 12-tuple of GP
        interpolation draws in the reference's update order
        (video_GAN_fun.py:208-418): d3d, md3d, md3d-playback, d3d-flip,
        md3d-flip, md3d-flip-playback, d2d, md2d, md2d-playback, d2d-flip,
        md2d-flip, md2d-flip-playback."""
        B = real_3d_clip.shape[0]
        keys = jax.random.split(key, 16)
        _a = (lambda i: None) if alphas is None else (lambda i: alphas[i])

        # harvest bone lengths from the clip's first frame (bones are
        # constant within a real clip; the generator takes one set per clip)
        bone_len = bone_lengths_fk(real_3d_clip[:, 0])[:, None]  # (B, 1, 15)

        # real world clips, root-centred per frame (video_GAN_fun.py:178-181)
        real_world = camera_to_world_batch(
            real_3d_clip.reshape((B * F, 16, 3)),
            jnp.repeat(cam16[:, 9:13], F, axis=0),
            jnp.repeat(cam16[:, 13:16], F, axis=0))
        real_rel = (real_world - real_world[:, :1]).reshape((B, F, 16, 3))

        fake_world = jax.lax.stop_gradient(
            synth_fake(gen_params, bone_len[:, 0], keys[0],
                       use_pallas=hyper.use_pallas_fk,
                       noise=noise, scaler8=scaler8))          # (B,F,16,3)
        fake_root = fake_world[:, :, :1]
        fake_rel = fake_world - fake_root

        metrics = {}

        # ---- 3D critics ----
        d3d_state, m = d3d_step(d3d_state, real_rel.reshape((-1, 16, 3)),
                                fake_rel.reshape((-1, 16, 3)), keys[1],
                                alpha=_a(0))
        if use_motion:
            md3d_state, mm = md3d_step(md3d_state, real_rel, fake_rel, keys[2],
                                       alpha=_a(1))
            if playback:
                md3d_state, mb = md3d_step(md3d_state, time_reverse(real_rel),
                                           time_reverse(fake_rel), keys[3],
                                           alpha=_a(2))
                mm = {k2: (mm[k2] + mb[k2]) / 2 for k2 in mm}
        if flip:
            real_f = flip_pose(real_rel)
            fake_f = flip_pose(fake_rel)
            d3d_state, mf = d3d_step(d3d_state, real_f.reshape((-1, 16, 3)),
                                     fake_f.reshape((-1, 16, 3)), keys[4],
                                     alpha=_a(3))
            m = {k2: (m[k2] + mf[k2]) / 2 for k2 in m}
            if use_motion:
                md3d_state, mmf = md3d_step(md3d_state, real_f, fake_f, keys[5],
                                            alpha=_a(4))
                if playback:
                    md3d_state, mmfb = md3d_step(
                        md3d_state, time_reverse(real_f), time_reverse(fake_f),
                        keys[6], alpha=_a(5))
                    mmf = {k2: (mmf[k2] + mmfb[k2]) / 2 for k2 in mmf}
                mm = {k2: (mm[k2] + mmf[k2]) / 2 for k2 in mm}
        metrics.update({f"3d_{k2}": v for k2, v in m.items()})
        if use_motion:
            metrics.update({f"motion_3d_{k2}": v for k2, v in mm.items()})

        # ---- random camera projection of the whole fake clip ----
        if cam_idx is None:
            cam_idx = jax.random.randint(keys[7], (), 0, n_cams)
        q = quats[cam_idx][None]
        t = trans[cam_idx][None]
        intr = jnp.broadcast_to(intrs[cam_idx][None], (B * F, 9))
        fake_cam3d = world_to_camera_batch(
            (fake_rel + fake_root).reshape((B * F, 16, 3)), q, t)
        fake_2d = project_to_2d(fake_cam3d, intr).reshape((B, F, 16, 2))
        fake_cam3d = fake_cam3d.reshape((B, F, 16, 3))

        # ---- 2D critics ----
        d2d_state, m2 = d2d_step(d2d_state, real_2d_clip.reshape((-1, 16, 2)),
                                 fake_2d.reshape((-1, 16, 2)), keys[8],
                                 alpha=_a(6))
        if use_motion:
            md2d_state, mm2 = md2d_step(md2d_state, real_2d_clip, fake_2d,
                                        keys[9], alpha=_a(7))
            if playback:
                md2d_state, mb2 = md2d_step(md2d_state, time_reverse(real_2d_clip),
                                            time_reverse(fake_2d), keys[10],
                                            alpha=_a(8))
                mm2 = {k2: (mm2[k2] + mb2[k2]) / 2 for k2 in mm2}
        if flip:
            real2_f = flip_pose(real_2d_clip)
            fake2_f = flip_pose(fake_2d)
            d2d_state, mf2 = d2d_step(d2d_state, real2_f.reshape((-1, 16, 2)),
                                      fake2_f.reshape((-1, 16, 2)), keys[11],
                                      alpha=_a(9))
            m2 = {k2: (m2[k2] + mf2[k2]) / 2 for k2 in m2}
            if use_motion:
                md2d_state, mmf2 = md2d_step(md2d_state, real2_f, fake2_f,
                                             keys[12], alpha=_a(10))
                if playback:
                    md2d_state, mmfb2 = md2d_step(
                        md2d_state, time_reverse(real2_f), time_reverse(fake2_f),
                        keys[13], alpha=_a(11))
                    mmf2 = {k2: (mmf2[k2] + mmfb2[k2]) / 2 for k2 in mmf2}
                mm2 = {k2: (mm2[k2] + mmf2[k2]) / 2 for k2 in mm2}
        metrics.update({f"2d_{k2}": v for k2, v in m2.items()})
        if use_motion:
            metrics.update({f"motion_2d_{k2}": v for k2, v in mm2.items()})

        return (d3d_state, d2d_state, md3d_state, md2d_state, cam_idx,
                bone_len[:, 0], fake_cam3d, fake_2d,
                intr.reshape((B, F, 9)), metrics)

    @functools.partial(jax.jit, static_argnames=("use_motion",))
    def generator_step(gen_state, d3d_params, d2d_params, md3d_params,
                       md2d_params, bone_len, cam_idx, key, use_motion: bool,
                       noise=None, scaler8=None):
        """Every-5th-iteration generator update (video_GAN_fun.py:422-558).
        ``noise``/``scaler8`` override the random draws (parity tests)."""
        q = quats[cam_idx][None]
        t = trans[cam_idx][None]
        B = bone_len.shape[0]
        intr = jnp.broadcast_to(intrs[cam_idx][None], (B * F, 9))

        def loss_fn(params):
            # custom_vjp FK: the video generator update runs the fused
            # kernel too (hand-derived backward, tests/test_fk_pallas.py)
            fake_world = synth_fake(params, bone_len, key,
                                    use_pallas=(hyper.use_pallas_fk and
                                                hyper.use_pallas_fk_grad),
                                    noise=noise, scaler8=scaler8)  # (B,F,16,3)
            fake_cam3d = world_to_camera_batch(
                fake_world.reshape((B * F, 16, 3)), q, t)
            fake_2d = project_to_2d(fake_cam3d, intr).reshape((B, F, 16, 2))
            fake_rel = fake_world - fake_world[:, :, :1]

            adv3d = jnp.mean(d3d_apply(d3d_params, fake_rel.reshape((-1, 16, 3))))
            adv2d = jnp.mean(d2d_apply(d2d_params, fake_2d.reshape((-1, 16, 2))))
            if use_motion:
                adv_m3d = jnp.mean(md3d_apply(md3d_params, fake_rel))
                adv_m2d = jnp.mean(md2d_apply(md2d_params, fake_2d))
                if playback:
                    adv_m3d = (adv_m3d + jnp.mean(md3d_apply(
                        md3d_params, time_reverse(fake_rel)))) / 2
                    adv_m2d = (adv_m2d + jnp.mean(md2d_apply(
                        md2d_params, time_reverse(fake_2d)))) / 2
            if flip:
                # flip branches detached (video_GAN_fun.py:493-499)
                f3 = jax.lax.stop_gradient(flip_pose(fake_rel))
                f2 = jax.lax.stop_gradient(flip_pose(fake_2d))
                adv3d = (adv3d + jnp.mean(d3d_apply(d3d_params,
                                                    f3.reshape((-1, 16, 3))))) / 2
                adv2d = (adv2d + jnp.mean(d2d_apply(d2d_params,
                                                    f2.reshape((-1, 16, 2))))) / 2
                if use_motion:
                    fm3 = jnp.mean(md3d_apply(md3d_params, f3))
                    fm2 = jnp.mean(md2d_apply(md2d_params, f2))
                    if playback:
                        fm3 = (fm3 + jnp.mean(md3d_apply(
                            md3d_params, time_reverse(f3)))) / 2
                        fm2 = (fm2 + jnp.mean(md2d_apply(
                            md2d_params, time_reverse(f2)))) / 2
                    adv_m3d = (adv_m3d + fm3) / 2
                    adv_m2d = (adv_m2d + fm2) / 2

            gen_score = hyper.w3d * adv3d + hyper.w2d * adv2d
            if use_motion:
                gen_score = gen_score + hyper.w3d_motion * adv_m3d + \
                    hyper.w2d_motion * adv_m2d
            return -gen_score

        loss, grads = jax.value_and_grad(loss_fn)(gen_state.params)
        updates, opt_state = gen_tx.update(grads, gen_state.opt_state,
                                           gen_state.params)
        params = jax.tree.map(lambda p, u: p + u, gen_state.params, updates)
        # G_cost = -gen_loss (video_GAN_fun.py:554); loss IS -gen_loss
        return (gen_state.replace(params=params, opt_state=opt_state),
                {"g_cost": loss})

    # donate the five net states on TPU (see gan/wgan.py epoch_step): callers
    # thread the returned states; CPU ignores donation, so gate on backend
    _donate = (0, 1, 2, 3, 4) if jax.default_backend() == "tpu" else ()

    @functools.partial(jax.jit, static_argnames=("use_motion",),
                       donate_argnums=_donate)
    def epoch_step(gen_state, d3d_state, d2d_state, md3d_state, md2d_state,
                   big3d, big2d, cams, start3d, start2d, cam_sel, iter0, key,
                   use_motion: bool):
        """A whole video-GAN epoch as ONE compiled program.  ``big3d/big2d``
        are the edge-padded sequence concatenations (device-resident, see
        data/chunked.py); ``start3d/start2d/cam_sel`` are (n_batches, B)
        window-start/camera-row matrices.  Clip windows are gathered on
        device inside the scan; critic updates run every iteration and the
        generator every 5th global iteration."""
        n_batches = start3d.shape[0]
        keys = jax.random.split(key, n_batches)
        win = jnp.arange(F)

        def body(carry, inp):
            gen_s, d3, d2, md3, md2, it = carry
            s3, s2, sc, k = inp
            clip3d = big3d[s3[:, None] + win[None]]
            clip2d = big2d[s2[:, None] + win[None]]
            cam16 = cams[sc]
            k_c, k_g = jax.random.split(k)
            (d3, d2, md3, md2, cam_idx, bone_len, fake_cam3d, fake_2d, intr,
             metrics) = critics_step(d3, d2, md3, md2, gen_s.params,
                                     clip3d, cam16, clip2d, k_c,
                                     use_motion=use_motion)
            def do_gen(gs):
                new_gs, gm = generator_step(gs, d3.params, d2.params,
                                            md3.params, md2.params, bone_len,
                                            cam_idx, k_g,
                                            use_motion=use_motion)
                return new_gs, gm["g_cost"]

            gen_s, g_cost = jax.lax.cond(
                it % 5 == 4, do_gen, lambda gs: (gs, jnp.nan), gen_s)
            # stacked per-iteration scalars, keyed by the reference's writer
            # names (video_GAN_fun.py writer_name= values)
            scalars = {"Fk_d3d_Wasserstein_D": metrics["3d_wasserstein"],
                       "Fk_d3d_D_real": metrics["3d_d_real"],
                       "Fk_d3d_D_fake": metrics["3d_d_fake"],
                       "d2d_Wasserstein_D": metrics["2d_wasserstein"],
                       "d2d_D_real": metrics["2d_d_real"],
                       "d2d_D_fake": metrics["2d_d_fake"],
                       "G_cost": g_cost}
            if use_motion:
                scalars["motion_Fk_d3d_Wasserstein_D"] = \
                    metrics["motion_3d_wasserstein"]
                scalars["motion_d2d_Wasserstein_D"] = \
                    metrics["motion_2d_wasserstein"]
            outs = (fake_cam3d, fake_2d, intr, scalars)
            return (gen_s, d3, d2, md3, md2, it + 1), outs

        (gen_state, d3d_state, d2d_state, md3d_state, md2d_state, _), outs = \
            jax.lax.scan(body,
                         (gen_state, d3d_state, d2d_state, md3d_state,
                          md2d_state, iter0),
                         (start3d, start2d, cam_sel, keys))
        return gen_state, d3d_state, d2d_state, md3d_state, md2d_state, outs

    return VideoSteps(critics_step=critics_step,
                      generator_step=generator_step,
                      epoch_step=epoch_step)


def run_video_gan_epoch(gan: VideoGanBundle, gan_loader, batch_size: int,
                        key, summary, use_motion: bool, writer=None,
                        mesh=None):
    """One pass over the GAN clip loader.  Returns (gan, fake clip arrays:
    (N, F, 16, 3) cam-space, (N, F, 16, 2), (N, F, 9)).

    When the loader is a full-window ChunkWindows, the whole epoch runs as
    one compiled scan program with on-device window gathering; otherwise a
    per-batch dispatch loop is used.  ``mesh`` (--data_parallel_devices)
    shards the per-iteration batch over 'data' on BOTH paths."""
    steps = gan.steps

    if getattr(gan_loader, "full_3d_window", False):
        return _run_video_gan_epoch_scan(gan, gan_loader, batch_size, key,
                                         summary, use_motion, writer,
                                         mesh=mesh)

    gen_state = gan.gen_state
    d3d_state, d2d_state = gan.d3d_state, gan.d2d_state
    md3d_state, md2d_state = gan.md3d_state, gan.md2d_state

    # Honour the data mesh on this path too (mesh_from_args guarantees the
    # user never silently gets one chip): states replicated once, each
    # per-batch clip sharded over 'data' below.
    if mesh is not None:
        from dhaug_tpu.parallel.mesh import (assert_model_sharded,
                                             place_state)
        gen_state, d3d_state, d2d_state, md3d_state, md2d_state = (
            place_state(mesh, s) for s in
            (gen_state, d3d_state, d2d_state, md3d_state, md2d_state))
        assert_model_sharded(mesh, gen_state, d3d_state, d2d_state,
                             md3d_state, md2d_state)

    # device-resident windows when the loader supports them (ChunkWindows)
    epoch_iter = gan_loader.device_epoch() if hasattr(gan_loader, "device_epoch") \
        else gan_loader.next_epoch()

    # reference writer names for the per-batch path, matching the scan
    # path's scalars (video_GAN_fun.py writer_name= values)
    tag_of = {"3d_wasserstein": "Fk_d3d_Wasserstein_D",
              "3d_d_real": "Fk_d3d_D_real", "3d_d_fake": "Fk_d3d_D_fake",
              "2d_wasserstein": "d2d_Wasserstein_D",
              "2d_d_real": "d2d_D_real", "2d_d_fake": "d2d_D_fake",
              "motion_3d_wasserstein": "motion_Fk_d3d_Wasserstein_D",
              "motion_2d_wasserstein": "motion_d2d_Wasserstein_D"}
    epoch_sums: dict = {}
    buf3d, buf2d, bufcam = [], [], []
    for cam16, clip3d, clip2d in epoch_iter:
        if clip3d.shape[0] < batch_size:
            continue
        key, k_c, k_g = jax.random.split(key, 3)
        clip3d_j = jnp.asarray(clip3d)
        cam16_j = jnp.asarray(cam16)
        clip2d_j = jnp.asarray(clip2d)
        if mesh is not None:
            from dhaug_tpu.parallel.mesh import shard_batch
            clip3d_j, cam16_j, clip2d_j = shard_batch(
                mesh, clip3d_j, cam16_j, clip2d_j)
        (d3d_state, d2d_state, md3d_state, md2d_state, cam_idx, bone_len,
         fake_cam3d, fake_2d, intr, metrics) = steps.critics_step(
            d3d_state, d2d_state, md3d_state, md2d_state, gen_state.params,
            clip3d_j, cam16_j, clip2d_j,
            k_c, use_motion=use_motion)
        summary.train_discrim_iter_num += 1

        if summary.train_iter_num % 5 == 4:
            gen_state, gm = steps.generator_step(
                gen_state, d3d_state.params, d2d_state.params,
                md3d_state.params, md2d_state.params, bone_len, cam_idx,
                k_g, use_motion=use_motion)
            summary.train_fakepose_iter_num += 1
            epoch_sums.setdefault("G_cost", []).append(float(gm["g_cost"]))
            if writer is not None:
                writer.add_scalar("train_G_iter_PoseFk/G_cost",
                                  float(gm["g_cost"]), summary.train_iter_num)

        for mkey, tag in tag_of.items():
            if mkey in metrics:
                epoch_sums.setdefault(tag, []).append(float(metrics[mkey]))
        # every iteration: the reference's critic add_scalar calls are
        # unconditional per update (model_fk_gan_train.py:225-230)
        if writer is not None:
            for mkey, tag in tag_of.items():
                if mkey in metrics:
                    writer.add_scalar(f"train_G_iter_PoseFk/{tag}",
                                      float(metrics[mkey]),
                                      summary.train_iter_num)

        # device-resident buffering; single host transfer at epoch end
        buf3d.append(fake_cam3d)
        buf2d.append(fake_2d)
        bufcam.append(intr)
        summary.train_iter_num += 1

    gan = gan._replace(gen_state=gen_state, d3d_state=d3d_state,
                       d2d_state=d2d_state, md3d_state=md3d_state,
                       md2d_state=md2d_state)
    if epoch_sums:
        summary.record_epoch_scalars(
            {k: float(np.mean(v)) for k, v in epoch_sums.items() if v})
    if not buf3d:
        return gan, None
    return gan, (np.asarray(jnp.concatenate(buf3d)),
                 np.asarray(jnp.concatenate(buf2d)),
                 np.asarray(jnp.concatenate(bufcam)))


def _run_video_gan_epoch_scan(gan: VideoGanBundle, loader, batch_size: int,
                              key, summary, use_motion: bool, writer=None,
                              mesh=None):
    """Single-dispatch video GAN epoch over a full-window ChunkWindows."""
    steps = gan.steps
    n_batches = loader.n_chunks // batch_size
    if n_batches == 0:
        return gan, None

    big3d = jnp.asarray(loader.big3d)
    big2d = jnp.asarray(loader.big2d)
    cams = jnp.asarray(loader.cams)
    order = loader.rng.permutation(loader.n_chunks)[: n_batches * batch_size]
    start3d = jnp.asarray(loader.start3d[order].reshape(n_batches, batch_size))
    start2d = jnp.asarray(loader.start2d[order].reshape(n_batches, batch_size))
    cam_sel = jnp.asarray(order.reshape(n_batches, batch_size))

    states_in = (gan.gen_state, gan.d3d_state, gan.d2d_state,
                 gan.md3d_state, gan.md2d_state)
    if mesh is not None:
        from dhaug_tpu.parallel.mesh import (assert_model_sharded,
                                             place_state, replicate,
                                             shard_index_rows)
        big3d, big2d, cams = (replicate(mesh, x) for x in (big3d, big2d, cams))
        start3d = shard_index_rows(mesh, start3d)
        start2d = shard_index_rows(mesh, start2d)
        cam_sel = shard_index_rows(mesh, cam_sel)
        states_in = tuple(place_state(mesh, s) for s in states_in)
        assert_model_sharded(mesh, *states_in)

    key, k_epoch = jax.random.split(key)
    (gen_state, d3d_state, d2d_state, md3d_state, md2d_state, outs) = \
        steps.epoch_step(*states_in,
                         big3d, big2d, cams, start3d, start2d, cam_sel,
                         jnp.asarray(summary.train_iter_num, jnp.int32),
                         k_epoch, use_motion=use_motion)
    fake3d, fake2d, intr, scalars = outs

    gen_steps = sum(1 for b in range(n_batches)
                    if (summary.train_iter_num + b) % 5 == 4)
    iter_base = summary.train_iter_num
    summary.train_discrim_iter_num += n_batches
    summary.train_fakepose_iter_num += gen_steps
    summary.train_iter_num += n_batches

    # ONE packed device->host transfer for the stacked scalars (per-leaf
    # np.asarray costs a ~30-40 ms tunnel round trip per key)
    from dhaug_tpu.utils.checkpoint import fetch_tree
    scalars = fetch_tree(scalars)
    # G_cost is NaN off the generator iterations; skip all-NaN columns
    summary.record_epoch_scalars(
        {k: float(np.nanmean(v)) for k, v in scalars.items()
         if np.isfinite(v).any()})
    if writer is not None:
        # same cadence as the per-batch fallback path: G_cost at every
        # generator iteration (the scalars are already host-side — one
        # packed fetch above), critic tags on the GLOBAL %50 step grid
        for tag, vals in scalars.items():
            if tag == "G_cost":
                for b in np.where(~np.isnan(vals))[0]:
                    writer.add_scalar("train_G_iter_PoseFk/G_cost",
                                      float(vals[b]), iter_base + int(b))
            else:
                # every iteration (the reference's critic add_scalar calls
                # are unconditional, model_fk_gan_train.py:225-230); vals is
                # already a host array from the packed fetch
                for b in range(n_batches):
                    writer.add_scalar(f"train_G_iter_PoseFk/{tag}",
                                      float(vals[b]), iter_base + b)

    gan = gan._replace(gen_state=gen_state, d3d_state=d3d_state,
                       d2d_state=d2d_state, md3d_state=md3d_state,
                       md2d_state=md2d_state)
    B = batch_size
    F = fake3d.shape[2]
    # fakes stay device-resident for the posenet phase
    return gan, (fake3d.reshape(n_batches * B, F, 16, 3),
                 fake2d.reshape(n_batches * B, F, 16, 2),
                 intr.reshape(n_batches * B, F, 9))
