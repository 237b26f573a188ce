"""WGAN-GP machinery for the FK-GAN: jitted critic and generator steps.

Rebuilds model_fk_gan_train.py's imperative loop as compiled JAX:

  * ``gradient_penalty`` — calc_gradient_penalty (Fk_discriminator.py:205-231)
    via ``jax.grad`` through the critic (double differentiation handled by
    XLA; no autograd.Variable plumbing).
  * ``make_critic_step`` — train_Fk_discriminator (model_fk_gan_train.py:177):
    one Adam update minimizing D(fake) - D(real) + GP.  The optional
    left/right-flip duplication is a second call of the same compiled step.
  * ``make_single_frame_steps`` — the per-iteration body of
    GAN_solutions_FK_generator (:236-510) split into two jitted programs:
    ``critics_step`` (fake synthesis + both critic updates + random-camera
    projection + fake buffering) and ``generator_step`` (every-5th-iteration
    update, :415-484).  Host code only loops and stages batches.

Faithful quirks:
  * The generator-step flip branches are *detached* in the reference
    (model_fk_gan_train.py:455-461: ``.detach().clone()``), so with flip
    enabled the flipped critic scores contribute to the reported loss but
    not to the gradient — i.e. the generator gradient is halved.  Replicated
    with ``stop_gradient``.
  * One random training camera per iteration projects the whole fake batch
    (:344-376).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.data import h36m
from dhaug_tpu.models.generator import (GeneratorConfig, sample_scaler8,
                                        synthesize_poses)
from dhaug_tpu.ops.augment import flip_pose
from dhaug_tpu.ops.bones import bone_lengths_fk
from dhaug_tpu.ops.camera import (camera_to_world_batch, project_to_2d,
                                  world_to_camera_batch)
from dhaug_tpu.train.state import NetState


class GanHyper(NamedTuple):
    lambda_gp: float = 10.0         # --GAN_LAMBDA
    w3d: float = 1.0                # --GAN_3d_loss_weight
    w2d: float = 0.2                # --GAN_2d_loss_weight
    w3d_motion: float = 1.0         # --GAN_3d_motion_loss_weight
    w2d_motion: float = 1.0         # --GAN_2d_motion_loss_weight
    flip: bool = True               # --flip_GAN_model_input
    bone_len_scaler: str = "different"
    noise_dim: int = 128
    # Route the critic-phase fake synthesis through the fused Pallas FK
    # kernel (2.3x the XLA lowering).  Legal there because critic fakes are
    # under stop_gradient (the generator loss keeps the differentiable XLA
    # path).  Under a GSPMD data mesh the kernel is shard_mapped over 'data'
    # (pass mesh to make_single_frame_steps); pallas_interpret runs it in
    # interpreter mode for CPU test meshes / the multi-chip dryrun.
    use_pallas_fk: bool = False
    # Run the GENERATOR update's FK on the fused kernel too (custom_vjp with
    # the hand-derived backward kernel, ops/fk_pallas.py).  Separate toggle
    # so the stop-gradient critic-fake path and the gradient path can be
    # A/B'd independently (scripts/bench_fk_grad_ab.py); only consulted when
    # use_pallas_fk is on.
    use_pallas_fk_grad: bool = True
    pallas_interpret: bool = False


def camera_bank(train_subjects) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stack every (subject, cam) pair's extrinsics + normalized intrinsics
    into arrays for in-jit random camera selection.
    Returns (quats (N,4), trans (N,3) metres, intrinsics (N,9))."""
    quats, trans, intrs = [], [], []
    for subject in train_subjects:
        for cam_idx in range(4):
            cam = h36m.normalized_camera(subject, cam_idx)
            quats.append(cam["orientation"])
            trans.append(cam["translation"])
            intrs.append(cam["intrinsic"])
    return (jnp.asarray(np.stack(quats), jnp.float32),
            jnp.asarray(np.stack(trans), jnp.float32),
            jnp.asarray(np.stack(intrs), jnp.float32))


def tiled_cam16(intr, quat, trans, n: int) -> jnp.ndarray:
    """(n, 16) camera records — intrinsic(9) | quat(4) | t(3), one camera
    tiled n times: the ``cam_param16`` layout critics_step expects.  Used by
    the benchmarks/dryrun/tests that stage a fixed-camera batch."""
    rec = np.concatenate([np.asarray(intr), np.asarray(quat),
                          np.asarray(trans)]).astype(np.float32)
    return jnp.asarray(np.broadcast_to(rec[None], (n, 16)))


def discriminator_accuracy(prediction, label) -> float:
    """Fraction of critic outputs within 0.5 of the label — the reference's
    tensorboard accuracy probe (utils/gan_utils.py:141-155)."""
    rlt = np.abs(np.asarray(prediction) - np.asarray(label))
    return float(np.mean(rlt <= 0.5))


def gradient_penalty(critic_apply, params, real, fake, key, lambda_gp):
    """Standard WGAN-GP on uniform interpolates, flattened per sample."""
    B = real.shape[0]
    r = real.reshape((B, -1))
    f = fake.reshape((B, -1))
    alpha = jax.random.uniform(key, (B, 1), dtype=r.dtype)
    interp = alpha * r + (1.0 - alpha) * f

    def critic_sum(x):
        return jnp.sum(critic_apply(params, x.reshape(real.shape)))

    grads = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2) * lambda_gp


def make_critic_step(critic_apply, tx, lambda_gp: float,
                     gp_granularity: int = 1):
    """One compiled critic Adam update.  Returns (state, metrics) with the
    reference's logged quantities (D_real, D_fake, Wasserstein, D_cost).

    The real batch, fake batch, and GP interpolates go through the critic as
    ONE stacked (3B, ...) forward, and the GP's input gradient comes from a
    single vjp over that stacked pass (cotangent zero on the real/fake
    slices) — same math as three separate passes (the naive composition is
    asserted equal in tests/test_gan.py), but each matmul is 3x taller and
    the op count is ~3x lower, which matters on this overhead-bound path
    (the matmuls themselves are microseconds at these shapes).

    ``gp_granularity`` splits each leading-dim sample into that many GP rows:
    the interpolation alpha is drawn per row and the gradient norm is taken
    per row (calc_gradient_penalty views data as (BATCH_SIZE, -1),
    Fk_discriminator.py:207).  The video epoch passes video_frames for the
    motion-2D critic, whose reference update is called WITHOUT
    dis_mode='motion' (video_GAN_fun.py:341,355,393) and therefore
    interpolates and norms per FRAME of the clip, unlike the motion-3D
    critic (dis_mode='motion' -> per clip)."""

    @jax.jit
    def step(state: NetState, real, fake, key, alpha=None):
        # ``alpha`` (B*gp_granularity, 1) overrides the GP interpolation draw
        # — used by the update-level reference-parity tests to inject the
        # reference's torch.rand (Fk_discriminator.py:211); production None.
        B = real.shape[0]
        Bg = B * gp_granularity

        def loss_fn(params):
            r = real.reshape((Bg, -1))
            f = fake.reshape((Bg, -1))
            a = (jax.random.uniform(key, (Bg, 1), dtype=r.dtype)
                 if alpha is None else alpha)
            interp = a * r + (1.0 - a) * f
            stacked = jnp.concatenate([r, f, interp]).reshape(
                (3 * B,) + real.shape[1:])

            scores, vjp = jax.vjp(lambda x: critic_apply(params, x), stacked)
            d_real = jnp.mean(scores[:B])
            d_fake = jnp.mean(scores[B:2 * B])
            # GP input-gradient: cotangent selects only the interp slice
            cot = jnp.zeros_like(scores).at[2 * B:].set(1.0)
            (g_stacked,) = vjp(cot)
            g = g_stacked.reshape((3 * Bg, -1))[2 * Bg:]
            norms = jnp.sqrt(jnp.sum(g ** 2, axis=1) + 1e-12)
            gp = jnp.mean((norms - 1.0) ** 2) * lambda_gp

            loss = d_fake - d_real + gp
            return loss, (d_real, d_fake, gp)

        (loss, (d_real, d_fake, gp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = {"d_real": d_real, "d_fake": d_fake, "gp": gp,
                   "d_cost": loss, "wasserstein": d_real - d_fake}
        return state.replace(params=params, opt_state=opt_state), metrics

    return step


class SingleFrameSteps(NamedTuple):
    critics_step: callable
    generator_step: callable
    epoch_step: callable


def make_single_frame_steps(gen_apply, d3d_apply, d2d_apply,
                            d3d_tx, d2d_tx, gen_tx,
                            gen_cfg: GeneratorConfig, hyper: GanHyper,
                            cam_quats, cam_trans, cam_intrs, mesh=None):
    """Build the two compiled programs of the single-frame GAN epoch.

    ``mesh`` (the --data_parallel_devices mesh) lets the Pallas critic-phase
    synthesis run shard_mapped over 'data' — without it the fused FK kernel
    would silently be unavailable in multi-chip training."""
    d3d_step = make_critic_step(d3d_apply, d3d_tx, hyper.lambda_gp)
    d2d_step = make_critic_step(d2d_apply, d2d_tx, hyper.lambda_gp)
    n_cams = cam_quats.shape[0]

    @functools.partial(jax.jit, static_argnames=("use_pallas",))
    def synth_fake(gen_params, bone_len, key, use_pallas: bool = False,
                   noise=None, scaler8=None):
        """noise -> fake world pose (B, 16, 3) + scaler sampling.  ``noise``
        / ``scaler8`` override the random draws (reference-parity tests)."""
        B = bone_len.shape[0]
        k_noise, k_scaler = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_noise, (B, hyper.noise_dim))
        head = gen_apply(gen_params, noise)
        if scaler8 is None:
            scaler8 = sample_scaler8(k_scaler, B, hyper.bone_len_scaler)
        return synthesize_poses(head, bone_len, scaler8, gen_cfg,
                                use_pallas=use_pallas, mesh=mesh,
                                interpret=hyper.pallas_interpret)

    def critics_step(d3d_state, d2d_state, gen_params,
                     real_3d_cam, cam_param16, target_2d, key, **overrides):
        """One GAN iteration's critic phase.  real_3d_cam (B, 16, 3) in
        camera space, cam_param16 (B, 16) = intrinsic(9) + quat(4) + t(3).
        Returns new critic states, the iteration's random camera index,
        harvested bone lengths, the fake buffers, and metrics.

        ``overrides`` (parity tests only; production passes none): ``noise``
        / ``scaler8`` for the fake synthesis, ``cam_idx`` for the projection
        camera, ``alphas`` — a 4-tuple of GP interpolation draws in the
        reference's update order (d3d, d3d-flip, d2d, d2d-flip;
        model_fk_gan_train.py:314,333,382,401)."""
        return _critics_step(d3d_state, d2d_state, gen_params,
                             real_3d_cam, cam_param16, target_2d, key,
                             **overrides)

    @jax.jit
    def _critics_step(d3d_state, d2d_state, gen_params,
                      real_3d_cam, cam_param16, target_2d, key,
                      noise=None, scaler8=None, cam_idx=None, alphas=None):
        k_fake, k_cam, k_d3a, k_d3b, k_d2a, k_d2b = jax.random.split(key, 6)
        _a = (lambda i: None) if alphas is None else (lambda i: alphas[i])

        # Harvest bone lengths from the real batch (Fk_generator.py:107-111).
        bone_len = bone_lengths_fk(real_3d_cam)

        # Real pose to root-relative world space (model_fk_gan_train.py:289-295).
        real_world = camera_to_world_batch(
            real_3d_cam, cam_param16[:, 9:13], cam_param16[:, 13:16])
        real_rel = real_world - real_world[:, :1]

        # Fake synthesis (generator frozen in this phase; no gradient needed,
        # so the fused Pallas FK kernel is legal here when enabled).
        fake_world = jax.lax.stop_gradient(
            synth_fake(gen_params, bone_len, k_fake,
                       use_pallas=hyper.use_pallas_fk,
                       noise=noise, scaler8=scaler8))
        fake_root = fake_world[:, :1]
        fake_rel = fake_world - fake_root

        d3d_state, m3 = d3d_step(d3d_state, real_rel, fake_rel, k_d3a,
                                 alpha=_a(0))
        if hyper.flip:
            d3d_state, m3f = d3d_step(d3d_state, flip_pose(real_rel),
                                      flip_pose(fake_rel), k_d3b, alpha=_a(1))
            m3 = {k: (m3[k] + m3f[k]) / 2 for k in m3}

        # One random training camera projects the whole fake batch.
        if cam_idx is None:
            cam_idx = jax.random.randint(k_cam, (), 0, n_cams)
        q = cam_quats[cam_idx][None]
        t = cam_trans[cam_idx][None]
        intr = jnp.broadcast_to(cam_intrs[cam_idx][None],
                                (real_3d_cam.shape[0], 9))
        fake_cam3d = world_to_camera_batch(fake_rel + fake_root, q, t)
        fake_2d = project_to_2d(fake_cam3d, intr)

        d2d_state, m2 = d2d_step(d2d_state, target_2d, fake_2d, k_d2a,
                                 alpha=_a(2))
        if hyper.flip:
            d2d_state, m2f = d2d_step(d2d_state, flip_pose(target_2d),
                                      flip_pose(fake_2d), k_d2b, alpha=_a(3))
            m2 = {k: (m2[k] + m2f[k]) / 2 for k in m2}

        metrics = {**{f"3d_{k}": v for k, v in m3.items()},
                   **{f"2d_{k}": v for k, v in m2.items()}}
        return (d3d_state, d2d_state, cam_idx, bone_len,
                fake_cam3d, fake_2d, intr, metrics)

    @jax.jit
    def generator_step(gen_state: NetState, d3d_params, d2d_params,
                       bone_len, cam_idx, key, noise=None, scaler8=None):
        """Every-5th-iteration generator update (model_fk_gan_train.py:415-484).
        ``noise``/``scaler8`` override the random draws (parity tests)."""
        q = cam_quats[cam_idx][None]
        t = cam_trans[cam_idx][None]
        intr = jnp.broadcast_to(cam_intrs[cam_idx][None],
                                (bone_len.shape[0], 9))

        def loss_fn(params):
            # the fused FK now carries a custom_vjp (hand-derived backward
            # kernel), so the GENERATOR update runs it too — previously only
            # the stop-gradient critic fakes could
            fake_world = synth_fake(params, bone_len, key,
                                    use_pallas=(hyper.use_pallas_fk and
                                                hyper.use_pallas_fk_grad),
                                    noise=noise, scaler8=scaler8)
            fake_cam3d = world_to_camera_batch(fake_world, q, t)
            fake_2d = project_to_2d(fake_cam3d, intr)
            fake_rel = fake_world - fake_world[:, :1]
            adv3d = jnp.mean(d3d_apply(d3d_params, fake_rel))
            adv2d = jnp.mean(d2d_apply(d2d_params, fake_2d))
            if hyper.flip:
                # Reference detaches the flipped branches (:455-461): they
                # halve the gradient but add only a constant to the loss.
                adv3d_f = jnp.mean(d3d_apply(
                    d3d_params, jax.lax.stop_gradient(flip_pose(fake_rel))))
                adv2d_f = jnp.mean(d2d_apply(
                    d2d_params, jax.lax.stop_gradient(flip_pose(fake_2d))))
                adv3d = (adv3d + adv3d_f) / 2
                adv2d = (adv2d + adv2d_f) / 2
            gen_score = hyper.w3d * adv3d + hyper.w2d * adv2d
            return -gen_score  # maximize the critic scores of fakes

        loss, grads = jax.value_and_grad(loss_fn)(gen_state.params)
        updates, opt_state = gen_tx.update(grads, gen_state.opt_state,
                                           gen_state.params)
        params = jax.tree.map(lambda p, u: p + u, gen_state.params, updates)
        # the reference's logged quantity is G_cost = -gen_loss
        # (model_fk_gan_train.py:481); loss here IS -gen_score = -gen_loss
        return (gen_state.replace(params=params, opt_state=opt_state),
                {"g_cost": loss})

    # Donate the three net states on TPU: without donation XLA must copy
    # every params + Adam-moments buffer into the scan carry at each epoch
    # dispatch (and cannot alias the outputs back), costing HBM bandwidth on
    # this overhead-bound path.  Callers thread the returned states and never
    # reuse the inputs.  CPU ignores donation (and warns), so gate on backend.
    _donate = (0, 1, 2) if jax.default_backend() == "tpu" else ()

    @functools.partial(jax.jit, donate_argnums=_donate)
    def epoch_step(gen_state, d3d_state, d2d_state,
                   dev_3d, dev_cam, dev_t2d, idx_real, idx_t2d, iter0, key):
        """A whole GAN epoch as ONE compiled program: lax.scan over the
        batches, critic updates every iteration, generator update every 5th
        (via lax.cond on the global iteration counter).  Inputs are the
        device-resident epoch arrays plus (n_batches, B) index matrices;
        outputs are the stacked fake buffers and per-iteration metrics.

        One dispatch replaces hundreds — through this environment's TPU
        tunnel each dispatch costs tens of ms of host time, which made the
        per-step loop ~50x slower than the device could run.
        """
        n_batches = idx_real.shape[0]
        keys = jax.random.split(key, n_batches)

        def body(carry, inp):
            gen_s, d3_s, d2_s, it = carry
            sel_r, sel_t, k = inp
            k_c, k_g = jax.random.split(k)
            (d3_s, d2_s, cam_idx, bone_len, fake_cam3d, fake_2d, intr,
             metrics) = _critics_step(d3_s, d2_s, gen_s.params,
                                      dev_3d[sel_r], dev_cam[sel_r],
                                      dev_t2d[sel_t], k_c)
            def do_gen(gs):
                new_gs, gm = generator_step(gs, d3_s.params, d2_s.params,
                                            bone_len, cam_idx, k_g)
                return new_gs, gm["g_cost"]

            gen_s, g_cost = jax.lax.cond(
                it % 5 == 4, do_gen,
                lambda gs: (gs, jnp.nan),  # no generator update this iteration
                gen_s)
            scalars = {k: metrics[k] for k in
                       ("3d_d_real", "3d_d_fake", "3d_wasserstein", "3d_d_cost",
                        "2d_d_real", "2d_d_fake", "2d_wasserstein", "2d_d_cost")}
            scalars["g_cost"] = g_cost
            outs = (fake_cam3d, fake_2d, intr, scalars)
            return (gen_s, d3_s, d2_s, it + 1), outs

        (gen_state, d3d_state, d2d_state, _), outs = jax.lax.scan(
            body, (gen_state, d3d_state, d2d_state, iter0),
            (idx_real, idx_t2d, keys))
        return gen_state, d3d_state, d2d_state, outs

    return SingleFrameSteps(critics_step=critics_step,
                            generator_step=generator_step,
                            epoch_step=epoch_step)
