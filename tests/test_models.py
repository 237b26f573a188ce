"""Tests for the flax model zoo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhaug_tpu.data.skeleton import Skeleton
from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                             Fk3DDiscriminator,
                                             MotionFk2DDiscriminator,
                                             MotionFk3DDiscriminator)
from dhaug_tpu.models.factory import (example_input, init_posenet,
                                      make_posenet, receptive_field)
from dhaug_tpu.models.generator import (GAN_RANGE_HI, GAN_RANGE_LO,
                                        FkGeneratorNet, GeneratorConfig,
                                        NONZERO_SLOTS, ZERO_SLOTS,
                                        head_to_angles, sample_scaler8,
                                        scale_bone_lengths, synthesize_poses)

KEY = jax.random.PRNGKey(0)

SKEL16 = Skeleton(parents=[-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14],
                  joints_left=[4, 5, 6, 10, 11, 12],
                  joints_right=[1, 2, 3, 13, 14, 15])


class TestFactory:
    @pytest.mark.parametrize("name,out_shape", [
        ("mlp", (3, 16, 3)),
        ("gcn", (3, 16, 3)),
        ("videopose", (3, 16, 3)),
        ("mulit_farme_videopose", (3, 1, 16, 3)),
        ("mulit_farme_poseformer", (3, 1, 16, 3)),
    ])
    def test_shapes(self, name, out_shape):
        model = make_posenet(name, skeleton=SKEL16, architecture="3,3")
        ex = example_input(name, batch=3, architecture="3,3")
        params, bstats = init_posenet(model, KEY, ex)
        variables = {"params": params}
        if bstats:
            variables["batch_stats"] = bstats
        out = model.apply(variables, ex, train=False)
        assert out.shape == out_shape

    def test_receptive_field(self):
        assert receptive_field("3,3") == 9
        assert receptive_field("3,3,3") == 27
        assert receptive_field("1,1,1,1,1") == 1

    def test_hip_padded_models_zero_hip(self):
        for name in ("mlp", "videopose"):
            model = make_posenet(name, skeleton=SKEL16)
            ex = jax.random.normal(KEY, (4, 16, 2))
            params, bstats = init_posenet(model, KEY, ex)
            out = model.apply({"params": params, "batch_stats": bstats},
                              ex, train=False)
            np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=0)

    def test_strided_dilated_twins_share_params_and_agree(self):
        """The strided training net and the dilated eval net must have the
        same parameter pytree and identical outputs on a full receptive
        field (model_pos_preparation.py:42-50)."""
        train_net = make_posenet("mulit_farme_videopose", architecture="3,3",
                                 flag="train")
        eval_net = make_posenet("mulit_farme_videopose", architecture="3,3",
                                flag="test")
        ex = jax.random.normal(KEY, (2, 9, 16, 2))
        p_train, bs = init_posenet(train_net, KEY, ex)
        out_train = train_net.apply({"params": p_train, "batch_stats": bs},
                                    ex, train=False)
        out_eval = eval_net.apply({"params": p_train, "batch_stats": bs},
                                  ex, train=False)
        np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_eval),
                                   atol=1e-5)

    def test_dilated_handles_long_sequences(self):
        eval_net = make_posenet("mulit_farme_videopose", architecture="3,3",
                                flag="test")
        ex = jnp.zeros((1, 9, 16, 2))
        p, bs = init_posenet(eval_net, KEY, ex)
        seq = jax.random.normal(KEY, (1, 9 + 40, 16, 2))
        out = eval_net.apply({"params": p, "batch_stats": bs}, seq, train=False)
        assert out.shape == (1, 41, 16, 3)


class TestGenerator:
    def test_zero_slots_stay_zero(self):
        head = jax.random.normal(KEY, (8, 35))
        angles37, root = head_to_angles(head, GeneratorConfig())
        np.testing.assert_allclose(
            np.asarray(angles37)[:, list(ZERO_SLOTS)], 0.0, atol=0)
        assert root.shape == (8, 3)
        assert np.all(np.abs(np.asarray(root)) <= 10.0)

    def test_angles_respect_gan_ranges(self):
        head = jax.random.normal(KEY, (64, 35)) * 5
        angles37, _ = head_to_angles(head, GeneratorConfig(use_pre_angle=True))
        a = np.asarray(angles37)
        assert np.all(a >= GAN_RANGE_LO - 1e-4)
        assert np.all(a <= GAN_RANGE_HI + 1e-4)

    def test_no_pre_angle_scales_180(self):
        head = jnp.ones((2, 35)) * 100  # tanh ~ 1
        angles37, _ = head_to_angles(head, GeneratorConfig(use_pre_angle=False))
        np.testing.assert_allclose(
            np.asarray(angles37)[:, NONZERO_SLOTS[0]], 180.0, atol=0.1)

    def test_use_global_rot_gate(self):
        head = jax.random.normal(KEY, (4, 35))
        angles37, _ = head_to_angles(head, GeneratorConfig(use_global_rot=False))
        np.testing.assert_allclose(np.asarray(angles37)[:, 34:], 0.0, atol=0)

    def test_bone_scaler_groups_mirrored_thorax_fixed(self):
        bl = jnp.ones((2, 15))
        scaler = jnp.full((2, 8), 0.1)
        out = np.asarray(scale_bone_lengths(bl, scaler))
        np.testing.assert_allclose(out[:, 7], 1.0, atol=0)  # thorax
        np.testing.assert_allclose(out[:, 0], 1.1, atol=1e-6)
        np.testing.assert_allclose(out[:, 1], out[:, 0], atol=0)  # mirrored pair

    def test_scaler_modes(self):
        diff = np.asarray(sample_scaler8(KEY, 16, "different"))
        same = np.asarray(sample_scaler8(KEY, 16, "same"))
        zero = np.asarray(sample_scaler8(KEY, 16, ""))
        assert np.all(np.abs(diff) <= 0.2)
        assert np.all(same == same[:, :1])
        assert np.all(zero == 0)
        with pytest.raises(ValueError):
            sample_scaler8(KEY, 4, "bogus")

    def test_synthesized_poses_have_requested_bone_lengths(self):
        from dhaug_tpu.ops.bones import bone_lengths_fk
        cfg = GeneratorConfig(dense_dim=64)
        net = FkGeneratorNet(cfg)
        params = net.init(KEY, jnp.zeros((4, 128)))["params"]
        head = net.apply({"params": params}, jax.random.normal(KEY, (4, 128)))
        bl = jnp.full((4, 15), 0.4)
        poses = synthesize_poses(head, bl, jnp.zeros((4, 8)), cfg)
        np.testing.assert_allclose(np.asarray(bone_lengths_fk(poses)),
                                   0.4, atol=1e-5)

    def test_video_generator_clip_shape(self):
        cfg = GeneratorConfig(dense_dim=64, video_frames=9)
        net = FkGeneratorNet(cfg)
        params = net.init(KEY, jnp.zeros((2, 128)))["params"]
        head = net.apply({"params": params}, jax.random.normal(KEY, (2, 128)))
        poses = synthesize_poses(head, jnp.full((2, 15), 0.4),
                                 jnp.zeros((2, 8)), cfg)
        assert poses.shape == (2, 9, 16, 3)
        # bone scaler shared across frames -> same bone lengths every frame
        from dhaug_tpu.ops.bones import bone_lengths_fk
        lens = np.asarray(bone_lengths_fk(poses))
        np.testing.assert_allclose(lens, np.broadcast_to(lens[:, :1], lens.shape),
                                   atol=1e-4)


class TestDiscriminators:
    def test_shapes_and_gradients(self):
        d3 = Fk3DDiscriminator(dense_dim=64)
        pose = jax.random.normal(KEY, (8, 16, 3))
        params = d3.init(KEY, pose)["params"]
        out = d3.apply({"params": params}, pose)
        assert out.shape == (8, 1)
        g = jax.grad(lambda p: d3.apply({"params": p}, pose).sum())(params)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(g))

    def test_2d_discriminator(self):
        d2 = Fk2DDiscriminator(dense_dim=64)
        pose = jax.random.normal(KEY, (8, 16, 2))
        params = d2.init(KEY, pose)["params"]
        assert d2.apply({"params": params}, pose).shape == (8, 1)

    @pytest.mark.parametrize("pos,diff,expected_branches", [
        (True, True, 4), (True, False, 3), (False, False, 2)])
    def test_motion_3d_branch_gating(self, pos, diff, expected_branches):
        md = MotionFk3DDiscriminator(video_frames=5, dense_dim=32,
                                     use_pos_branch=pos, use_diff_branch=diff)
        clip = jax.random.normal(KEY, (4, 5, 16, 3))
        params = md.init(KEY, clip)["params"]
        out = md.apply({"params": params}, clip)
        assert out.shape == (4, 1)
        # merge layer input width reveals the branch count
        merge_kernel = params["DensePrelude_0"]["Dense_0"]["kernel"]
        assert merge_kernel.shape[0] == expected_branches * 32

    def test_motion_2d(self):
        md = MotionFk2DDiscriminator(video_frames=5, dense_dim=32)
        clip = jax.random.normal(KEY, (4, 5, 16, 2))
        params = md.init(KEY, clip)["params"]
        assert md.apply({"params": params}, clip).shape == (4, 1)
