"""Tests for the training layer: posenet steps, schedules, checkpoints, data."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.data.loaders import PoseDataset, PoseTarget, fetch
from dhaug_tpu.models.factory import init_posenet, make_posenet
from dhaug_tpu.train.posenet import (evaluate, make_posenet_eval_step,
                                     make_posenet_train_step, root_relative,
                                     train_epoch)
from dhaug_tpu.train.state import (adam_gan, adam_posenet,
                                   current_learning_rate, lambda_lr,
                                   make_state, set_learning_rate, step_exp_lr)

KEY = jax.random.PRNGKey(0)


def _mlp_setup():
    model = make_posenet("mlp", stages=1)
    ex = jnp.zeros((4, 16, 2))
    params, bstats = init_posenet(model, KEY, ex)
    tx = adam_posenet(1e-3)
    state = make_state(tx, params, bstats)
    return model, tx, state


class TestPosenetStep:
    def test_loss_decreases_on_fixed_batch(self):
        model, tx, state = _mlp_setup()
        step = make_posenet_train_step(model, tx, "mse")
        x = jax.random.normal(KEY, (32, 16, 2))
        y = root_relative(jax.random.normal(KEY, (32, 16, 3)) * 0.3)
        losses = []
        for i in range(15):
            state, loss = step(state, x, y, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_batch_stats_update(self):
        model, tx, state = _mlp_setup()
        step = make_posenet_train_step(model, tx, "mse")
        before = jax.tree.leaves(state.batch_stats)[0].copy()
        x = jax.random.normal(KEY, (32, 16, 2))
        y = jnp.zeros((32, 16, 3))
        state, _ = step(state, x, y, KEY)
        after = jax.tree.leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_train_epoch_with_flip(self):
        model, tx, state = _mlp_setup()
        step = make_posenet_train_step(model, tx, "mse")
        batches = [(np.random.default_rng(0).normal(size=(8, 16, 2)).astype(np.float32),
                    np.random.default_rng(1).normal(size=(8, 16, 3)).astype(np.float32))]
        state, loss = train_epoch(step, state, iter(batches), KEY, flip=True)
        assert np.isfinite(loss)


class TestAllPosenetsTrain:
    def test_one_train_step_every_posenet(self):
        """Every zoo member must accept a train step (BN state, dropout rng,
        gradient flow) with its native input shape."""
        import pytest as _pytest

        from dhaug_tpu.data.skeleton import Skeleton
        from dhaug_tpu.models.factory import (example_input, init_posenet,
                                              make_posenet)
        skel = Skeleton(parents=[-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 8, 10, 11, 8, 13, 14],
                        joints_left=[4, 5, 6, 10, 11, 12],
                        joints_right=[1, 2, 3, 13, 14, 15])
        for name in ("mlp", "gcn", "videopose", "mulit_farme_videopose",
                     "mulit_farme_poseformer"):
            model = make_posenet(name, stages=1, architecture="3,3",
                                 skeleton=skel)
            ex = example_input(name, batch=4, architecture="3,3")
            params, bstats = init_posenet(model, KEY, ex)
            tx = adam_posenet(1e-3)
            state = make_state(tx, params, bstats)
            crit = "mse" if name in ("mlp", "gcn", "videopose") else "mpjpe"
            step = make_posenet_train_step(model, tx, crit)
            x = jax.random.normal(KEY, ex.shape)
            if name in ("mlp", "gcn", "videopose"):
                y = jax.random.normal(KEY, (4, 16, 3)) * 0.3
            else:
                y = jax.random.normal(KEY, (4, 1, 16, 3)) * 0.3
            new_state, loss = step(state, x, root_relative(y), KEY)
            assert np.isfinite(float(loss)), name
            before = jax.tree.leaves(state.params)[0]
            after = jax.tree.leaves(new_state.params)[0]
            assert not np.allclose(np.asarray(before), np.asarray(after)), name


class TestEvaluate:
    def test_perfect_predictor_scores_zero(self):
        model, tx, state = _mlp_setup()
        forward, flip_forward = make_posenet_eval_step(model)
        y = np.random.default_rng(0).normal(size=(10, 16, 3)).astype(np.float32)

        def perfect_forward(params, stats, x):
            return jnp.asarray(y)

        m = evaluate(perfect_forward, state.params, state.batch_stats,
                     [(np.zeros((10, 16, 2), np.float32), y)])
        assert m["p1"] < 1e-3
        assert m["pck"] == 100.0
        assert abs(m["auc"] - 100.0 * 30 / 31) < 0.2  # threshold 0 never hits

    def test_valid_count_masks_padding(self):
        model, tx, state = _mlp_setup()
        y = np.random.default_rng(0).normal(size=(8, 16, 3)).astype(np.float32)
        y_pad = np.concatenate([y, np.zeros((8, 16, 3), np.float32)])

        def fwd(params, stats, x):
            return jnp.asarray(y_pad)  # perfect on valid, wrong on padding

        tgt = np.concatenate([y, np.ones((8, 16, 3), np.float32)])
        m = evaluate(fwd, state.params, state.batch_stats,
                     [(np.zeros((16, 16, 2), np.float32), tgt, 8)])
        assert m["p1"] < 1e-3  # padding ignored

    def test_scan_eval_matches_batched_eval(self):
        """The single-dispatch scan evaluation must reproduce the per-batch
        evaluate() metrics exactly (both flip modes, non-multiple set size)."""
        from dhaug_tpu.train.posenet import evaluate_scan, make_eval_epoch_fn
        from dhaug_tpu.train.runners import eval_batches

        model, tx, state = _mlp_setup()
        forward, flip_forward = make_posenet_eval_step(model)
        rng = np.random.default_rng(1)
        N, B = 45, 16  # 2 full batches + padded remainder
        p2d = rng.normal(size=(N, 16, 2)).astype(np.float32) * 0.3
        p3d = rng.normal(size=(N, 16, 3)).astype(np.float32) * 0.3

        for flip in (False, True):
            ref = evaluate(forward, state.params, state.batch_stats,
                           eval_batches(p3d, p2d, B),
                           flip_forward=flip_forward if flip else None)
            ev = make_eval_epoch_fn(model, flip=flip)
            got = evaluate_scan(ev, state.params, state.batch_stats,
                                jnp.asarray(p2d), jnp.asarray(p3d), B)
            for k in ("p1", "p2", "pck", "auc"):
                np.testing.assert_allclose(got[k], ref[k], rtol=1e-5,
                                           atol=1e-4, err_msg=f"{k} flip={flip}")


class TestSchedules:
    def test_lambda_lr_matches_reference_rule(self):
        # lr_l = 1 - max(0, e - fix)/(nepoch - fix + 1)
        assert lambda_lr(1.0, 0, 50) == 1.0
        np.testing.assert_allclose(lambda_lr(1.0, 10, 50), 1 - 10 / 51)

    def test_step_exp_lr(self):
        np.testing.assert_allclose(step_exp_lr(1e-3, 100000, 100000, 0.96),
                                   1e-3 * 0.96)

    def test_set_learning_rate_roundtrip(self):
        _, tx, state = _mlp_setup()
        state = set_learning_rate(state, 5e-4)
        np.testing.assert_allclose(current_learning_rate(state), 5e-4)
        # and for the plain inject_hyperparams(adam) GAN optimizer (no
        # clip chain) too
        tx2 = adam_gan()
        from dhaug_tpu.models.discriminators import Fk2DDiscriminator
        d = Fk2DDiscriminator(dense_dim=16)
        p = d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
        s2 = make_state(tx2, p)
        s2 = set_learning_rate(s2, 1e-5)
        np.testing.assert_allclose(current_learning_rate(s2), 1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from dhaug_tpu.utils.checkpoint import load_ckpt, restore_into, save_ckpt
        model, tx, state = _mlp_setup()
        path = save_ckpt({"epoch": 3, "state_dict": state.params,
                          "batch_stats": state.batch_stats}, str(tmp_path))
        ckpt = load_ckpt(path)
        assert ckpt["epoch"] == 3
        restored = restore_into(state.params, ckpt["state_dict"])
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_orbax_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from dhaug_tpu.utils.checkpoint import (load_ckpt_orbax,
                                                save_ckpt_orbax)
        state = {"epoch": 3, "params": {"w": jnp.ones((4, 4))},
                 "np_rng": {"bit_generator": "PCG64",
                            "state": {"state": 12345}},
                 "note": "hello"}
        path = save_ckpt_orbax(state, str(tmp_path))
        back = load_ckpt_orbax(path)
        assert back["epoch"] == 3 and back["note"] == "hello"
        np.testing.assert_allclose(np.asarray(back["params"]["w"]), 1.0)
        assert back["np_rng"]["state"]["state"] == 12345

    def test_orbax_roundtrip_with_none_leaves(self, tmp_path):
        """A snapshot saved before the first eval carries dhpp1_best=None;
        None must ride the sidecar as a real leaf (the default flatten
        collapses it into an empty subtree, which load used to resurface
        as a keyless leaf -> KeyError on resume)."""
        import jax.numpy as jnp

        from dhaug_tpu.utils.checkpoint import (load_ckpt_orbax,
                                                save_ckpt_orbax)
        state = {"dhpp1_best": None, "s911p1_best": None, "epoch": 1,
                 "params": {"w": jnp.zeros((2,)), "b": None}}
        back = load_ckpt_orbax(save_ckpt_orbax(state, str(tmp_path)))
        assert back["dhpp1_best"] is None and back["s911p1_best"] is None
        assert back["params"]["b"] is None and back["epoch"] == 1
        np.testing.assert_allclose(np.asarray(back["params"]["w"]), 0.0)

    def test_restore_shape_mismatch_raises(self, tmp_path):
        import pytest
        from dhaug_tpu.utils.checkpoint import restore_into
        t = {"w": np.zeros((2, 3))}
        s = {"w": np.zeros((3, 2))}
        with pytest.raises(ValueError):
            restore_into(t, s)

    def test_restore_keypath_mismatch_raises(self):
        """A checkpoint from a DIFFERENT architecture whose flattened leaf
        count and shapes coincidentally match must raise, not graft silently
        (round-3 VERDICT weak #4)."""
        import pytest
        from dhaug_tpu.utils.checkpoint import restore_into
        t = {"encoder": {"w": np.zeros((2, 3)), "b": np.zeros((3,))}}
        s = {"decoder": {"w": np.zeros((2, 3)), "b": np.zeros((3,))}}
        with pytest.raises(ValueError, match="key-path mismatch"):
            restore_into(t, s)
        # same top key, different leaf names: also rejected
        s2 = {"encoder": {"kernel": np.zeros((2, 3)), "b": np.zeros((3,))}}
        with pytest.raises(ValueError, match="key-path mismatch"):
            restore_into(t, s2)
        # matching paths still restore (values flow through)
        good = {"encoder": {"w": np.ones((2, 3)), "b": np.ones((3,))}}
        out = restore_into(t, good)
        np.testing.assert_allclose(out["encoder"]["w"], 1.0)

    def test_resolve_posenet_weights_all_layouts(self):
        """The shared layout resolver behind run_evaluate.py AND
        run_baseline --pretrain must graft all three checkpoint layouts —
        'state_dict' (reference run_baseline.py:64), 'model_pos'
        (run_Fk_GAN.py:176,181), and the full-state 'pos_state' of
        --snapshot/--resume checkpoints — and reject anything else."""
        import pytest

        from dhaug_tpu.train.state import NetState
        from dhaug_tpu.utils.checkpoint import resolve_posenet_weights

        fresh = lambda: ({"w": np.zeros((2, 3))},
                         {"bn": {"mean": np.zeros((3,))}})
        saved_p = {"w": np.ones((2, 3))}
        saved_bs = {"bn": {"mean": np.full((3,), 2.0)}}

        for layout in ("state_dict", "model_pos"):
            p, bs = resolve_posenet_weights(
                {layout: saved_p, "batch_stats": saved_bs}, *fresh())
            np.testing.assert_allclose(p["w"], 1.0)
            np.testing.assert_allclose(bs["bn"]["mean"], 2.0)

        pos_state = NetState(params=saved_p, batch_stats=saved_bs,
                             opt_state=None)
        p, bs = resolve_posenet_weights({"pos_state": pos_state}, *fresh())
        np.testing.assert_allclose(p["w"], 1.0)
        np.testing.assert_allclose(bs["bn"]["mean"], 2.0)

        with pytest.raises(SystemExit, match="unsupported checkpoint"):
            resolve_posenet_weights({"something_else": saved_p}, *fresh())


class TestReskin:
    def test_reskin_dataset_sets_template_lengths(self):
        from dhaug_tpu.gan.single_frame import reskin_dataset
        from dhaug_tpu.ops.bones import bone_lengths, bone_vectors_tree
        rng = np.random.default_rng(0)
        n = 40
        poses = rng.normal(size=(n, 16, 3)).astype(np.float32)
        cams = np.tile(np.array([[2.29, 2.29, 0.02, 0.02, -0.2, 0.24, -0.003,
                                  -0.001, -0.001]], np.float32), (n, 1))
        # push poses in front of the camera so projection is finite
        poses[..., 2] += 5.0
        ds = PoseDataset(poses, np.zeros((n, 16, 2), np.float32), cams)
        templates = rng.uniform(0.2, 0.6, size=(7, 15)).astype(np.float32)
        out = reskin_dataset(ds, templates, np.random.default_rng(1))
        lens = np.asarray(bone_lengths(bone_vectors_tree(jnp.asarray(out.poses_3d))))
        # every frame's bone lengths must equal one of the templates
        for i in range(0, n, 7):
            dists = np.abs(templates - lens[i]).max(axis=1)
            assert dists.min() < 1e-4
        # 2D was re-projected
        assert np.isfinite(out.poses_2d).all()
        assert np.abs(out.poses_2d).max() > 0


class TestAugment:
    def test_flip_involution(self):
        from dhaug_tpu.ops.augment import flip_pose
        x = jax.random.normal(KEY, (4, 16, 3))
        np.testing.assert_allclose(np.asarray(flip_pose(flip_pose(x))),
                                   np.asarray(x), atol=0)

    def test_time_reverse(self):
        from dhaug_tpu.ops.augment import time_reverse
        x = jnp.arange(2 * 3 * 16 * 2, dtype=jnp.float32).reshape(2, 3, 16, 2)
        r = time_reverse(x)
        np.testing.assert_allclose(np.asarray(r[:, 0]), np.asarray(x[:, 2]))

    def test_flip_intrinsics(self):
        from dhaug_tpu.ops.augment import flip_intrinsics
        cam = jnp.arange(9, dtype=jnp.float32)[None] + 1.0
        out = np.asarray(flip_intrinsics(cam))
        # principal-point x (idx 2) and tangential x (idx 7) negate
        np.testing.assert_allclose(out[0, 2], -3.0)
        np.testing.assert_allclose(out[0, 7], -8.0)
        np.testing.assert_allclose(out[0, [0, 1, 3, 4, 5, 6, 8]],
                                   np.asarray(cam)[0, [0, 1, 3, 4, 5, 6, 8]])

    def test_flip_consistency_3d_projection(self):
        """Flipping a 3D pose and projecting with flipped intrinsics must
        equal flipping the projected 2D pose — the invariant behind the
        chunked generators' camera fixups (video_mode_operate.py:172-174)."""
        import jax

        from dhaug_tpu.gan.wgan import camera_bank
        from dhaug_tpu.ops.augment import flip_intrinsics, flip_pose
        from dhaug_tpu.ops.camera import project_to_2d
        quats, trans, intrs = camera_bank(["S1"])
        rng = np.random.default_rng(0)
        cam3d = jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32) * 0.3
                            + np.array([0, 0, 4.0], np.float32))
        intr = jnp.broadcast_to(intrs[0], (4, 9))
        a = flip_pose(project_to_2d(cam3d, intr))
        b = project_to_2d(flip_pose(cam3d), flip_intrinsics(intr))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
