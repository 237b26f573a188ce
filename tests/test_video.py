"""Tests for video-mode components: chunk samplers, clip GAN, video eval."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhaug_tpu.data.chunked import (ChunkWindows, UnchunkedSequences,
                                    split_mpi3d_sequences)

KEY = jax.random.PRNGKey(0)


def _sequences(rng, lengths=(30, 17, 44)):
    seq3d = [rng.normal(size=(n, 16, 3)).astype(np.float32) for n in lengths]
    seq2d = [rng.normal(size=(n, 16, 2)).astype(np.float32) for n in lengths]
    cams = [rng.normal(size=(16,)).astype(np.float32) for _ in lengths]
    return seq3d, seq2d, cams


class TestChunkWindows:
    def test_window_content_matches_manual_pad(self):
        rng = np.random.default_rng(0)
        seq3d, seq2d, cams = _sequences(rng, lengths=(12,))
        pad = 4
        cw = ChunkWindows(batch_size=4, cams=cams, poses_3d=seq3d,
                          poses_2d=seq2d, pad=pad, shuffle=False)
        manual2d = np.pad(seq2d[0], ((pad, pad), (0, 0), (0, 0)), "edge")
        batches = list(cw.next_epoch())
        # first batch = centres 0..3
        cam, w3d, w2d = batches[0]
        for i in range(4):
            np.testing.assert_allclose(w2d[i], manual2d[i:i + 2 * pad + 1])
            np.testing.assert_allclose(w3d[i, 0], seq3d[0][i])
            np.testing.assert_allclose(cam[i], cams[0])

    def test_full_3d_window_mode(self):
        rng = np.random.default_rng(1)
        seq3d, seq2d, cams = _sequences(rng, lengths=(10,))
        pad = 2
        cw = ChunkWindows(batch_size=5, cams=cams, poses_3d=seq3d,
                          poses_2d=seq2d, pad=pad, full_3d_window=True,
                          shuffle=False)
        _, w3d, w2d = next(cw.next_epoch())
        assert w3d.shape == (5, 5, 16, 3)
        assert w2d.shape == (5, 5, 16, 2)
        manual3d = np.pad(seq3d[0], ((pad, pad), (0, 0), (0, 0)), "edge")
        np.testing.assert_allclose(w3d[0], manual3d[0:5])

    def test_covers_every_frame_once(self):
        rng = np.random.default_rng(2)
        seq3d, seq2d, cams = _sequences(rng)
        cw = ChunkWindows(batch_size=7, cams=cams, poses_3d=seq3d,
                          poses_2d=seq2d, pad=1, shuffle=True,
                          drop_last=False)
        seen = []
        for _, w3d, _ in cw.next_epoch():
            seen.append(w3d[:, 0])
        seen = np.concatenate(seen)
        assert seen.shape[0] == sum(s.shape[0] for s in seq3d)
        # every centre frame appears exactly once
        all_frames = np.concatenate(seq3d)
        order = np.lexsort(seen.reshape(seen.shape[0], -1).T)
        order_ref = np.lexsort(all_frames.reshape(all_frames.shape[0], -1).T)
        np.testing.assert_allclose(seen[order], all_frames[order_ref])

    def test_sequence_boundaries_not_crossed(self):
        """A window centred at the edge of one sequence must be edge-padded,
        never leak frames of the neighbouring sequence."""
        seq3d = [np.full((5, 16, 3), float(i)) for i in range(2)]
        seq2d = [np.full((5, 16, 2), float(i)) for i in range(2)]
        cw = ChunkWindows(batch_size=10, cams=None, poses_3d=seq3d,
                          poses_2d=seq2d, pad=3, shuffle=False,
                          drop_last=False)
        _, _, w2d = next(cw.next_epoch())
        # windows of sequence 0 contain only value 0; sequence 1 only 1
        assert np.all(w2d[:5] == 0.0)
        assert np.all(w2d[5:] == 1.0)

    def test_device_epoch_matches_host_epoch(self):
        rng = np.random.default_rng(5)
        seq3d, seq2d, cams = _sequences(rng, lengths=(12, 9))
        kw = dict(batch_size=4, cams=cams, poses_3d=seq3d, poses_2d=seq2d,
                  pad=2, full_3d_window=True, shuffle=True, random_seed=7)
        host = list(ChunkWindows(**kw).next_epoch())
        dev = list(ChunkWindows(**kw).device_epoch())
        assert len(host) == len(dev)
        for (hc, h3, h2), (dc, d3, d2) in zip(host, dev):
            np.testing.assert_allclose(np.asarray(d2), h2, atol=1e-6)
            np.testing.assert_allclose(np.asarray(d3), h3, atol=1e-6)
            np.testing.assert_allclose(np.asarray(dc), hc, atol=1e-6)

    def test_num_batches(self):
        rng = np.random.default_rng(3)
        seq3d, seq2d, cams = _sequences(rng, lengths=(33,))
        cw = ChunkWindows(batch_size=8, cams=cams, poses_3d=seq3d,
                          poses_2d=seq2d, pad=1)
        assert cw.num_batches == 4  # 33 // 8 with drop_last


class TestUnchunked:
    def test_whole_sequence_padding(self):
        rng = np.random.default_rng(4)
        seq3d, seq2d, cams = _sequences(rng, lengths=(20,))
        us = UnchunkedSequences(cams, seq3d, seq2d, pad=4)
        cam, s3, s2 = next(us.next_epoch())
        assert s3.shape == (1, 20, 16, 3)
        assert s2.shape == (1, 28, 16, 2)
        np.testing.assert_allclose(s2[0, 0], seq2d[0][0])   # edge pad
        np.testing.assert_allclose(s2[0, 4], seq2d[0][0])

    def test_mpi3d_split(self):
        pose3d = np.arange(2929)[:, None, None] * np.ones((1, 16, 3))
        pose2d = np.zeros((2929, 16, 2))
        s3, s2 = split_mpi3d_sequences(pose3d, pose2d)
        assert [s.shape[0] for s in s3] == [603, 540, 505, 553, 276, 452]
        assert sum(s.shape[0] for s in s3) == 2929

    def test_mpi3d_split_rejects_wrong_frame_count(self):
        """The hardcoded 6-sequence boundaries assume the reference's
        2929-frame export; a different test_3dhp.npz must fail loudly at
        data-prep time, not mis-split or crash at first eval."""
        pose3d = np.zeros((2400, 16, 3))
        with pytest.raises(ValueError, match="2929"):
            split_mpi3d_sequences(pose3d, np.zeros((2400, 16, 2)))


class TestVideoGan:
    def _args(self):
        from dhaug_tpu.train.config import parse_aug_args
        return parse_aug_args([
            "--batch_size", "8", "--Gen_DenseDim", "48",
            "--Dis_DenseDim_3D", "48", "--Dis_DenseDim_2D", "48",
            "--video_Dis_DenseDim_3D", "48", "--video_Dis_DenseDim_2D", "48",
            "--architecture", "3,3", "--single_or_multi_train_mode", "multi"])

    def test_video_critics_and_generator_step(self):
        from dhaug_tpu.gan.video import build_video_gan
        args = self._args()
        gan = build_video_gan(args, ["S1"], video_frames=9, key=KEY)
        B, F = 8, 9
        rng = np.random.default_rng(0)
        clip3d = jnp.asarray(rng.normal(size=(B, F, 16, 3)).astype(np.float32) * 0.3)
        from dhaug_tpu.gan.wgan import camera_bank
        quats, trans, intrs = camera_bank(["S1"])
        cam16 = jnp.concatenate([
            jnp.broadcast_to(intrs[0], (B, 9)),
            jnp.broadcast_to(quats[0], (B, 4)),
            jnp.broadcast_to(trans[0], (B, 3))], axis=1)
        clip2d = jnp.asarray(rng.normal(size=(B, F, 16, 2)).astype(np.float32) * 0.3)

        out = gan.steps.critics_step(
            gan.d3d_state, gan.d2d_state, gan.md3d_state, gan.md2d_state,
            gan.gen_state.params, clip3d, cam16, clip2d, KEY, use_motion=True)
        (d3d_s, d2d_s, md3d_s, md2d_s, cam_idx, bone_len, fake3d, fake2d,
         intr, metrics) = out
        assert fake3d.shape == (B, F, 16, 3)
        assert fake2d.shape == (B, F, 16, 2)
        for tag in ("3d_wasserstein", "2d_wasserstein", "motion_3d_wasserstein",
                    "motion_2d_wasserstein"):
            assert np.isfinite(float(metrics[tag])), tag

        gen_state, gm = gan.steps.generator_step(
            gan.gen_state, d3d_s.params, d2d_s.params, md3d_s.params,
            md2d_s.params, bone_len, cam_idx, KEY, use_motion=True)
        assert np.isfinite(float(gm["g_cost"]))

    def test_warmup_skips_motion_critics(self):
        from dhaug_tpu.gan.video import build_video_gan
        args = self._args()
        gan = build_video_gan(args, ["S1"], video_frames=9, key=KEY)
        B, F = 8, 9
        rng = np.random.default_rng(1)
        clip3d = jnp.asarray(rng.normal(size=(B, F, 16, 3)).astype(np.float32) * 0.3)
        from dhaug_tpu.gan.wgan import camera_bank
        quats, trans, intrs = camera_bank(["S1"])
        cam16 = jnp.concatenate([
            jnp.broadcast_to(intrs[0], (B, 9)),
            jnp.broadcast_to(quats[0], (B, 4)),
            jnp.broadcast_to(trans[0], (B, 3))], axis=1)
        clip2d = jnp.asarray(rng.normal(size=(B, F, 16, 2)).astype(np.float32) * 0.3)
        out = gan.steps.critics_step(
            gan.d3d_state, gan.d2d_state, gan.md3d_state, gan.md2d_state,
            gan.gen_state.params, clip3d, cam16, clip2d, KEY, use_motion=False)
        metrics = out[-1]
        assert "motion_3d_wasserstein" not in metrics
        # motion critic params untouched
        md3d_after = out[2]
        for a, b in zip(jax.tree.leaves(md3d_after.params),
                        jax.tree.leaves(gan.md3d_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestVideoReskinUpdate:
    def test_matches_per_sequence_reference(self):
        """The flattened single-dispatch re-skin must equal the per-sequence
        composition of reskin_pose + project_to_2d (the shape of the
        reference's video_mode_random_bl_aug, video_mode_operate.py:879-928),
        with the same template draw per sequence."""
        from types import SimpleNamespace

        from dhaug_tpu.ops.bones import reskin_pose
        from dhaug_tpu.ops.camera import project_to_2d
        from dhaug_tpu.train.video_runner import video_reskin_update

        rng = np.random.default_rng(7)
        seq3d, _, cams = _sequences(rng, lengths=(23, 9, 31))
        seq3d = [s * 0.2 for s in seq3d]
        for c in cams:
            c[:9] = np.abs(c[:9]) + 0.5     # plausible intrinsics
        templates = (0.8 + 0.4 * rng.random((5, 15))).astype(np.float32)
        bundle = SimpleNamespace(poses_train=seq3d, cams_train=cams)
        args = SimpleNamespace(batch_size=8, architecture="3,3")

        loader = video_reskin_update(args, bundle, templates,
                                     np.random.default_rng(123))

        # reference composition with the identical draw order
        rng2 = np.random.default_rng(123)
        ref3d, ref2d = [], []
        for s3, cam in zip(seq3d, cams):
            tmpl = templates[rng2.integers(0, templates.shape[0])]
            p3 = np.asarray(reskin_pose(jnp.asarray(s3),
                                        jnp.asarray(tmpl)[None]))
            p2 = np.asarray(project_to_2d(
                jnp.asarray(p3),
                jnp.broadcast_to(jnp.asarray(cam[:9][None]),
                                 (p3.shape[0], 9))))
            ref3d.append(p3)
            ref2d.append(p2)
        ref = ChunkWindows(args.batch_size, cams, ref3d, ref2d, pad=4,
                           full_3d_window=True, shuffle=True,
                           random_seed=int(rng2.integers(0, 2 ** 31)))

        np.testing.assert_allclose(loader.big3d, ref.big3d, atol=1e-6)
        # the fused jitted program reassociates the projection's distortion
        # polynomial differently from the eager composition (pure fp32
        # rounding; amplified by this test's unrealistically hot intrinsics)
        np.testing.assert_allclose(loader.big2d, ref.big2d,
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_array_equal(loader.start2d, ref.start2d)
