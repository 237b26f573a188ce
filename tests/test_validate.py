"""Preflight data validation (scripts/validate_data.py, wired into
prepare_data for --synthetic_data false): wrong-unit and wrong-joint-count
files must be rejected BEFORE training starts, with actionable messages."""
import os

import numpy as np
import pytest

from dhaug_tpu.data.synthetic import ensure_synthetic_dataset
from dhaug_tpu.data.validate import (DataValidationError, validate_2d_npz,
                                     validate_3d_npz, validate_3dhp_npz,
                                     validate_bone_templates,
                                     validate_dataset_dir)


@pytest.fixture(scope="module")
def good_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("val_root"))
    ensure_synthetic_dataset(root, n_frames_per_action=40)
    return root


def _load_3d(root):
    return np.load(os.path.join(root, "data", "data_3d_h36m.npz"),
                   allow_pickle=True)["positions_3d"].item()


def _save_3d(path, d3):
    np.savez_compressed(path, positions_3d=d3)


class TestValidDataPasses:
    def test_full_dir(self, good_root):
        report = validate_dataset_dir(good_root, "gt", verbose=False)
        assert report["data_3d_h36m.npz"]["n_frames"] > 0
        assert report["test_3dhp.npz"]["n_frames"] == 2929
        assert 1 / 3 < report["hm36s15678_bl_templates.npy"]["ratio_vs_data"] < 3

    def test_missing_templates_optional_for_baseline(self, good_root,
                                                     tmp_path):
        """The bone-template asset feeds only the GAN re-skin; a real
        dataset without it must pass preflight for run_baseline /
        run_evaluate (require_templates=False) but still fail for the GAN
        CLI (True)."""
        import shutil
        from dhaug_tpu.data.validate import DataValidationError
        root = str(tmp_path / "no_tmpl")
        shutil.copytree(good_root, root)
        os.remove(os.path.join(root, "data_extra", "bone_length_npy",
                               "hm36s15678_bl_templates.npy"))
        report = validate_dataset_dir(root, "gt", verbose=False,
                                      require_templates=False)
        assert "hm36s15678_bl_templates.npy" not in report
        with pytest.raises(DataValidationError):
            validate_dataset_dir(root, "gt", verbose=False,
                                 require_templates=True)

    def test_det_keypoints_file(self, good_root):
        validate_2d_npz(os.path.join(good_root, "data",
                                     "data_2d_h36m_cpn.npz"),
                        os.path.join(good_root, "data", "data_3d_h36m.npz"))

    def test_cli_script(self, good_root):
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "validate_data.py"),
             "--data_root", good_root], capture_output=True, text=True,
            timeout=120)
        assert proc.returncode == 0, proc.stderr[-1000:]
        assert "validation passed" in proc.stdout


class TestBadDataRejected:
    def test_mm_scaled_3d(self, good_root, tmp_path):
        d3 = _load_3d(good_root)
        d3["S1"]["Walking 1"] = d3["S1"]["Walking 1"] * 1000.0  # metres->mm
        bad = str(tmp_path / "mm.npz")
        _save_3d(bad, d3)
        with pytest.raises(DataValidationError, match="MILLIMETRES"):
            validate_3d_npz(bad)

    def test_wrong_joint_count_3d(self, good_root, tmp_path):
        d3 = _load_3d(good_root)
        d3["S1"]["Walking 1"] = d3["S1"]["Walking 1"][:, :16]  # 16 != 32
        bad = str(tmp_path / "joints.npz")
        _save_3d(bad, d3)
        with pytest.raises(DataValidationError, match="32-joint"):
            validate_3d_npz(bad)

    def test_nan_3d(self, good_root, tmp_path):
        d3 = _load_3d(good_root)
        d3["S1"]["Walking 1"] = d3["S1"]["Walking 1"].copy()
        d3["S1"]["Walking 1"][0, 0, 0] = np.nan
        bad = str(tmp_path / "nan.npz")
        _save_3d(bad, d3)
        with pytest.raises(DataValidationError, match="NaN"):
            validate_3d_npz(bad)

    def test_missing_key_3d(self, tmp_path):
        bad = str(tmp_path / "key.npz")
        np.savez(bad, wrong_key=np.zeros(3))
        with pytest.raises(DataValidationError, match="positions_3d"):
            validate_3d_npz(bad)

    def test_17_joint_2d(self, good_root, tmp_path):
        d2 = np.load(os.path.join(good_root, "data", "data_2d_h36m_gt.npz"),
                     allow_pickle=True)["positions_2d"].item()
        a = d2["S1"]["Walking 1"]
        d2["S1"]["Walking 1"] = [np.concatenate([c, c[:, :1]], axis=1)
                                 for c in a]  # 17 joints
        bad = str(tmp_path / "d17.npz")
        np.savez_compressed(bad, positions_2d=d2)
        with pytest.raises(DataValidationError, match="17-joint"):
            validate_2d_npz(bad)

    def test_pre_normalized_2d(self, good_root, tmp_path):
        d2 = np.load(os.path.join(good_root, "data", "data_2d_h36m_gt.npz"),
                     allow_pickle=True)["positions_2d"].item()
        d2["S1"]["Walking 1"] = [c / 500.0 - 1.0
                                 for c in d2["S1"]["Walking 1"]]
        bad = str(tmp_path / "norm.npz")
        np.savez_compressed(bad, positions_2d=d2)
        with pytest.raises(DataValidationError, match="normalized"):
            validate_2d_npz(bad)

    def test_2d_shorter_than_3d(self, good_root, tmp_path):
        d2 = np.load(os.path.join(good_root, "data", "data_2d_h36m_gt.npz"),
                     allow_pickle=True)["positions_2d"].item()
        d2["S1"]["Walking 1"] = [c[:5] for c in d2["S1"]["Walking 1"]]
        bad = str(tmp_path / "short.npz")
        np.savez_compressed(bad, positions_2d=d2)
        with pytest.raises(DataValidationError, match="frames"):
            validate_2d_npz(bad, os.path.join(good_root, "data",
                                              "data_3d_h36m.npz"))

    def test_uncentred_3dhp(self, good_root, tmp_path):
        src = np.load(os.path.join(good_root, "data_extra", "test_set",
                                   "test_3dhp.npz"))
        bad = str(tmp_path / "dhp.npz")
        np.savez(bad, pose3d=src["pose3d"] + 0.5, pose2d=src["pose2d"])
        with pytest.raises(DataValidationError, match="root-centred"):
            validate_3dhp_npz(bad)

    def test_pixel_2d_3dhp(self, good_root, tmp_path):
        src = np.load(os.path.join(good_root, "data_extra", "test_set",
                                   "test_3dhp.npz"))
        bad = str(tmp_path / "dhp_px.npz")
        np.savez(bad, pose3d=src["pose3d"], pose2d=src["pose2d"] * 1024.0)
        with pytest.raises(DataValidationError, match="PIXEL"):
            validate_3dhp_npz(bad)

    def test_mm_templates(self, good_root, tmp_path):
        tmpl = np.load(os.path.join(good_root, "data_extra",
                                    "bone_length_npy",
                                    "hm36s15678_bl_templates.npy"))
        bad = str(tmp_path / "tmpl.npy")
        np.save(bad, tmpl * 1000.0)
        with pytest.raises(DataValidationError, match="millimetres"):
            validate_bone_templates(bad)

    def test_template_data_scale_mismatch(self, good_root, tmp_path):
        tmpl = np.load(os.path.join(good_root, "data_extra",
                                    "bone_length_npy",
                                    "hm36s15678_bl_templates.npy"))
        bad = str(tmp_path / "tmpl4x.npy")
        np.save(bad, tmpl * 0.25)  # passes the absolute check marginally...
        with pytest.raises(DataValidationError):
            validate_bone_templates(bad, os.path.join(
                good_root, "data", "data_3d_h36m.npz"))

    def test_prepare_data_runs_preflight(self, good_root, tmp_path):
        """prepare_data with --synthetic_data false validates and rejects a
        corrupted real dataset up front."""
        import shutil
        from types import SimpleNamespace

        from dhaug_tpu.train.data_prep import prepare_data
        root = str(tmp_path / "corrupt_root")
        shutil.copytree(good_root, root)
        d3 = _load_3d(root)
        for s in d3:
            for a in d3[s]:
                d3[s][a] = d3[s][a] * 1000.0
        _save_3d(os.path.join(root, "data", "data_3d_h36m.npz"), d3)
        args = SimpleNamespace(
            data_root=root, dataset="h36m", keypoints="gt", actions="*",
            s1only=False, s1s5only=False, downsample=1, synthetic_data=False,
            random_seed=0)
        with pytest.raises(DataValidationError, match="MILLIMETRES"):
            prepare_data(args)
