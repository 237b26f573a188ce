"""Tests for utils: logger, schedulers, replay pool, profiling, viz."""
import os

import numpy as np

from dhaug_tpu.gan.replay import SampleFromPool
from dhaug_tpu.train.state import PlateauScheduler, step_lr
from dhaug_tpu.utils.log import AverageMeter, Logger, MetricsWriter, Summary


class TestLogger:
    def test_named_rows_roundtrip(self, tmp_path):
        path = str(tmp_path / "log.txt")
        lg = Logger(path, args="argsdump")
        lg.set_names(["epoch", "lr", "p1"])
        lg.append([1, 1e-3, 55.2])
        lg.append([2, 9e-4, 54.1])
        lg.close()
        lg2 = Logger(path, resume=True)
        assert lg2.names == ["epoch", "lr", "p1"]
        assert lg2.numbers["p1"] == ["55.2", "54.1"] or \
            [float(x) for x in lg2.numbers["p1"]] == [55.2, 54.1]
        with open(path) as f:
            content = f.read()
        assert "argsdump" in content
        assert "55.2" in content

    def test_metrics_writer_jsonl(self, tmp_path):
        w = MetricsWriter(str(tmp_path))
        w.add_scalar("loss", 1.5, 0)
        w.add_scalar("loss", 1.2, 1)
        w.flush()
        import json
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["tag"] == "loss" and lines[1]["step"] == 1

    def test_summary_state_roundtrip(self, tmp_path):
        s = Summary(str(tmp_path))
        s.epoch, s.train_iter_num = 7, 123
        d = s.state_dict()
        s2 = Summary(str(tmp_path))
        s2.load_state_dict(d)
        assert s2.epoch == 7 and s2.train_iter_num == 123

    def test_average_meter(self):
        m = AverageMeter()
        m.update(2.0, n=2)
        m.update(5.0, n=1)
        np.testing.assert_allclose(m.avg, 3.0)


class TestSchedulers:
    def test_step_lr(self):
        assert step_lr(1.0, 0, 10) == 1.0
        np.testing.assert_allclose(step_lr(1.0, 25, 10), 0.01)

    def test_plateau(self):
        sch = PlateauScheduler(1.0, factor=0.5, patience=2)
        for _ in range(3):
            sch.step(10.0)  # no improvement streak
        lr = sch.step(10.0)
        assert lr == 0.5
        # improvement resets
        lr = sch.step(5.0)
        assert lr == 0.5


class TestReplayPool:
    def test_passthrough_until_full(self):
        pool = SampleFromPool(max_elements=8, seed=0)
        x = np.arange(8, dtype=np.float32)[:, None]
        out = pool(x)
        np.testing.assert_allclose(out, x)

    def test_swaps_after_full(self):
        pool = SampleFromPool(max_elements=4, seed=0)
        pool(np.zeros((4, 1), np.float32))
        out = pool(np.ones((64, 1), np.float32))
        # with p=0.5 over 64 samples, some must come from the (zero) pool
        assert (out == 0).any()
        assert (out == 1).any()


class TestProfiling:
    def test_step_timer(self):
        import time

        from dhaug_tpu.utils.profiling import StepTimer
        t = StepTimer()
        with t("phase_a"):
            time.sleep(0.01)
        with t("phase_a"):
            time.sleep(0.01)
        s = t.summary()
        assert s["phase_a"]["count"] == 2
        assert s["phase_a"]["mean_s"] >= 0.009
        assert "phase_a" in t.report()

    def test_timed(self):
        import jax.numpy as jnp

        from dhaug_tpu.utils.profiling import timed
        out, dt = timed(lambda: jnp.ones(8).sum(), iters=2)
        assert float(out) == 8.0 and dt >= 0

    def test_fence(self):
        import jax.numpy as jnp

        from dhaug_tpu.utils.profiling import StepTimer, fence
        # array pytree, plain python, and empty outputs all fence cleanly
        fence({"a": jnp.ones((3,)), "b": 1})
        fence([1, "x"])
        fence(None)
        t = StepTimer()
        with t("p", fence_out=jnp.arange(4) * 2):
            pass
        assert t.summary()["p"]["count"] == 1


class TestCmuPoseTarget:
    def test_batches(self):
        from dhaug_tpu.data.loaders import CmuPoseTarget
        rng = np.random.default_rng(0)
        ds = CmuPoseTarget(rng.normal(size=(20, 16, 3)).astype(np.float32),
                           rng.normal(size=(20, 16, 2)).astype(np.float32),
                           rng.normal(size=(5, 9)).astype(np.float32))
        batches = list(ds.batches(np.random.default_rng(1), 8))
        assert len(batches) == 2
        p3, p2, cam = batches[0]
        assert p3.shape == (8, 16, 3) and cam.shape == (8, 9)


class TestViz:
    def test_pose_grid_3d(self, tmp_path):
        from dhaug_tpu.utils.viz import plot_pose_grid_3d
        rng = np.random.default_rng(0)
        p = plot_pose_grid_3d(rng.normal(size=(4, 16, 3)),
                              str(tmp_path / "g.png"))
        assert os.path.getsize(p) > 1000

    def test_fetch_tree_packed(self):
        """fetch_tree must reproduce every leaf exactly (values, shapes,
        0-d scalars, mixed dtypes, non-array passthrough) while packing the
        device->host transfer into one fetch per dtype."""
        import jax.numpy as jnp

        from dhaug_tpu.utils.checkpoint import fetch_tree
        rng = np.random.default_rng(5)
        a = rng.normal(size=(7, 3)).astype(np.float32)
        tree = {"a": jnp.asarray(a),
                "b": {"c": jnp.asarray(3, jnp.int32),
                      "d": jnp.asarray(rng.integers(0, 9, (4,)), jnp.int32)},
                "scalar": jnp.asarray(2.5, jnp.float32),
                "passthrough": 7, "s": "hi", "np": np.arange(4)}
        out = fetch_tree(tree)
        np.testing.assert_array_equal(out["a"], a)
        assert out["a"].dtype == np.float32
        assert out["b"]["c"].shape == () and int(out["b"]["c"]) == 3
        assert out["scalar"].shape == () and float(out["scalar"]) == 2.5
        assert out["passthrough"] == 7 and out["s"] == "hi"
        np.testing.assert_array_equal(out["np"], np.arange(4))
        assert all(isinstance(x, np.ndarray)
                   for x in (out["a"], out["b"]["c"], out["scalar"]))

    def test_paper_figures(self, tmp_path):
        """The 'for paper' clean dumps + fake-vs-real pair grid
        (special_operate.py:604-734 equivalents)."""
        from dhaug_tpu.utils.viz import (plot_fake_real_pairs_3d,
                                         plot_paper_pose2d,
                                         plot_paper_pose3d_row)
        rng = np.random.default_rng(7)
        p = plot_paper_pose3d_row(rng.normal(size=(5, 16, 3)) * 0.3,
                                  str(tmp_path / "p3.jpg"))
        assert os.path.getsize(p) > 1000
        p = plot_paper_pose2d(rng.normal(size=(16, 2)) * 0.3,
                              str(tmp_path / "p2.jpg"))
        assert os.path.getsize(p) > 1000
        p = plot_fake_real_pairs_3d(rng.normal(size=(4, 16, 3)) * 0.3,
                                    rng.normal(size=(4, 16, 3)) * 0.3,
                                    str(tmp_path / "pairs.jpg"))
        assert os.path.getsize(p) > 1000

    def test_angle_pair_density(self, tmp_path):
        from dhaug_tpu.utils.viz import plot_angle_pair_density
        rng = np.random.default_rng(3)
        p = plot_angle_pair_density(
            rng.uniform(-180, 180, (500, 37)).astype(np.float32),
            str(tmp_path / "pair.jpg"))
        assert os.path.getsize(p) > 1000

    def test_scalar_curves(self, tmp_path):
        from dhaug_tpu.utils.viz import plot_scalar_curves
        p = plot_scalar_curves({"3d_wasserstein": [1.0, 0.5, 0.2],
                                "g_cost": [0.1, 0.2, 0.3]},
                               str(tmp_path / "w.png"))
        assert os.path.getsize(p) > 1000

    def test_render_animation_gif(self, tmp_path):
        """Headless sequence animation: 2 frames, 3 columns, playable gif."""
        from dhaug_tpu.utils.viz import render_animation
        rng = np.random.default_rng(1)
        pred = rng.normal(size=(2, 16, 3)).astype(np.float32)
        gt = pred + 0.05
        in2d = rng.normal(size=(2, 16, 2)).astype(np.float32)
        p = render_animation(str(tmp_path / "seq.gif"), pred, gt3d=gt,
                             input2d=in2d, fps=2)
        assert p.endswith(".gif") and os.path.getsize(p) > 1000
        with open(p, "rb") as f:
            assert f.read(6) in (b"GIF87a", b"GIF89a")

    def test_render_animation_mp4_fallback(self, tmp_path):
        """An .mp4 request degrades to .gif when ffmpeg is absent — either
        way a playable file lands on disk."""
        from dhaug_tpu.utils.viz import render_animation
        rng = np.random.default_rng(2)
        p = render_animation(str(tmp_path / "seq.mp4"),
                             rng.normal(size=(2, 16, 3)).astype(np.float32))
        assert os.path.getsize(p) > 500


class TestFkInspector:
    def test_generated_page_and_goldens(self, tmp_path):
        """The interactive DH inspector is a self-contained HTML page whose
        embedded golden poses must match fk_world_pose (the page re-verifies
        them in JS on load)."""
        import json
        import re
        import sys

        import jax.numpy as jnp

        scripts_dir = os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "scripts")
        sys.path.insert(0, scripts_dir)
        try:
            import make_fk_inspector

            from dhaug_tpu.ops import fk

            out = make_fk_inspector.generate(str(tmp_path / "insp.html"))
        finally:
            sys.path.remove(scripts_dir)
        html = open(out).read()
        assert "<canvas" in html and "selfTest" in html and "fkPose16" in html

        spec = json.loads(re.search(r"const SPEC = (\{.*?\});\n", html,
                                    re.S).group(1))
        assert len(spec["goldens"]) >= 3
        assert len(spec["scatter16"]) == 16
        for g in spec["goldens"]:
            pose = np.asarray(fk.fk_world_pose(fk.FKInputs(
                jnp.asarray(g["angles"], jnp.float32),
                jnp.asarray(g["bone_len"], jnp.float32),
                jnp.asarray(g["global_rot"], jnp.float32),
                jnp.zeros(3, jnp.float32)), n_joints=16))
            np.testing.assert_allclose(np.asarray(g["pose"]), pose, atol=1e-5)
        # the chain spec embedded in the page is the ops.fk source of truth
        assert tuple(spec["chains"]["body"]["alpha"]) == fk.BODY_ALPHA
        assert tuple(spec["canonical_bone_len"]) == fk.CANONICAL_BONE_LEN


class TestSummaryScalars:
    def test_epoch_scalar_history_roundtrip(self, tmp_path):
        s = Summary(str(tmp_path))
        s.record_epoch_scalars({"3d_wasserstein": 1.5})
        s.record_epoch_scalars({"3d_wasserstein": 1.0, "g_cost": 0.2})
        d = s.state_dict()
        s2 = Summary(str(tmp_path))
        s2.load_state_dict(d)
        assert s2.epoch_scalar_history == {"3d_wasserstein": [1.5, 1.0],
                                           "g_cost": [0.2]}
