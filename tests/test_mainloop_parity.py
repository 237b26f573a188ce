"""Whole-main orchestration execution parity (round-4 VERDICT missing #1).

Every inner surface (forwards, optimizer updates, fused critic blocks, data
fetch, the eval protocol) is already executed-parity-pinned in
test_reference_parity.py; this file executes the reference's EPOCH-LEVEL
COMPOSITION itself — the per-epoch sequence of run_Fk_GAN.py:111-189:

    dataloader_update -> GAN_solutions_FK_generator -> train_posenet(fake)
    -> evaluate_posenet('_fake') -> train_posenet(real)
    -> evaluate_posenet('_real') -> LR step -> best-checkpoint bookkeeping

driving the reference's ACTUAL functions (function_aug/dataloader_update.py,
models_Fk_GAN/model_fk_gan_train.py:236, function_aug/model_pos_train.py,
function_aug/model_pos_eval.py, utils/utils.py Summary + get_scheduler) for
three epochs with tiny dims, SGD substituted, and all RNG injected — against
the rebuild's production pieces composed the same way.  Asserted: every
per-epoch log row (epoch, lr, h36m p1/p2, dhp p1/p2, PCK, AUC — both the
'_fake' interim rows and the end-of-epoch rows), the best-checkpoint
decision sequence, and the final weights of all four networks.

The epochs cover the glue a silent divergence could hide in: the
warmup->training boundary (epoch 0 runs the GAN only), the cross-epoch
train_iter_num cadence (the every-5th generator update fires mid-epoch 2),
the re-skin-of-re-skinned-data chain (dataloader_update consumes its own
previous output), the fake-buffer -> posenet handoff, and the LambdaLR step
placement AFTER the epoch's training.

RNG injection: np.random is reseeded per epoch and its draw sequence
(re-skin template choices, then per-iteration subject/camera picks) is
replayed with an identically-seeded RandomState; torch is reseeded per
epoch and its draw sequence (noise, both GP alphas, generator noise on
cadence iterations) is replayed through the same global stream; every
DataLoader the reference glue creates is forced to a sequential sampler
with a private generator, so iterator creation consumes no global RNG.
"""
from __future__ import annotations

import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_import import load_reference, make_ref_args, reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

torch = pytest.importorskip("torch")

from tests.test_reference_parity import (_cpu_as_cuda, _snapshot,
                                         _transplant_d2d, _transplant_d3d,
                                         _transplant_gen_trunk,
                                         _transplant_mlp, _tree_max_diff,
                                         _WriterStub, _randomize_bn_stats)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ref():
    return load_reference()


class TestSingleFrameMainLoop:
    B = 16            # GAN batch
    N = 32            # train set size -> 2 GAN iterations/epoch
    D = 48            # generator/critic width
    LR_GAN = 1e-3     # SGD on the lambda=10 GP objective (1e-2 explodes)
    LR_P = 0.01
    EPOCHS = 3        # LambdaLR nepoch; epochs 1-2 train the posenet
    WARMUP = 0
    N_H36M, N_DHP = 21, 13   # not divisible by EVAL_B: partial batches
    EVAL_B = 8

    # --- shared setup ------------------------------------------------------

    def _args(self):
        args = make_ref_args(batch_size=self.B)
        args.GAN_LAMBDA = 10.0
        args.GAN_OUTPUT_DIM = 35
        args.Gen_DenseDim = self.D
        args.GAN_whether_use_preAngle = True
        args.whether_use_RT = True
        args.bone_len_scaler = ""
        args.flip_GAN_model_input = False
        args.flip_pos_model_input = False
        args.GAN_3d_loss_weight = 1.0   # reference flag defaults
        args.GAN_2d_loss_weight = 0.2
        args.warmup = self.WARMUP
        args.epochs = self.EPOCHS
        args.additional_train_epoch = 0
        args.additional_LR_decay = 0.95
        args.num_workers = 0
        args.lr_p = self.LR_P
        args.data_enhancement_method = "GAN"
        return args

    def _data(self):
        """Tiny shared fixture: real train pairs (cam space) under S1 cam 0,
        plus H36M/3DHP eval sets with partial final batches."""
        from dhaug_tpu.gan.wgan import camera_bank, tiled_cam16
        rng = np.random.RandomState(60)
        quats, trans, intrs = camera_bank(["S1"])
        cam16 = np.asarray(tiled_cam16(intrs[0], quats[0], trans[0], self.N))

        from dhaug_tpu.data.loaders import np_world_to_camera
        world = rng.normal(size=(self.N, 16, 3)).astype(np.float32) * 0.3
        pose3d_cam = np_world_to_camera(
            world, np.asarray(quats[0]), np.asarray(trans[0])
        ).astype(np.float32)
        from dhaug_tpu.ops.camera import project_to_2d
        pose2d = np.asarray(project_to_2d(jnp.asarray(pose3d_cam),
                                          jnp.asarray(cam16[:, :9])))

        def eval_set(n, seed):
            r = np.random.RandomState(seed)
            e2d = r.normal(size=(n, 16, 2)).astype(np.float32) * 0.3
            e3d = (r.normal(size=(n, 16, 3)).astype(np.float32) * 0.3
                   + r.uniform(-1, 1, (n, 1, 3)).astype(np.float32))
            return e3d, e2d

        h36m_3d, h36m_2d = eval_set(self.N_H36M, 61)
        dhp_3d, dhp_2d = eval_set(self.N_DHP, 62)
        templates = np.load(os.path.join(
            REPO, "data_extra", "bone_length_npy",
            "hm36s15678_bl_templates.npy"))
        return (quats, trans, intrs, cam16, pose3d_cam, pose2d,
                h36m_3d, h36m_2d, dhp_3d, dhp_2d, templates)

    # --- the test ----------------------------------------------------------

    def test_three_epoch_composition(self, ref, monkeypatch, tmp_path):
        dlu = importlib.import_module("function_aug.dataloader_update")
        mpt = importlib.import_module("function_aug.model_pos_train")
        mpe = importlib.import_module("function_aug.model_pos_eval")
        uu = importlib.import_module("utils.utils")
        cdl = importlib.import_module("common.data_loader")
        ref_mlp_mod = importlib.import_module(
            "models_baseline.mlp.linear_model")

        (quats, trans, intrs, cam16, pose3d_cam, pose2d,
         h36m_3d, h36m_2d, dhp_3d, dhp_2d, templates) = self._data()
        args = self._args()
        B, N = self.B, self.N
        n_batches = N // B

        # every DataLoader in the reference glue: sequential sampler + a
        # PRIVATE generator (iterator creation otherwise draws an int64
        # _base_seed from the global torch stream, which would desync the
        # injected noise/alpha replay below)
        import torch.utils.data as tud
        real_DataLoader = tud.DataLoader

        def _ordered_loader(*a, **k):
            k["shuffle"] = False
            k["generator"] = torch.Generator()
            return real_DataLoader(*a, **k)

        monkeypatch.setattr(dlu, "DataLoader", _ordered_loader)
        monkeypatch.setattr(ref.gan_train, "DataLoader", _ordered_loader)
        _cpu_as_cuda(monkeypatch)
        device = torch.device("cpu")

        # random_bl_aug loads './data_extra/...' relative to CWD
        monkeypatch.chdir(REPO)

        # --- reference models, SGD substituted
        import types
        torch.manual_seed(30)
        fk_class = ref.fk.Forward_Kinematics_DH_Model(args, [], None)
        ref_g = ref.gen.Fk_Generator(fk_class, args, device)
        ref_g.train_num = 1  # dodge the %500==1 heatmap dump side effect
        torch.manual_seed(31)
        ref_d3 = ref.disc.Fk_3D_Discriminator(
            device, types.SimpleNamespace(Dis_DenseDim_3D=self.D))
        torch.manual_seed(32)
        ref_d2 = ref.disc.Fk_2D_Discriminator(
            types.SimpleNamespace(Dis_DenseDim_2D=self.D))
        torch.manual_seed(33)
        model_pos = ref_mlp_mod.LinearModel(16 * 2, 15 * 3, linear_size=64,
                                            num_stage=2, p_dropout=0.0)
        _randomize_bn_stats(model_pos, np.random.RandomState(34))
        model_pos_eval = ref_mlp_mod.LinearModel(16 * 2, 15 * 3,
                                                 linear_size=64, num_stage=2,
                                                 p_dropout=0.0)

        poseFk_dict = {
            "model_G": ref_g, "model_d3d": ref_d3, "model_d2d": ref_d2,
            "optimizer_G": torch.optim.SGD(ref_g.parameters(),
                                           lr=self.LR_GAN),
            "optimizer_d3d": torch.optim.SGD(ref_d3.parameters(),
                                             lr=self.LR_GAN),
            "optimizer_d2d": torch.optim.SGD(ref_d2.parameters(),
                                             lr=self.LR_GAN),
        }
        posenet_optimizer = torch.optim.SGD(model_pos.parameters(),
                                            lr=args.lr_p)
        posenet_lr_scheduler = uu.get_scheduler(
            posenet_optimizer, policy="lambda", nepoch_fix=0,
            nepoch=args.epochs)
        criterion = torch.nn.MSELoss(reduction="mean").to(device)
        summary = uu.Summary(str(tmp_path))
        writer = _WriterStub()

        def pose_loader(p3d, p2d):
            return _ordered_loader(
                cdl.PoseDataSet([p3d], [p2d], [["a"] * len(p3d)], [cam16]),
                batch_size=B)

        def eval_loader(t3d, t2d):
            return _ordered_loader(
                tud.TensorDataset(torch.from_numpy(t3d.copy()),
                                  torch.from_numpy(t2d.copy())),
                batch_size=self.EVAL_B)

        data_dict = {
            "train_gt2d3d_loader": pose_loader(pose3d_cam, pose2d),
            "train_det2d3d_loader": pose_loader(pose3d_cam, pose2d),
            "H36M_test": eval_loader(h36m_3d, h36m_2d),
            "mpi3d_loader": eval_loader(dhp_3d, dhp_2d),
        }

        # --- the reference's per-epoch composition, run_Fk_GAN.py:111-189
        # verbatim (incl. the 9999-init best bookkeeping, :96-97)
        ref_rows, ref_saves = [], []
        dhpp1_best, s911p1_best = 9999, 9999
        lr_now = 0
        h36m_p1 = h36m_p2 = dhp_p1 = dhp_p2 = PCK = AUC = 0
        for now_epoch in range(args.epochs + args.additional_train_epoch):
            np.random.seed(700 + now_epoch)
            torch.manual_seed(900 + now_epoch)
            dlu.dataloader_update(args=args, data_dict=data_dict,
                                  device=device)
            ref.gan_train.GAN_solutions_FK_generator(
                args, poseFk_dict, data_dict, model_pos, summary, writer,
                ["S1"])
            if summary.epoch > args.warmup:
                mpt.train_posenet(model_pos,
                                  data_dict["train_fake2d3d_loader"],
                                  posenet_optimizer, criterion, device, args)
                (h36m_p1, h36m_p2, dhp_p1, dhp_p2, PCK,
                 AUC) = mpe.evaluate_posenet(
                    args, data_dict, model_pos, model_pos_eval, device,
                    summary, writer, tag="_fake", get_pck_auc=True)
                ref_rows.append([summary.epoch, 0, h36m_p1, h36m_p2, dhp_p1,
                                 dhp_p2, PCK, AUC])
                mpt.train_posenet(model_pos,
                                  data_dict["train_det2d3d_loader"],
                                  posenet_optimizer, criterion, device, args)
                (h36m_p1, h36m_p2, dhp_p1, dhp_p2, PCK,
                 AUC) = mpe.evaluate_posenet(
                    args, data_dict, model_pos, model_pos_eval, device,
                    summary, writer, tag="_real", get_pck_auc=True)
            if now_epoch < args.epochs:
                posenet_lr_scheduler.step()
                lr_now = posenet_optimizer.param_groups[0]["lr"]
            else:
                for group in posenet_optimizer.param_groups:
                    group["lr"] *= args.additional_LR_decay
                lr_now = posenet_optimizer.param_groups[0]["lr"]
            ref_rows.append([summary.epoch, lr_now, h36m_p1, h36m_p2,
                             dhp_p1, dhp_p2, PCK, AUC])
            if dhpp1_best is None or dhpp1_best > dhp_p1:
                dhpp1_best = dhp_p1
                ref_saves.append(("dhp", summary.epoch))
            if s911p1_best is None or s911p1_best > h36m_p1:
                s911p1_best = h36m_p1
                ref_saves.append(("h36m", summary.epoch))
            summary.summary_epoch_update()

        # --- rebuild side: production pieces in the same composition -------
        import optax

        from dhaug_tpu.gan.wgan import (GanHyper, make_critic_step,
                                        make_single_frame_steps)
        from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                     Fk3DDiscriminator)
        from dhaug_tpu.models.generator import (FkGeneratorNet,
                                                GeneratorConfig,
                                                synthesize_poses)
        from dhaug_tpu.models.posenets import LinearModel
        from dhaug_tpu.ops.bones import bone_lengths_fk, reskin_pose
        from dhaug_tpu.ops.camera import (camera_to_world_batch,
                                          project_to_2d,
                                          world_to_camera_batch)
        from dhaug_tpu.train.posenet import (evaluate_scan,
                                             make_eval_epoch_fn,
                                             make_posenet_train_step,
                                             root_relative)
        from dhaug_tpu.train.state import lambda_lr, make_state

        cfg = GeneratorConfig(dense_dim=self.D, use_pre_angle=True,
                              use_global_rot=True, video_frames=1)
        gen = FkGeneratorNet(cfg)
        d3d = Fk3DDiscriminator(dense_dim=self.D)
        d2d = Fk2DDiscriminator(dense_dim=self.D)
        mlp = LinearModel(linear_size=64, num_stage=2, dropout=0.0)
        gen_params = gen.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 128)))["params"]
        d3_params = d3d.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 16, 3)))["params"]
        d2_params = d2d.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 16, 2)))["params"]
        pos_vars = mlp.init({"params": jax.random.PRNGKey(0),
                             "dropout": jax.random.PRNGKey(1)},
                            jnp.zeros((2, 16, 2)), train=False)
        pos_params, pos_stats = pos_vars["params"], pos_vars["batch_stats"]
        # transplant the SAME initial weights the reference loop started from
        # (the reference loop has already trained its copies; the
        # transplanters below would give post-training weights, so re-create
        # fresh reference modules from the same seeds)
        torch.manual_seed(30)
        fk2 = ref.fk.Forward_Kinematics_DH_Model(args, [], None)
        g0 = ref.gen.Fk_Generator(fk2, args, device)
        torch.manual_seed(31)
        d30 = ref.disc.Fk_3D_Discriminator(
            device, types.SimpleNamespace(Dis_DenseDim_3D=self.D))
        torch.manual_seed(32)
        d20 = ref.disc.Fk_2D_Discriminator(
            types.SimpleNamespace(Dis_DenseDim_2D=self.D))
        torch.manual_seed(33)
        pos0 = ref_mlp_mod.LinearModel(16 * 2, 15 * 3, linear_size=64,
                                       num_stage=2, p_dropout=0.0)
        _randomize_bn_stats(pos0, np.random.RandomState(34))
        _transplant_gen_trunk(g0, gen_params)
        _transplant_d3d(d30, d3_params)
        _transplant_d2d(d20, d2_params)
        _transplant_mlp(pos0, pos_params, pos_stats)

        apply_gen = lambda p, x: gen.apply({"params": p}, x)
        apply_d3 = lambda p, x: d3d.apply({"params": p}, x)
        apply_d2 = lambda p, x: d2d.apply({"params": p}, x)
        hyper = GanHyper(flip=False, bone_len_scaler="", use_pallas_fk=False)
        tx_gan = optax.sgd(self.LR_GAN)
        steps = make_single_frame_steps(apply_gen, apply_d3, apply_d2,
                                        tx_gan, tx_gan, tx_gan, cfg, hyper,
                                        quats, trans, intrs)
        d3_step = make_critic_step(apply_d3, tx_gan, args.GAN_LAMBDA)
        d2_step = make_critic_step(apply_d2, tx_gan, args.GAN_LAMBDA)
        gen_state = make_state(tx_gan, gen_params)
        d3_state = make_state(tx_gan, d3_params)
        d2_state = make_state(tx_gan, d2_params)
        eval_plain = make_eval_epoch_fn(mlp, flip=False)
        eval_flip = make_eval_epoch_fn(mlp, flip=True)

        def eval_both(params, stats):
            h36m = evaluate_scan(eval_plain, params, stats,
                                 jnp.asarray(h36m_2d), jnp.asarray(h36m_3d),
                                 batch_size=self.EVAL_B)
            dhp = evaluate_scan(eval_flip, params, stats,
                                jnp.asarray(dhp_2d), jnp.asarray(dhp_3d),
                                batch_size=self.EVAL_B)
            return h36m, dhp

        key = jax.random.PRNGKey(7)   # unused entropy; all draws injected
        zeros8 = jnp.zeros((B, 8), jnp.float32)
        real_quats = jnp.asarray(cam16[:, 9:13])
        real_trans = jnp.asarray(cam16[:, 13:16])
        T_templates = templates.shape[0]

        my_rows, my_saves = [], []
        my_dhp_best, my_h36m_best = 9999, 9999
        lr_cur = args.lr_p      # what epoch e trains at
        lr_log = 0
        scores = [0.0] * 6      # h36m p1/p2, dhp p1/p2, pck, auc
        cur3d = pose3d_cam.copy()
        train_iter_num = 0      # Summary.train_iter_num twin
        for e in range(args.epochs + args.additional_train_epoch):
            # np.random replay: template choices (one per re-skin batch, in
            # loader order), then per-iteration subject/camera picks
            rs = np.random.RandomState(700 + e)
            tmpl_idx = [rs.choice(T_templates, B) for _ in range(n_batches)]
            # torch replay: per iteration noise, both GP alphas, generator
            # noise on cadence iterations (the same global-stream order)
            torch.manual_seed(900 + e)
            iters = []
            for it in range(n_batches):
                noise = torch.randn(B, 128).numpy()
                a3 = torch.rand(B, 1).numpy()
                a2 = torch.rand(B, 1).numpy()
                gnoise = torch.randn(B, 128).numpy() \
                    if train_iter_num % 5 == 4 else None
                subj = rs.randint(0, 1)
                cam_id = rs.randint(0, 4)
                assert subj == 0
                iters.append((noise, a3, a2, gnoise, cam_id))
                train_iter_num += 1

            # dataloader_update: re-skin the loader's CURRENT content (the
            # reference re-skins its own previous output; bone directions
            # are invariant so the chain composes exactly)
            new3d = [np.asarray(reskin_pose(
                jnp.asarray(cur3d[b * B:(b + 1) * B]),
                jnp.asarray(templates[tmpl_idx[b]])))
                for b in range(n_batches)]
            cur3d = np.concatenate(new3d)
            cur2d = np.asarray(project_to_2d(jnp.asarray(cur3d),
                                             jnp.asarray(cam16[:, :9])))

            # GAN epoch (critics every iteration, generator on cadence)
            fake3d_buf, fake2d_buf = [], []
            for it, (noise, a3, a2, gnoise, cam_id) in enumerate(iters):
                sl = slice(it * B, (it + 1) * B)
                real_cam3d = jnp.asarray(cur3d[sl])
                bone_len = bone_lengths_fk(real_cam3d)
                real_world = camera_to_world_batch(real_cam3d,
                                                   real_quats[sl],
                                                   real_trans[sl])
                real_rel = real_world - real_world[:, :1]
                head = apply_gen(gen_state.params, jnp.asarray(noise))
                fake = synthesize_poses(head, bone_len, zeros8, cfg)
                fake_root = fake[:, :1]
                fake_rel = fake - fake_root
                d3_state, _ = d3_step(d3_state, real_rel, fake_rel, key,
                                      alpha=jnp.asarray(a3))
                fake_cam3d = world_to_camera_batch(
                    fake_rel + fake_root, jnp.asarray(quats[cam_id])[None],
                    jnp.asarray(trans[cam_id])[None])
                intr_b = jnp.broadcast_to(jnp.asarray(intrs[cam_id])[None],
                                          (B, 9))
                fake_2d = project_to_2d(fake_cam3d, intr_b)
                d2_state, _ = d2_step(d2_state, jnp.asarray(cur2d[sl]),
                                      fake_2d, key, alpha=jnp.asarray(a2))
                if gnoise is not None:
                    gen_state, _ = steps.generator_step(
                        gen_state, d3_state.params, d2_state.params,
                        bone_len, jnp.asarray(cam_id), key,
                        noise=jnp.asarray(gnoise), scaler8=zeros8)
                fake3d_buf.append(np.asarray(fake_cam3d))
                fake2d_buf.append(np.asarray(fake_2d))

            # posenet co-training after warmup (summary.epoch == e here)
            if e > args.warmup:
                tx_pos = optax.chain(optax.clip_by_global_norm(1.0),
                                     optax.sgd(lr_cur))
                pstep = make_posenet_train_step(mlp, tx_pos, "mse")
                pstate = make_state(tx_pos, pos_params, pos_stats)
                for f2d, f3d in zip(fake2d_buf, fake3d_buf):
                    pstate, _ = pstep(pstate, jnp.asarray(f2d),
                                      root_relative(jnp.asarray(f3d)), key)
                pos_params, pos_stats = pstate.params, pstate.batch_stats
                h36m, dhp = eval_both(pos_params, pos_stats)
                my_rows.append([e, 0, h36m["p1"], h36m["p2"], dhp["p1"],
                                dhp["p2"], dhp["pck"], dhp["auc"]])
                pstate = make_state(tx_pos, pos_params, pos_stats)
                for b in range(n_batches):
                    sl = slice(b * B, (b + 1) * B)
                    pstate, _ = pstep(pstate, jnp.asarray(pose2d[sl]),
                                      root_relative(jnp.asarray(
                                          pose3d_cam[sl])), key)
                pos_params, pos_stats = pstate.params, pstate.batch_stats
                h36m, dhp = eval_both(pos_params, pos_stats)
                scores = [h36m["p1"], h36m["p2"], dhp["p1"], dhp["p2"],
                          dhp["pck"], dhp["auc"]]
            # LR step AFTER the epoch's training (run_Fk_GAN.py:160-169)
            if e < args.epochs:
                lr_cur = lambda_lr(args.lr_p, e + 1, args.epochs)
                lr_log = lr_cur
            else:
                lr_cur = lr_cur * args.additional_LR_decay
                lr_log = lr_cur
            my_rows.append([e, lr_log, *scores])
            if my_dhp_best is None or my_dhp_best > scores[2]:
                my_dhp_best = scores[2]
                my_saves.append(("dhp", e))
            if my_h36m_best is None or my_h36m_best > scores[0]:
                my_h36m_best = scores[0]
                my_saves.append(("h36m", e))

        # --- the verdict: rows, bookkeeping, final weights ------------------
        # non-vacuity: the posenet actually trained and scored, and the
        # cross-epoch cadence actually fired a generator update (counter 4
        # lands mid-epoch 2)
        assert ref_rows[-1][2] > 0 and my_rows[-1][2] > 0
        assert train_iter_num == n_batches * (args.epochs
                                              + args.additional_train_epoch)
        assert any(it[3] is not None for it in iters)
        assert len(my_rows) == len(ref_rows)
        np.testing.assert_allclose(np.asarray(my_rows, np.float64),
                                   np.asarray(ref_rows, np.float64),
                                   rtol=1e-3, atol=5e-3)
        assert my_saves == ref_saves

        # final weights of all four networks track the reference's
        for transplant, params_now, ref_model, tol in (
                (_transplant_gen_trunk, gen_state.params, ref_g, 1e-4),
                (_transplant_d3d, d3_state.params, ref_d3, 1e-4),
                (_transplant_d2d, d2_state.params, ref_d2, 1e-4)):
            after = _snapshot(params_now)
            transplant(ref_model, after)
            assert _tree_max_diff(params_now, after) < tol
        p_after, s_after = _snapshot(pos_params), _snapshot(pos_stats)
        _transplant_mlp(model_pos, p_after, s_after)
        assert _tree_max_diff(pos_params, p_after) < 1e-5
        assert _tree_max_diff(pos_stats, s_after) < 1e-5


class TestVideoMainLoop:
    """Video twin: the reference's ACTUAL video per-epoch composition
    (run_Fk_GAN.py:245-315) executed for four epochs against the rebuild —
    video_mode_dataloader_update (per-sequence re-skin -> fresh
    GAN_video_ChunkedGenerator) -> video_mode_GAN_solutions_FK_generator
    (5 models; motion critics gated by single_dis_warmup_epoch) ->
    GAN_dataSet_video_mode_train_posenet(fake) ->
    video_mode_evaluate_posenet('_fake') -> video_mode_train_posenet(real)
    -> eval('_real') -> the LR step that in video mode sits INSIDE the
    training gate -> best bookkeeping (None-init, :226-227).

    Epoch geometry: single_dis_warmup_epoch=1 and warmup=0 over
    epochs(sched)=3 => 4 epochs total; motion critics join at epoch 1
    (first warmup boundary), the posenet at epoch 2 (second boundary); the
    cross-epoch train_iter_num cadence fires generator updates mid-epoch at
    counters 4/9/14.  Playback and flip are OFF: the reference's playback
    generator branch hits its :467 reshape bug (16*2 view on 3D data) that
    dhaug_tpu deliberately fixes (gan/video.py), and both duplication trees
    are already pinned by TestVideoUpdateDynamicsParity's fused-block test.

    RNG injection mirrors the single-frame test, plus the video-specific
    streams: the 'different' bone-scaler draws ride the FK class's OWN
    RandomState (one randint per generator forward — critic-phase and
    generator-phase), replayed through a synchronized probe; the GAN chunk
    loader's shuffle rides a fresh RandomState(1234) every epoch (it is
    re-CONSTRUCTED by video_mode_dataloader_update), replayed by permuting
    the same pairs list once.
    """

    B = 8
    F = 9                 # video_receptive_field('3,3')
    D = 48
    LR_GAN = 1e-3
    LR_P = 0.01
    EPOCHS = 3            # sched nepoch
    WARMUP = 0
    SDW = 1               # single_dis_warmup_epoch
    TRAIN_LENS = (20, 12)          # 32 chunks -> 4 full batches of 8
    H36M_LENS = (19, 31, 13)
    DHP_LENS = (23, 11)

    def _args(self, tmp_path):
        args = make_ref_args(batch_size=self.B, mode="multi",
                             architecture="3,3")
        args.GAN_LAMBDA = 10.0
        args.GAN_OUTPUT_DIM = 35
        args.Gen_DenseDim = self.D
        args.GAN_whether_use_preAngle = True
        args.whether_use_RT = True
        args.bone_len_scaler = "different"   # the reference's video config
        args.flip_GAN_model_input = False
        args.flip_pos_model_input = False
        args.GAN_video_playback_input = False
        args.GAN_3d_loss_weight = 1.0
        args.GAN_2d_loss_weight = 0.2
        args.GAN_3d_motion_loss_weight = 1.0
        args.GAN_2d_motion_loss_weight = 1.0
        args.warmup = self.WARMUP
        args.single_dis_warmup_epoch = self.SDW
        args.epochs = self.EPOCHS
        args.additional_train_epoch = 0
        args.additional_LR_decay = 0.95
        args.num_workers = 0
        args.lr_p = self.LR_P
        args.data_enhancement_method = "GAN"
        args.posenet_name = "mulit_farme_videopose"
        args.checkpoint = str(tmp_path)
        return args

    def _sequences(self):
        """Per-sequence real data (cam space) + one cam16 vector each, and
        the whole-sequence eval sets."""
        from dhaug_tpu.data.loaders import np_world_to_camera
        from dhaug_tpu.gan.wgan import camera_bank, tiled_cam16
        from dhaug_tpu.ops.camera import project_to_2d
        rng = np.random.RandomState(80)
        quats, trans, intrs = camera_bank(["S1"])
        cam16_rows = np.asarray(tiled_cam16(intrs[0], quats[0], trans[0],
                                            len(self.TRAIN_LENS)))
        seqs3d, seqs2d, cams = [], [], []
        for i, n in enumerate(self.TRAIN_LENS):
            base = rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.3
            drift = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.05
            world = base + drift
            cam3d = np_world_to_camera(world, np.asarray(quats[0]),
                                       np.asarray(trans[0])).astype(np.float32)
            seqs3d.append(cam3d)
            cam = cam16_rows[i]
            seqs2d.append(np.asarray(project_to_2d(
                jnp.asarray(cam3d),
                jnp.broadcast_to(jnp.asarray(cam[:9]), (n, 9)))))
            cams.append(cam.astype(np.float32))

        def eval_seqs(lens, seed):
            r = np.random.RandomState(seed)
            s3, s2 = [], []
            for n in lens:
                s2.append(r.normal(size=(n, 16, 2)).astype(np.float32) * 0.3)
                s3.append((r.normal(size=(n, 16, 3)).astype(np.float32) * 0.3
                           + r.uniform(-1, 1, (n, 1, 3)).astype(np.float32)))
            return s3, s2
        h36m_3d, h36m_2d = eval_seqs(self.H36M_LENS, 81)
        dhp_3d, dhp_2d = eval_seqs(self.DHP_LENS, 82)
        templates = np.load(os.path.join(
            REPO, "data_extra", "bone_length_npy",
            "hm36s15678_bl_templates.npy"))
        return (quats, trans, intrs, cam16_rows, seqs3d, seqs2d, cams,
                h36m_3d, h36m_2d, dhp_3d, dhp_2d, templates)

    @staticmethod
    def _gan_pairs(lens):
        """GAN_video_ChunkedGenerator's (seq, start, end, flip) pairs at
        chunk_length=1 (video_mode_operate.py:45-57)."""
        return np.asarray([[i, s, s + 1, 0] for i, n in enumerate(lens)
                           for s in range(n)], dtype=np.int64)

    def test_four_epoch_composition(self, ref, monkeypatch, tmp_path):
        vmo = importlib.import_module("models_Fk_GAN.video_mode_operate")
        vgf = importlib.import_module("models_Fk_GAN.video_GAN_fun")
        uu = importlib.import_module("utils.utils")
        mf = importlib.import_module("models_Fk_GAN.mulit_farme_videopose")
        import types

        from tests.test_reference_parity import (_transplant_md2d,
                                                 _transplant_md3d,
                                                 _transplant_temporal)

        (quats, trans, intrs, cam16_rows, seqs3d, seqs2d, cams,
         h36m_3d, h36m_2d, dhp_3d, dhp_2d, templates) = self._sequences()
        args = self._args(tmp_path)
        B, F = self.B, self.F
        pad = (F - 1) // 2
        n_chunks = sum(self.TRAIN_LENS)
        n_batches = n_chunks // B
        assert n_chunks % B == 0

        import torch.utils.data as tud
        real_DataLoader = tud.DataLoader

        def _ordered_loader(*a, **k):
            k["shuffle"] = False
            k["generator"] = torch.Generator()
            return real_DataLoader(*a, **k)

        monkeypatch.setattr(vgf, "DataLoader", _ordered_loader)
        # the per-epoch real/fake video frame dumps are visualization only
        monkeypatch.setattr(vgf, "my_visual_GAN_video",
                            lambda *a, **k: None)
        _cpu_as_cuda(monkeypatch)
        monkeypatch.chdir(REPO)
        os.makedirs(os.path.join(str(tmp_path), "tmp"), exist_ok=True)
        device = torch.device("cpu")

        # --- reference models, SGD substituted
        torch.manual_seed(35)
        fk_class = ref.fk.Forward_Kinematics_DH_Model(args, [], None)
        ref_g = ref.gen.Video_Fk_Generator(F, fk_class, args, device)
        ref_g.train_num = 1
        torch.manual_seed(36)
        ref_d3 = ref.disc.Fk_3D_Discriminator(
            device, types.SimpleNamespace(Dis_DenseDim_3D=self.D))
        torch.manual_seed(37)
        ref_d2 = ref.disc.Fk_2D_Discriminator(
            types.SimpleNamespace(Dis_DenseDim_2D=self.D))
        torch.manual_seed(38)
        ref_md3 = ref.disc.Video_motion_Fk_3D_Discriminator(
            device, types.SimpleNamespace(
                video_Dis_DenseDim_3D=self.D,
                motion_Dis_whether_use_3dPos_branch=True,
                motion_Dis_whether_use_3dDiff_branch=True), F)
        torch.manual_seed(39)
        ref_md2 = ref.disc.Video_motion_Fk_2D_Discriminator(
            device, types.SimpleNamespace(video_Dis_DenseDim_2D=self.D), F)
        torch.manual_seed(40)
        model_pos = mf.multiFrame_TemporalModelOptimized1f(
            16, 2, 16, [3, 3], dropout=0.0, channels=64)
        _randomize_bn_stats(model_pos, np.random.RandomState(41))
        model_pos_eval = mf.multiFrame_TemporalModel(
            16, 2, 16, [3, 3], dropout=0.0, channels=64)

        poseFk_dict = {
            "model_G": ref_g, "model_d3d": ref_d3, "model_d2d": ref_d2,
            "model_motion_d3d": ref_md3, "model_motion_d2d": ref_md2,
            "optimizer_G": torch.optim.SGD(ref_g.parameters(), lr=self.LR_GAN),
            "optimizer_d3d": torch.optim.SGD(ref_d3.parameters(),
                                             lr=self.LR_GAN),
            "optimizer_d2d": torch.optim.SGD(ref_d2.parameters(),
                                             lr=self.LR_GAN),
            "optimizer_motion_d3d": torch.optim.SGD(ref_md3.parameters(),
                                                    lr=self.LR_GAN),
            "optimizer_motion_d2d": torch.optim.SGD(ref_md2.parameters(),
                                                    lr=self.LR_GAN),
        }
        posenet_optimizer = torch.optim.SGD(model_pos.parameters(),
                                            lr=args.lr_p)
        posenet_lr_scheduler = uu.get_scheduler(
            posenet_optimizer, policy="lambda", nepoch_fix=0,
            nepoch=args.epochs)
        criterion = ref.loss.mpjpe
        summary = uu.Summary(str(tmp_path))
        writer = _WriterStub()

        data_dict = {
            "poses_train": [s.copy() for s in seqs3d],
            "poses_train_2d": [s.copy() for s in seqs2d],
            "actions_train": [["a"] * len(s) for s in seqs3d],
            "cams_train": [c.copy() for c in cams],
            "train_det2d3d_loader": vmo.ChunkedGenerator(
                B, None, [s.copy() for s in seqs3d],
                [s.copy() for s in seqs2d], chunk_length=1, pad=pad,
                shuffle=False),
            "H36M_test": vmo.UnchunkedGenerator(None, h36m_3d, h36m_2d,
                                                pad=pad, augment=False),
            "mpi3d_loader": vmo.UnchunkedGenerator(None, dhp_3d, dhp_2d,
                                                   pad=pad, augment=False),
        }

        # probe the FK RandomState BEFORE any forward: every 'different'
        # scaler draw rides it (Fk_generator.py:383-390)
        probe = np.random.RandomState()
        probe.set_state(ref_g.FK_DH_Class.random.get_state())

        total_epochs = (args.epochs + args.warmup +
                        args.single_dis_warmup_epoch +
                        args.additional_train_epoch)

        # --- the reference's video per-epoch composition,
        #     run_Fk_GAN.py:245-315 verbatim (None-init bests, :226-227)
        ref_rows, ref_saves = [], []
        dhpp1_best = s911p1_best = None
        lr_now = 0
        h36m_p1 = h36m_p2 = dhp_p1 = dhp_p2 = PCK = AUC = 0
        for now_epoch in range(total_epochs):
            np.random.seed(500 + now_epoch)
            torch.manual_seed(800 + now_epoch)
            vmo.video_mode_dataloader_update(args=args, data_dict=data_dict,
                                             device=device)
            vgf.video_mode_GAN_solutions_FK_generator(
                args, poseFk_dict, data_dict, model_pos, summary, writer,
                ["S1"])
            if summary.epoch > (args.warmup + args.single_dis_warmup_epoch):
                vmo.GAN_dataSet_video_mode_train_posenet(
                    model_pos, data_dict["train_fake2d3d_loader"],
                    posenet_optimizer, criterion, device, args)
                (h36m_p1, h36m_p2, dhp_p1, dhp_p2, PCK,
                 AUC) = vmo.video_mode_evaluate_posenet(
                    args, data_dict, model_pos, model_pos_eval, device,
                    summary, writer, tag="_fake", get_pck_auc=True)
                ref_rows.append([summary.epoch, 0, h36m_p1, h36m_p2, dhp_p1,
                                 dhp_p2, PCK, AUC])
                vmo.video_mode_train_posenet(
                    model_pos, data_dict["train_det2d3d_loader"],
                    posenet_optimizer, criterion, device, args)
                (h36m_p1, h36m_p2, dhp_p1, dhp_p2, PCK,
                 AUC) = vmo.video_mode_evaluate_posenet(
                    args, data_dict, model_pos, model_pos_eval, device,
                    summary, writer, tag="_real", get_pck_auc=True)
                # in video mode the LR block sits INSIDE the training gate
                # (run_Fk_GAN.py:281-301)
                if now_epoch < (args.epochs + args.warmup +
                                args.single_dis_warmup_epoch):
                    posenet_lr_scheduler.step()
                    lr_now = posenet_optimizer.param_groups[0]["lr"]
                else:
                    for group in posenet_optimizer.param_groups:
                        group["lr"] *= args.additional_LR_decay
                    lr_now = posenet_optimizer.param_groups[0]["lr"]
            ref_rows.append([summary.epoch, lr_now, h36m_p1, h36m_p2,
                             dhp_p1, dhp_p2, PCK, AUC])
            if dhpp1_best is None or dhpp1_best > dhp_p1:
                dhpp1_best = dhp_p1
                ref_saves.append(("dhp", summary.epoch))
            if s911p1_best is None or s911p1_best > h36m_p1:
                s911p1_best = h36m_p1
                ref_saves.append(("h36m", summary.epoch))
            summary.summary_epoch_update()

        # --- rebuild side ---------------------------------------------------
        import optax

        from dhaug_tpu.data.chunked import UnchunkedSequences
        from dhaug_tpu.gan.video import make_video_steps
        from dhaug_tpu.gan.wgan import GanHyper
        from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                     Fk3DDiscriminator,
                                                     MotionFk2DDiscriminator,
                                                     MotionFk3DDiscriminator)
        from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
        from dhaug_tpu.models.posenets import TemporalPoseNet
        from dhaug_tpu.ops.bones import reskin_pose
        from dhaug_tpu.ops.camera import project_to_2d
        from dhaug_tpu.train.posenet import (evaluate_sequences,
                                             make_posenet_eval_step,
                                             make_posenet_train_step,
                                             root_relative)
        from dhaug_tpu.train.state import lambda_lr, make_state
        from dhaug_tpu.train.video_runner import _video_eval_batches

        cfg = GeneratorConfig(dense_dim=self.D, use_pre_angle=True,
                              use_global_rot=True, video_frames=F)
        gen = FkGeneratorNet(cfg)
        d3d = Fk3DDiscriminator(dense_dim=self.D)
        d2d = Fk2DDiscriminator(dense_dim=self.D)
        md3d = MotionFk3DDiscriminator(video_frames=F, dense_dim=self.D,
                                       use_pos_branch=True,
                                       use_diff_branch=True)
        md2d = MotionFk2DDiscriminator(video_frames=F, dense_dim=self.D)
        mine_pos = TemporalPoseNet(filter_widths=(3, 3), out_joints=16,
                                   channels=64, strided=True, dropout=0.0)
        mine_eval = TemporalPoseNet(filter_widths=(3, 3), out_joints=16,
                                    channels=64, strided=False, dropout=0.0)

        gen_params = gen.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 128)))["params"]
        d3_params = d3d.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 16, 3)))["params"]
        d2_params = d2d.init(jax.random.PRNGKey(0),
                             jnp.zeros((2, 16, 2)))["params"]
        md3_params = md3d.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, F, 16, 3)))["params"]
        md2_params = md2d.init(jax.random.PRNGKey(0),
                               jnp.zeros((2, F, 16, 2)))["params"]
        pos_vars = mine_pos.init({"params": jax.random.PRNGKey(0),
                                  "dropout": jax.random.PRNGKey(1)},
                                 jnp.zeros((2, F, 16, 2)), train=False)
        pos_params, pos_stats = pos_vars["params"], pos_vars["batch_stats"]

        # initial-weight transplant from fresh same-seed reference modules
        torch.manual_seed(35)
        fk2 = ref.fk.Forward_Kinematics_DH_Model(args, [], None)
        g0 = ref.gen.Video_Fk_Generator(F, fk2, args, device)
        torch.manual_seed(36)
        d30 = ref.disc.Fk_3D_Discriminator(
            device, types.SimpleNamespace(Dis_DenseDim_3D=self.D))
        torch.manual_seed(37)
        d20 = ref.disc.Fk_2D_Discriminator(
            types.SimpleNamespace(Dis_DenseDim_2D=self.D))
        torch.manual_seed(38)
        md30 = ref.disc.Video_motion_Fk_3D_Discriminator(
            device, types.SimpleNamespace(
                video_Dis_DenseDim_3D=self.D,
                motion_Dis_whether_use_3dPos_branch=True,
                motion_Dis_whether_use_3dDiff_branch=True), F)
        torch.manual_seed(39)
        md20 = ref.disc.Video_motion_Fk_2D_Discriminator(
            device, types.SimpleNamespace(video_Dis_DenseDim_2D=self.D), F)
        torch.manual_seed(40)
        pos0 = mf.multiFrame_TemporalModelOptimized1f(
            16, 2, 16, [3, 3], dropout=0.0, channels=64)
        _randomize_bn_stats(pos0, np.random.RandomState(41))
        _transplant_gen_trunk(g0, gen_params)
        _transplant_d3d(d30, d3_params)
        _transplant_d2d(d20, d2_params)
        _transplant_md3d(md30, md3_params)
        _transplant_md2d(md20, md2_params)
        _transplant_temporal(pos0, pos_params, pos_stats, n_blocks=1)

        hyper = GanHyper(flip=False, bone_len_scaler="different",
                         use_pallas_fk=False)
        tx = optax.sgd(self.LR_GAN)
        steps = make_video_steps(
            lambda p, x: gen.apply({"params": p}, x),
            lambda p, x: d3d.apply({"params": p}, x),
            lambda p, x: d2d.apply({"params": p}, x),
            lambda p, x: md3d.apply({"params": p}, x),
            lambda p, x: md2d.apply({"params": p}, x),
            tx, tx, tx, tx, tx, cfg, hyper, quats, trans, intrs,
            playback=False)
        gen_state = make_state(tx, gen_params)
        d3_state = make_state(tx, d3_params)
        d2_state = make_state(tx, d2_params)
        md3_state = make_state(tx, md3_params)
        md2_state = make_state(tx, md2_params)

        forward, flip_forward = make_posenet_eval_step(mine_eval)
        h36m_loader = UnchunkedSequences(None, h36m_3d, h36m_2d, pad=pad)
        dhp_loader = UnchunkedSequences(None, dhp_3d, dhp_2d, pad=pad)

        def eval_both(params, stats):
            h = evaluate_sequences(forward, params, stats,
                                   _video_eval_batches(h36m_loader,
                                                       batch_size=4))
            d = evaluate_sequences(forward, params, stats,
                                   _video_eval_batches(dhp_loader,
                                                       batch_size=4),
                                   flip_forward=flip_forward)
            return h, d

        # my twin of the FK RandomState (one draw per generator forward)
        my_probe = np.random.RandomState()
        my_probe.set_state(probe.get_state())

        def draw_scaler():
            return (my_probe.randint(-200, 200, size=(B, 8))
                    / 1000.0).astype(np.float32)

        # GAN chunk windows: the fresh RandomState(1234) permutation every
        # epoch (video_mode_operate.py:73,107) over the chunk pairs
        pairs = self._gan_pairs(self.TRAIN_LENS)
        perm = np.random.RandomState(1234).permutation(pairs)

        # real posenet loader windows (ChunkedGenerator, shuffle=False):
        # pairs in sequence order over the ORIGINAL sequences
        pad2d_orig = [np.pad(s, ((pad, pad), (0, 0), (0, 0)), "edge")
                      for s in seqs2d]

        def real_batches():
            for b in range(n_batches):
                rows = pairs[b * B:(b + 1) * B]
                b2d = np.stack([pad2d_orig[i][s:s + F]
                                for i, s, *_ in rows])
                b3d = np.stack([seqs3d[i][s:s + 1] for i, s, *_ in rows])
                yield b2d, b3d

        key = jax.random.PRNGKey(9)   # unused entropy; all draws injected
        zero_a = {n: jnp.zeros((n, 1), jnp.float32) for n in (B, B * F)}

        my_rows, my_saves = [], []
        my_dhp_best = my_h36m_best = None
        lr_cur = args.lr_p
        lr_log = 0
        sched_steps = 0
        scores = [0.0] * 6
        train_iter_num = 0
        n_gen_updates = 0
        for e in range(total_epochs):
            use_motion = e >= args.single_dis_warmup_epoch
            rs = np.random.RandomState(500 + e)
            tmpl_rows = [rs.choice(templates.shape[0], 1)
                         for _ in self.TRAIN_LENS]
            torch.manual_seed(800 + e)
            iters = []
            for it in range(n_batches):
                noise = torch.randn(B, 128).numpy()
                a_d3 = torch.rand(B * F, 1).numpy()
                a_m3 = torch.rand(B, 1).numpy() if use_motion else None
                gnoise = None
                if train_iter_num % 5 == 4:
                    pass  # gen noise drawn AFTER the 2D alphas (:432)
                subj = rs.randint(0, 1)
                cam_id = rs.randint(0, 4)
                a_d2 = torch.rand(B * F, 1).numpy()
                a_m2 = torch.rand(B * F, 1).numpy() if use_motion else None
                if train_iter_num % 5 == 4:
                    gnoise = torch.randn(B, 128).numpy()
                assert subj == 0
                iters.append((noise, a_d3, a_m3, a_d2, a_m2, gnoise, cam_id))
                train_iter_num += 1

            # per-sequence re-skin + reprojection (video_mode_random_bl_aug
            # consumes the ORIGINAL raw lists every epoch)
            re3d, re2d = [], []
            for i, seq in enumerate(seqs3d):
                lens15 = templates[tmpl_rows[i]]          # (1, 15) broadcast
                new = np.asarray(reskin_pose(jnp.asarray(seq),
                                             jnp.asarray(lens15)))
                re3d.append(new)
                re2d.append(np.asarray(project_to_2d(
                    jnp.asarray(new),
                    jnp.broadcast_to(jnp.asarray(cams[i][:9]),
                                     (len(new), 9)))))
            pad3d = [np.pad(s, ((pad, pad), (0, 0), (0, 0)), "edge")
                     for s in re3d]
            pad2d = [np.pad(s, ((pad, pad), (0, 0), (0, 0)), "edge")
                     for s in re2d]

            # GAN epoch over the permuted chunk windows
            fake3d_buf, fake2d_buf = [], []
            for it, (noise, a_d3, a_m3, a_d2, a_m2, gnoise,
                     cam_id) in enumerate(iters):
                rows = perm[it * B:(it + 1) * B]
                clip3d = np.stack([pad3d[i][s:s + F] for i, s, *_ in rows])
                clip2d = np.stack([pad2d[i][s:s + F] for i, s, *_ in rows])
                bcam = np.stack([cams[i] for i, *_ in rows])
                alphas = [zero_a[B * F], zero_a[B], zero_a[B], zero_a[B * F],
                          zero_a[B], zero_a[B], zero_a[B * F], zero_a[B * F],
                          zero_a[B * F], zero_a[B * F], zero_a[B * F],
                          zero_a[B * F]]
                alphas[0] = jnp.asarray(a_d3)
                if use_motion:
                    alphas[1] = jnp.asarray(a_m3)
                alphas[6] = jnp.asarray(a_d2)
                if use_motion:
                    alphas[7] = jnp.asarray(a_m2)
                scaler_c = draw_scaler()   # critic-phase forward draw
                (d3_state, d2_state, md3_state, md2_state, _, bone_len,
                 fake_cam3d, fake_2d, _, _) = steps.critics_step(
                    d3_state, d2_state, md3_state, md2_state,
                    gen_state.params, jnp.asarray(clip3d),
                    jnp.asarray(bcam), jnp.asarray(clip2d), key,
                    use_motion=use_motion, noise=jnp.asarray(noise),
                    scaler8=jnp.asarray(scaler_c),
                    cam_idx=jnp.asarray(cam_id), alphas=tuple(alphas))
                if gnoise is not None:
                    scaler_g = draw_scaler()   # generator forward draw
                    gen_state, _ = steps.generator_step(
                        gen_state, d3_state.params, d2_state.params,
                        md3_state.params, md2_state.params, bone_len,
                        jnp.asarray(cam_id), key, use_motion=use_motion,
                        noise=jnp.asarray(gnoise),
                        scaler8=jnp.asarray(scaler_g))
                    n_gen_updates += 1
                fake3d_buf.append(np.asarray(fake_cam3d))
                fake2d_buf.append(np.asarray(fake_2d))

            if e > args.warmup + args.single_dis_warmup_epoch:
                tx_pos = optax.chain(optax.clip_by_global_norm(1.0),
                                     optax.sgd(lr_cur))
                pstep = make_posenet_train_step(mine_pos, tx_pos, "mpjpe")
                pstate = make_state(tx_pos, pos_params, pos_stats)
                # fake pass: centre-frame targets (video_mode_PoseDataSet
                # __getitem__ takes used_3D_ID; GAN_dataSet_..._train_posenet
                # root-centres them)
                centre = (F - 1) // 2
                for f3d, f2d in zip(fake3d_buf, fake2d_buf):
                    t3d = f3d[:, centre:centre + 1]       # (B, 1, 16, 3)
                    pstate, _ = pstep(pstate, jnp.asarray(f2d),
                                      root_relative(jnp.asarray(t3d)), key)
                pos_params, pos_stats = pstate.params, pstate.batch_stats
                h36m, dhp = eval_both(pos_params, pos_stats)
                my_rows.append([e, 0, h36m["p1"], h36m["p2"], dhp["p1"],
                                dhp["p2"], dhp["pck"], dhp["auc"]])
                # real pass over the unshuffled ChunkedGenerator windows
                pstate = make_state(tx_pos, pos_params, pos_stats)
                for b2d, b3d in real_batches():
                    pstate, _ = pstep(pstate, jnp.asarray(b2d),
                                      root_relative(jnp.asarray(b3d)), key)
                pos_params, pos_stats = pstate.params, pstate.batch_stats
                h36m, dhp = eval_both(pos_params, pos_stats)
                scores = [h36m["p1"], h36m["p2"], dhp["p1"], dhp["p2"],
                          dhp["pck"], dhp["auc"]]
                # LR step INSIDE the gate, video style
                if e < (args.epochs + args.warmup +
                        args.single_dis_warmup_epoch):
                    sched_steps += 1
                    lr_cur = lambda_lr(args.lr_p, sched_steps, args.epochs)
                    lr_log = lr_cur
                else:
                    lr_cur = lr_cur * args.additional_LR_decay
                    lr_log = lr_cur
            my_rows.append([e, lr_log, *scores])
            if my_dhp_best is None or my_dhp_best > scores[2]:
                my_dhp_best = scores[2]
                my_saves.append(("dhp", e))
            if my_h36m_best is None or my_h36m_best > scores[0]:
                my_h36m_best = scores[0]
                my_saves.append(("h36m", e))

        # --- the verdict ----------------------------------------------------
        assert n_gen_updates == 3 and train_iter_num == n_batches * total_epochs
        assert ref_rows[-1][2] > 0 and my_rows[-1][2] > 0
        assert len(my_rows) == len(ref_rows)
        np.testing.assert_allclose(np.asarray(my_rows, np.float64),
                                   np.asarray(ref_rows, np.float64),
                                   rtol=1e-3, atol=5e-3)
        assert my_saves == ref_saves

        for transplant, params_now, ref_model, tol in (
                (_transplant_gen_trunk, gen_state.params, ref_g, 1e-4),
                (_transplant_d3d, d3_state.params, ref_d3, 1e-4),
                (_transplant_d2d, d2_state.params, ref_d2, 1e-4),
                (_transplant_md3d, md3_state.params, ref_md3, 1e-4),
                (_transplant_md2d, md2_state.params, ref_md2, 1e-4)):
            after = _snapshot(params_now)
            transplant(ref_model, after)
            assert _tree_max_diff(params_now, after) < tol
        p_after, s_after = _snapshot(pos_params), _snapshot(pos_stats)
        _transplant_temporal(model_pos, p_after, s_after, n_blocks=1)
        assert _tree_max_diff(pos_params, p_after) < 1e-4
        assert _tree_max_diff(pos_stats, s_after) < 1e-4
