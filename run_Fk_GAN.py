#!/usr/bin/env python
"""FK-GAN augmented posenet training (single-frame and video modes).

CLI-compatible rebuild of DH-AUG_master/run_Fk_GAN.py: a WGAN-GP whose
generator drives the DH forward-kinematics skeleton synthesizes (2D, 3D)
pose pairs that co-train any posenet of the zoo, with per-epoch bone-length
re-skin of the real data, flip/playback augmentation axes, and H36M + 3DHP
evaluation.

Examples (reference README commands port verbatim):
    python run_Fk_GAN.py --note FK_GAN_16_hardem --posenet_name mlp \
        --lr_p 1e-3 --keypoints gt --batch_size 1024 \
        --data_enhancement_method GAN --single_or_multi_train_mode single
    python run_Fk_GAN.py --posenet_name mulit_farme_videopose \
        --single_or_multi_train_mode multi --architecture 3,3 --batch_size 512
"""
from __future__ import annotations

import sys

import numpy as np


def single_frame_mode_main(args, bundle, train_subjects):
    import jax

    from dhaug_tpu.gan.single_frame import (build_gan, reskin_dataset,
                                            run_gan_epoch)
    from dhaug_tpu.gan.traditional import (TraditionalConfig,
                                           generate_traditional_poses,
                                           project_through_cameras)
    from dhaug_tpu.gan.wgan import camera_bank
    from dhaug_tpu.data.loaders import PoseDataset, PoseTarget
    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.data_prep import world_pose_pool
    from dhaug_tpu.train.posenet import (make_posenet_epoch_fn,
                                         train_epoch_scan)
    from dhaug_tpu.train.runners import (make_eval_both_scan, make_logger,
                                         make_run_dir, write_eval_scalars)
    from dhaug_tpu.train.state import (adam_posenet, lambda_lr, make_state,
                                       set_learning_rate)
    from dhaug_tpu.utils.checkpoint import save_ckpt

    np_rng = np.random.default_rng(args.random_seed)
    key = jax.random.PRNGKey(args.random_seed)

    from dhaug_tpu.parallel.mesh import mesh_from_args
    mesh = mesh_from_args(args)

    print("==> Creating PoseNet model...")
    model = make_posenet(args.posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton())
    key, k_init = jax.random.split(key)
    params, batch_stats = init_posenet(model, k_init,
                                       bundle.train_det2d3d.poses_2d[:2])
    pos_tx = adam_posenet(args.lr_p, max_norm=1.0 if args.max_norm else 1e9)
    pos_state = make_state(pos_tx, params, batch_stats)
    pos_epoch_fn = make_posenet_epoch_fn(model, pos_tx, criterion="mse",
                                         flip=args.flip_pos_model_input)
    # one compiled scan program per evaluation set (H36M + 3DHP) — a single
    # dispatch each instead of ~100 per-batch round trips per epoch
    eval_both = make_eval_both_scan(model, bundle, args.batch_size,
                                    mesh=mesh)
    # static real train split: device-resident across all epochs
    dev_real_2d = jax.numpy.asarray(bundle.train_det2d3d.poses_2d)
    dev_real_3d = jax.numpy.asarray(bundle.train_det2d3d.poses_3d)

    key, k_gan = jax.random.split(key)
    gan = build_gan(args, train_subjects, k_gan, mesh=mesh) \
        if args.data_enhancement_method == "GAN" else None

    run_dir = make_run_dir(args)
    print(f"==> Making checkpoint dir: {run_dir}")
    logger, summary = make_logger(run_dir, args)

    # bone-length templates for the per-epoch re-skin
    import os
    tmpl_path = os.path.join(args.data_root, "data_extra", "bone_length_npy",
                             "hm36s15678_bl_templates.npy")
    templates = np.load(tmpl_path)

    pose_pool = None
    cam_q = cam_t = cam_i = None
    if args.data_enhancement_method == "normal":
        pose_pool = world_pose_pool(bundle, seed=args.random_seed)
        cam_q, cam_t, cam_i = camera_bank(train_subjects)

    gt2d3d = bundle.train_gt2d3d
    dhpp1_best = None
    s911p1_best = None
    lr_now = 0.0
    scores = {"h36m": {"p1": 0, "p2": 0}, "dhp": {"p1": 0, "p2": 0, "pck": 0, "auc": 0}}
    start_epoch = 0

    # Full-state resume (the reference's --resume/--GAN_resume flags have no
    # load path, SURVEY.md §5; here the complete training state round-trips).
    from dhaug_tpu.utils.checkpoint import load_snapshot, restore_into
    resume_path = args.resume or args.GAN_resume
    if resume_path:
        saved = load_snapshot(resume_path)
        pos_state = restore_into(pos_state, saved["pos_state"])
        if gan is not None and "gen_state" in saved:
            gan = gan._replace(
                gen_state=restore_into(gan.gen_state, saved["gen_state"]),
                d3d_state=restore_into(gan.d3d_state, saved["d3d_state"]),
                d2d_state=restore_into(gan.d2d_state, saved["d2d_state"]))
        summary.load_state_dict(saved["summary"])
        np_rng.bit_generator.state = saved["np_rng"]
        key = jax.numpy.asarray(saved["key"])
        start_epoch = int(saved["epoch"]) + 1
        summary.epoch = start_epoch  # the snapshot is taken pre-increment
        lr_now = float(saved.get("lr_now", 0.0))
        dhpp1_best = saved.get("dhpp1_best")
        s911p1_best = saved.get("s911p1_best")
        print(f"==> Resumed from {resume_path} at epoch {start_epoch}")

    def full_state_ckpt(now_epoch):
        state = {"epoch": now_epoch, "lr_now": lr_now,
                 "dhpp1_best": dhpp1_best, "s911p1_best": s911p1_best,
                 "pos_state": pos_state, "summary": summary.state_dict(),
                 "np_rng": np_rng.bit_generator.state,
                 "key": np.asarray(key)}
        if gan is not None:
            state.update({"gen_state": gan.gen_state,
                          "d3d_state": gan.d3d_state,
                          "d2d_state": gan.d2d_state})
        return state

    fake_ds = None
    for now_epoch in range(start_epoch, args.epochs + args.additional_train_epoch):
        if args.data_enhancement_method == "GAN":
            # per-epoch bone-length re-skin of the real data feeding the GAN.
            # (The reference also runs this in 'normal' mode where nothing
            # consumes the result, run_Fk_GAN.py:113-114 — skipped here.)
            gt2d3d = reskin_dataset(bundle.train_gt2d3d, templates, np_rng)
            target_2d = PoseTarget(gt2d3d.poses_2d)
            target_3d = PoseTarget(gt2d3d.poses_3d)

            key, k_epoch = jax.random.split(key)
            record_dir = f"{run_dir}/tmp" if args.record_all_picture else None
            gan, fake_ds = run_gan_epoch(gan, gt2d3d, target_2d, target_3d,
                                         args.batch_size, np_rng, k_epoch,
                                         summary, summary.writer,
                                         record_dir=record_dir, mesh=mesh)
        elif args.data_enhancement_method == "normal":
            key, k_trad = jax.random.split(key)
            cfg = TraditionalConfig(
                n_poses=args.generator_whole_number,
                use_dataset_bone_len=args.generator_choose_BoneLen,
                use_dataset_root=args.generator_choose_root_pos,
                use_global_rot=args.generator_global_rot,
                bone_len_scaler=args.bone_len_scaler)
            pose16, *_ = generate_traditional_poses(k_trad,
                                                    np.asarray(pose_pool), cfg)
            f3d, f2d = project_through_cameras(pose16, cam_q, cam_t, cam_i)
            fake_ds = PoseDataset(np.asarray(f3d), np.asarray(f2d),
                                  np.zeros((f3d.shape[0], 1), np.float32))

        if args.record_all_picture and fake_ds is not None:
            from dhaug_tpu.utils.viz import (plot_fake_real_pairs_3d,
                                             plot_paper_pose2d,
                                             plot_paper_pose3d_row,
                                             plot_pose_grid_2d,
                                             plot_pose_grid_3d)
            import os.path as osp
            # np.asarray: ONE bulk device fetch — the plotters index per
            # skeleton edge, which on a device array would pay a ~35 ms
            # tunnel round trip per element access (CLAUDE.md)
            plot_pose_grid_3d(np.asarray(fake_ds.poses_3d[:16]),
                              osp.join(run_dir, "tmp", f"fake3d_ep{summary.epoch}.jpg"),
                              title=f"fake 3D, epoch {summary.epoch}")
            # 'for paper' clean dumps + fake-vs-real pair grid
            # (special_operate.py:604-734)
            plot_paper_pose3d_row(
                np.asarray(fake_ds.poses_3d[:3]),
                osp.join(run_dir, "tmp", f"paper_fake3d_ep{summary.epoch}.jpg"))
            plot_paper_pose2d(
                np.asarray(fake_ds.poses_2d[0]),
                osp.join(run_dir, "tmp", f"paper_fake2d_ep{summary.epoch}.jpg"))
            plot_fake_real_pairs_3d(
                np.asarray(fake_ds.poses_3d[:4]),
                np.asarray(gt2d3d.poses_3d[:4]),
                osp.join(run_dir, "tmp", f"pairs3d_ep{summary.epoch}.jpg"),
                title=f"fake vs real, epoch {summary.epoch}")
            plot_pose_grid_2d(np.asarray(fake_ds.poses_2d[:16]),
                              osp.join(run_dir, "tmp", f"fake2d_ep{summary.epoch}.jpg"),
                              title=f"fake 2D, epoch {summary.epoch}")
            # the reference dumps REAL frames next to the fake ones every
            # epoch too (video_GAN_fun.py:590-600)
            plot_pose_grid_3d(np.asarray(gt2d3d.poses_3d[:16]),
                              osp.join(run_dir, "tmp", f"real3d_ep{summary.epoch}.jpg"),
                              title=f"real (re-skinned) 3D, epoch {summary.epoch}")
            plot_pose_grid_2d(np.asarray(gt2d3d.poses_2d[:16]),
                              osp.join(run_dir, "tmp", f"real2d_ep{summary.epoch}.jpg"),
                              title=f"real (re-skinned) 2D, epoch {summary.epoch}")

        train_now = (summary.epoch > args.warmup and
                     args.data_enhancement_method == "GAN") or \
            args.data_enhancement_method == "normal"
        if train_now and fake_ds is not None:
            key, k1 = jax.random.split(key)
            pos_state, _ = train_epoch_scan(pos_epoch_fn, pos_state,
                                            fake_ds.poses_2d, fake_ds.poses_3d,
                                            np_rng, args.batch_size, k1,
                                            mesh=mesh)
            h36m, dhp = eval_both(pos_state.params, pos_state.batch_stats)
            logger.append([summary.epoch, 0, h36m["p1"], h36m["p2"],
                           dhp["p1"], dhp["p2"], dhp["pck"], dhp["auc"]])
            write_eval_scalars(summary.writer, summary.epoch, h36m, dhp, "_fake")
            scores = {"h36m": h36m, "dhp": dhp}

        if train_now or args.data_enhancement_method == "NO_enhance":
            key, k2 = jax.random.split(key)
            pos_state, _ = train_epoch_scan(pos_epoch_fn, pos_state,
                                            dev_real_2d, dev_real_3d,
                                            np_rng, args.batch_size, k2,
                                            mesh=mesh)
            h36m, dhp = eval_both(pos_state.params, pos_state.batch_stats)
            write_eval_scalars(summary.writer, summary.epoch, h36m, dhp, "_real")
            scores = {"h36m": h36m, "dhp": dhp}

        # posenet LR: linear decay for args.epochs, then x additional_LR_decay
        if now_epoch < args.epochs:
            lr_now = lambda_lr(args.lr_p, now_epoch + 1, args.epochs)
        else:
            lr_now = lr_now * args.additional_LR_decay
        pos_state = set_learning_rate(pos_state, lr_now)
        print(f"\nEpoch: {summary.epoch} | LR: {lr_now:.8f} "
              f"| H36M P1 {scores['h36m']['p1']:.2f} "
              f"| 3DHP P1 {scores['dhp']['p1']:.2f}")

        h36m, dhp = scores["h36m"], scores["dhp"]
        logger.append([summary.epoch, lr_now, h36m["p1"], h36m["p2"],
                       dhp["p1"], dhp["p2"],
                       dhp.get("pck", 0), dhp.get("auc", 0)])

        ckpt = {"epoch": summary.epoch, "model_pos": pos_state.params,
                "batch_stats": pos_state.batch_stats,
                "posenet_name": args.posenet_name}
        if dhp["p1"] and (dhpp1_best is None or dhpp1_best > dhp["p1"]):
            dhpp1_best = dhp["p1"]
            logger.record_args(
                f"==> Saving checkpoint at epoch '{summary.epoch}', "
                f"with dhp_p1 {dhpp1_best}")
            save_ckpt(ckpt, run_dir, suffix="best_dhp_p1")
        if h36m["p1"] and (s911p1_best is None or s911p1_best > h36m["p1"]):
            s911p1_best = h36m["p1"]
            save_ckpt(ckpt, run_dir, suffix="best_h36m_p1")

        if (summary.epoch + 1) % max(args.snapshot, 1) == 0:
            from dhaug_tpu.utils.checkpoint import save_snapshot
            save_snapshot(full_state_ckpt(now_epoch), run_dir,
                          suffix="resume_latest", fmt=args.ckpt_format)
        summary.epoch += 1

    if args.record_all_picture and summary.epoch_scalar_history:
        from dhaug_tpu.utils.viz import plot_scalar_curves
        plot_scalar_curves(summary.epoch_scalar_history,
                           f"{run_dir}/wasserstein_curves.png",
                           title="GAN critic curves (epoch means)")
    logger.close()
    return scores


def main(argv=None):
    from dhaug_tpu.train.config import parse_aug_args
    args = parse_aug_args(argv)

    if args.pretrain:
        # The reference's --pretrain intent (run_Fk_GAN.py:107,238 +
        # model_pos_preparation.py:72-83): load a pretrained posenet and
        # skip training, evaluating once.  Its loader globs a hardcoded
        # EMPTY path (bit-rotted, crashes) and the single-frame branch is
        # `pass`; here both modes delegate to run_evaluate's working
        # eval-only path with the checkpoint from --evaluate.
        if not args.evaluate:
            raise SystemExit("--pretrain true requires --evaluate "
                             "<posenet checkpoint>")
        import run_evaluate
        fwd = ["--evaluate", args.evaluate,
               "--posenet_name", args.posenet_name,
               "--architecture", args.architecture,
               "--stages", str(args.stages),
               "--dropout", str(args.dropout),
               "--batch_size", str(args.batch_size),
               "--downsample", str(args.downsample),
               "--data_root", args.data_root,
               "--keypoints", args.keypoints,
               "--synthetic_data", str(bool(args.synthetic_data)).lower(),
               # (no --s1s5only: the baseline parser lacks it, like the
               # reference's; the train-subject subset is irrelevant to the
               # S9/S11 + 3DHP evaluation anyway)
               "--s1only", str(bool(args.s1only)).lower()]
        if args.jax_platform:
            fwd += ["--jax_platform", args.jax_platform]
        print("==> --pretrain true: evaluating the pretrained posenet "
              "(no training)")
        return run_evaluate.main(fwd)

    from dhaug_tpu.train.runners import setup_jax
    setup_jax(args)

    from dhaug_tpu.train.data_prep import prepare_data, train_subject_list

    train_subjects = train_subject_list(args)

    print("==> Loading dataset...")
    if args.single_or_multi_train_mode == "single":
        bundle = prepare_data(args, per_frame_cam=True)
        from dhaug_tpu.train.runners import cache_eval_arrays
        cache_eval_arrays(bundle)
        return single_frame_mode_main(args, bundle, train_subjects)
    elif args.single_or_multi_train_mode == "multi":
        from dhaug_tpu.train.video_runner import video_mode_main
        return video_mode_main(args, train_subjects)
    raise SystemExit("--single_or_multi_train_mode must be single|multi")


if __name__ == "__main__":
    main(sys.argv[1:])
