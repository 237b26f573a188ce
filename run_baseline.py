#!/usr/bin/env python
"""Baseline posenet training (no augmentation).

CLI-compatible rebuild of DH-AUG_master/run_baseline.py (whose data path is
bit-rotted in the reference, SURVEY.md §2.2 — this one runs).  Trains a
posenet on real H36M 2D->3D pairs with the step-decayed Adam schedule and
evaluates on H36M S9/S11 and MPI-INF-3DHP every epoch.  `--pretrain true
--evaluate <ckpt>` warm-starts training from a posenet checkpoint (native or
reference .pth.tar) — the reference factory's intent
(model_pos_preparation.py:72-83), whose own loader is bit-rotted.

Example:
    python run_baseline.py --posenet_name videopose --keypoints gt \
        --epochs 50 --batch_size 1024 --synthetic_data true
"""
from __future__ import annotations

import sys

import numpy as np


def main(argv=None):
    from dhaug_tpu.train.config import parse_baseline_args
    args = parse_baseline_args(argv)

    if args.pretrain and not args.evaluate:
        # The reference consumes --pretrain in its posenet factory
        # (model_pos_preparation.py:72-83): load pretrained posenet weights,
        # then the training loop RUNS from them (warm-start fine-tuning —
        # the flag's help says 'used in poseaug').  Its loader globs a
        # hardcoded EMPTY path and crashes; here the checkpoint comes from
        # --evaluate (native .ckpt/orbax or a reference .pth.tar).
        # run_Fk_GAN's --pretrain keeps its distinct eval-only semantics
        # (run_Fk_GAN.py:107,238).
        raise SystemExit("--pretrain true requires --evaluate "
                         "<posenet checkpoint>")

    from dhaug_tpu.train.runners import setup_jax
    setup_jax(args)

    import jax

    import jax.numpy as jnp

    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.data_prep import prepare_data
    from dhaug_tpu.train.posenet import (make_posenet_epoch_fn,
                                         train_epoch_scan)
    from dhaug_tpu.train.runners import (make_eval_both_scan, make_logger,
                                         make_run_dir)
    from dhaug_tpu.train.state import (adam_posenet, make_state,
                                       set_learning_rate, step_exp_lr)
    from dhaug_tpu.utils.checkpoint import save_snapshot

    np_rng = np.random.default_rng(args.random_seed)
    key = jax.random.PRNGKey(args.random_seed)

    from dhaug_tpu.parallel.mesh import mesh_from_args
    mesh = mesh_from_args(args)

    print("==> Loading dataset...")
    bundle = prepare_data(args)
    from dhaug_tpu.train.runners import cache_eval_arrays
    cache_eval_arrays(bundle)

    print(f"==> Creating model: {args.posenet_name}")
    model = make_posenet(args.posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton())
    key, k_init = jax.random.split(key)
    example = bundle.train_det2d3d.poses_2d[:2]
    params, batch_stats = init_posenet(model, k_init, example)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"==> Total parameters: {n_params / 1e6:.2f}M")

    if args.pretrain:
        # warm-start fine-tuning: load the posenet weights, then TRAIN from
        # them (the reference factory's intent, model_pos_preparation.py:72-83
        # feeding the training loop at run_baseline.py:50)
        from dhaug_tpu.utils.checkpoint import (load_snapshot,
                                                resolve_posenet_weights)
        from dhaug_tpu.utils.transplant import (is_torch_checkpoint,
                                                load_torch_checkpoint,
                                                transplant_posenet_state_dict)
        if is_torch_checkpoint(args.evaluate):
            params, batch_stats = transplant_posenet_state_dict(
                args.posenet_name, load_torch_checkpoint(args.evaluate),
                params, batch_stats)
        else:
            # same layout resolution as run_evaluate.py — including the
            # full-state 'pos_state' of --snapshot/--resume checkpoints
            params, batch_stats = resolve_posenet_weights(
                load_snapshot(args.evaluate), params, batch_stats)
        print(f"==> Pretrained posenet loaded from {args.evaluate} "
              "(warm-start fine-tuning)")

    tx = adam_posenet(args.lr, max_norm=1.0 if args.max_norm else 1e9)
    state = make_state(tx, params, batch_stats)
    epoch_fn = make_posenet_epoch_fn(model, tx, criterion="mse",
                                     flip=args.flip_pos_model_input)
    # single-dispatch scan evaluation per set (H36M + 3DHP)
    eval_both = make_eval_both_scan(model, bundle, args.batch_size,
                                    mesh=mesh)
    # the train split is static: upload once for every epoch's index gathers
    if getattr(args, "train_npz", ""):
        # DH-3DHP workflow: a synthesized dataset
        # (scripts/synthesize_dataset.py) either MIXED into the real train
        # split (--train_npz_mode mix, default — the reference's released
        # DH-3DHP download is an augmentation add-on, README.md:104-106) or
        # trained on alone (replace); evaluation stays on the real sets
        synth = np.load(args.train_npz)
        for key_name in ("pose3d", "pose2d"):
            if key_name not in synth:
                raise SystemExit(
                    f"--train_npz {args.train_npz} is missing '{key_name}' "
                    "(expected a scripts/synthesize_dataset.py output)")
        s2d = synth["pose2d"].astype(np.float32)
        s3d = synth["pose3d"].astype(np.float32)
        mode = getattr(args, "train_npz_mode", "mix")
        if mode == "mix":
            # concatenate; train_epoch_scan's per-epoch permutation shuffles
            # real and synthesized pairs together, like the GAN schedule's
            # interleaving at dataset granularity
            s2d = np.concatenate([bundle.train_det2d3d.poses_2d, s2d])
            s3d = np.concatenate([bundle.train_det2d3d.poses_3d, s3d])
            print(f"==> Mixing {synth['pose3d'].shape[0]} synthesized poses "
                  f"into {bundle.train_det2d3d.poses_2d.shape[0]} real "
                  f"training pairs ({args.train_npz})")
        else:
            print(f"==> Training on synthesized dataset {args.train_npz} "
                  f"ALONE: {s3d.shape[0]} poses")
        if s3d.shape[0] < args.batch_size:
            raise SystemExit(
                f"--train_npz {args.train_npz} ({mode}) yields only "
                f"{s3d.shape[0]} poses < --batch_size "
                f"{args.batch_size}: zero training steps per epoch. "
                "Synthesize more poses or lower --batch_size.")
        dev2d = jnp.asarray(s2d)
        dev3d = jnp.asarray(s3d)
        n_train = dev2d.shape[0]
    else:
        dev2d = jnp.asarray(bundle.train_det2d3d.poses_2d)
        dev3d = jnp.asarray(bundle.train_det2d3d.poses_3d)
        n_train = None

    run_dir = make_run_dir(args)
    print(f"==> Saving to {run_dir}")
    logger, summary = make_logger(run_dir, args)

    steps_per_epoch = (n_train // args.batch_size) if n_train is not None \
        else bundle.train_det2d3d.num_batches(args.batch_size)
    best_h36m = None
    best_dhp = None
    for epoch in range(args.epochs):
        global_step = epoch * steps_per_epoch
        lr_now = step_exp_lr(args.lr, (global_step // args.lr_decay) * args.lr_decay,
                             args.lr_decay, args.lr_gamma)
        state = set_learning_rate(state, lr_now)

        key, k_epoch = jax.random.split(key)
        state, loss = train_epoch_scan(epoch_fn, state, dev2d, dev3d,
                                       np_rng, args.batch_size, k_epoch,
                                       mesh=mesh)

        h36m, dhp = eval_both(state.params, state.batch_stats)
        print(f"Epoch {epoch}: lr {lr_now:.2e} loss {loss:.5f} "
              f"| H36M P1 {h36m['p1']:.2f} P2 {h36m['p2']:.2f} "
              f"| 3DHP P1 {dhp['p1']:.2f} PCK {dhp['pck']:.2f} AUC {dhp['auc']:.2f}")
        logger.append([epoch + 1, lr_now, h36m["p1"], h36m["p2"],
                       dhp["p1"], dhp["p2"], dhp["pck"], dhp["auc"]])
        for tag, val in [("h36m_p1", h36m["p1"]), ("h36m_p2", h36m["p2"]),
                         ("dhp_p1", dhp["p1"]), ("dhp_pck", dhp["pck"])]:
            summary.writer.add_scalar(f"posenet/{tag}", val, epoch)

        ckpt = {"epoch": epoch + 1, "lr": lr_now, "error": h36m["p1"],
                "state_dict": state.params, "batch_stats": state.batch_stats,
                "posenet_name": args.posenet_name}
        if best_h36m is None or h36m["p1"] < best_h36m:
            best_h36m = h36m["p1"]
            save_snapshot(ckpt, run_dir, suffix="best", fmt=args.ckpt_format)
        if best_dhp is None or dhp["p1"] < best_dhp:
            best_dhp = dhp["p1"]
            save_snapshot(ckpt, run_dir, suffix="best_dhp_p1", fmt=args.ckpt_format)
        if (epoch + 1) % max(args.snapshot, 1) == 0:
            save_snapshot(ckpt, run_dir, suffix="epoch_{:04d}".format(epoch + 1), fmt=args.ckpt_format)
        summary.epoch += 1

    logger.close()
    # final metric-curve plot (the reference dumps log.eps, run_baseline.py:70-71)
    try:
        from dhaug_tpu.utils.viz import plot_metric_curves
        plot_metric_curves(f"{run_dir}/log.txt", f"{run_dir}/log.png")
    except Exception as exc:  # plotting must never fail a training run
        print(f"(metric plot skipped: {exc})")
    print(f"Best H36M P1: {best_h36m:.2f} mm | best 3DHP P1: {best_dhp:.2f} mm")
    return best_h36m


if __name__ == "__main__":
    main(sys.argv[1:])
