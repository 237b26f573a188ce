#!/usr/bin/env python
"""Checkpoint evaluation on H36M S9/S11 + MPI-INF-3DHP.

CLI-compatible rebuild of DH-AUG_master/run_evaluate.py.  Accepts
checkpoints from both run_baseline.py ('state_dict') and run_Fk_GAN.py
('model_pos') — the reference crashes on the latter (SURVEY.md §2.2) — and
evaluates video-mode (mulit_farme_*) checkpoints with whole-sequence
inference, which the reference cannot do at all.

Examples:
    python run_evaluate.py --evaluate checkpoint/.../ckpt_best.ckpt \
        --posenet_name videopose --synthetic_data true
    python run_evaluate.py --evaluate .../ckpt_best_h36m_p1.ckpt \
        --posenet_name mulit_farme_videopose --architecture 3,3
"""
from __future__ import annotations

import sys


def main(argv=None):
    from dhaug_tpu.train.config import parse_baseline_args
    args = parse_baseline_args(argv)
    if not args.evaluate:
        raise SystemExit("--evaluate <ckpt path> is required")

    from dhaug_tpu.train.runners import setup_jax
    setup_jax(args)

    import jax
    import numpy as np

    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.posenet import evaluate, make_posenet_eval_step
    from dhaug_tpu.utils.checkpoint import load_ckpt, restore_into

    ckpt = load_ckpt(args.evaluate)
    # older checkpoints stored the name as a 0-d numpy str array
    posenet_name = str(ckpt.get("posenet_name", args.posenet_name))
    video = posenet_name.startswith("mulit_farme")

    print("==> Loading dataset...")
    if video:
        args.single_or_multi_train_mode = "multi"
        from dhaug_tpu.train.video_runner import (_video_eval_batches,
                                                  video_data_preparation)
        (bundle, _train, _gan, h36m_eval, mpi3d_eval,
         rf) = video_data_preparation(args)
        example = np.zeros((2, rf, 16, 2), np.float32)
    else:
        from dhaug_tpu.train.data_prep import prepare_data
        bundle = prepare_data(args)
        example = bundle.h36m_test.poses_2d[:2]

    model = make_posenet(posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton(), flag="test")
    params, batch_stats = init_posenet(model, jax.random.PRNGKey(0), example)
    saved = ckpt.get("state_dict", ckpt.get("model_pos"))
    params = restore_into(params, saved)
    if ckpt.get("batch_stats"):
        batch_stats = restore_into(batch_stats, ckpt["batch_stats"])

    forward, flip_forward = make_posenet_eval_step(model)
    if video:
        h36m = evaluate(forward, params, batch_stats,
                        _video_eval_batches(h36m_eval, args.batch_size, rf))
        dhp = evaluate(forward, params, batch_stats,
                       _video_eval_batches(mpi3d_eval, args.batch_size, rf),
                       flip_forward=flip_forward)
    else:
        from dhaug_tpu.train.runners import evaluate_both
        h36m, dhp = evaluate_both(forward, flip_forward, params, batch_stats,
                                  bundle, args.batch_size)
    print(f"H36M  : P1 {h36m['p1']:.2f} mm | P2 {h36m['p2']:.2f} mm")
    print(f"3DHP  : P1 {dhp['p1']:.2f} mm | P2 {dhp['p2']:.2f} mm "
          f"| PCK {dhp['pck']:.2f} | AUC {dhp['auc']:.2f}")

    if not video and getattr(args, "action_wise", False):
        # per-action H36M P1 breakdown (the paper's reporting format)
        from dhaug_tpu.train.runners import eval_batches
        actions = np.asarray(bundle.actions_valid)
        print("H36M per-action P1 (mm):")
        for action in sorted(set(actions.tolist())):
            sel = np.where(actions == action)[0]
            m = evaluate(forward, params, batch_stats,
                         eval_batches(bundle.h36m_test.poses_3d[sel],
                                      bundle.h36m_test.poses_2d[sel],
                                      args.batch_size))
            print(f"  {action:14s} {m['p1']:7.2f}")
    return h36m, dhp


if __name__ == "__main__":
    main(sys.argv[1:])
