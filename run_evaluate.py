#!/usr/bin/env python
"""Checkpoint evaluation on H36M S9/S11 + MPI-INF-3DHP.

CLI-compatible rebuild of DH-AUG_master/run_evaluate.py.  Accepts
checkpoints from both run_baseline.py ('state_dict') and run_Fk_GAN.py
('model_pos') — the reference crashes on the latter (SURVEY.md §2.2) — and
evaluates video-mode (mulit_farme_*) checkpoints with whole-sequence
inference, which the reference cannot do at all.  Reference-trained torch
checkpoints (ckpt_*.pth.tar, utils/utils.py:129-134) are auto-detected and
transplanted onto the flax trees for all five posenets
(dhaug_tpu/utils/transplant.py), so real DH-AUG weights score here directly.

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
    from dhaug_tpu.utils.checkpoint import (load_snapshot,
                                            resolve_posenet_weights)
    from dhaug_tpu.utils.transplant import (is_torch_checkpoint,
                                            load_torch_checkpoint)

    torch_state = None
    if is_torch_checkpoint(args.evaluate):
        # reference-trained torch checkpoint (ckpt_*.pth.tar, both the
        # 'state_dict' and 'model_pos' key layouts — the reference's own
        # run_evaluate.py:30-31 crashes on the latter, SURVEY §2.2); the
        # weights are transplanted onto the flax tree after model init
        torch_state = load_torch_checkpoint(args.evaluate)
        ckpt = {}
        print(f"==> Reference torch checkpoint: {len(torch_state)} tensors")
    else:
        ckpt = load_snapshot(args.evaluate)
    # older checkpoints stored the name as a 0-d numpy str array
    posenet_name = str(ckpt.get("posenet_name", args.posenet_name))
    # write the resolved name back: video_data_preparation branches on
    # args.posenet_name to pick whole-sequence vs windowed eval loaders —
    # a name coming only from the checkpoint must drive it the same way
    args.posenet_name = posenet_name
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
    if torch_state is not None:
        from dhaug_tpu.utils.transplant import transplant_posenet_state_dict
        params, batch_stats = transplant_posenet_state_dict(
            posenet_name, torch_state, params, batch_stats)
        ckpt = {"state_dict": params,
                "batch_stats": batch_stats if batch_stats else None}
    params, batch_stats = resolve_posenet_weights(ckpt, params, batch_stats)

    forward, flip_forward = make_posenet_eval_step(model)
    if video:
        # match the training loop / reference protocol: whole-sequence
        # (UnchunkedSequences) eval is SEQUENCE-weighted (num_poses == 1 per
        # UnchunkedGenerator yield, video_mode_operate.py:787,828); the
        # windowed flavour keeps frame weighting (train/video_runner.py:233)
        from dhaug_tpu.data.chunked import UnchunkedSequences
        from dhaug_tpu.train.posenet import evaluate_sequences
        eval_agg = evaluate_sequences \
            if isinstance(h36m_eval, UnchunkedSequences) else evaluate
        h36m = eval_agg(forward, params, batch_stats,
                        _video_eval_batches(h36m_eval, args.batch_size))
        dhp = eval_agg(forward, params, batch_stats,
                       _video_eval_batches(mpi3d_eval, args.batch_size),
                       flip_forward=flip_forward)
    else:
        from dhaug_tpu.train.runners import evaluate_both
        h36m, dhp = evaluate_both(forward, flip_forward, params, batch_stats,
                                  bundle, args.batch_size)
    print(f"H36M  : P1 {h36m['p1']:.2f} mm | P2 {h36m['p2']:.2f} mm")
    print(f"3DHP  : P1 {dhp['p1']:.2f} mm | P2 {dhp['p2']:.2f} mm "
          f"| PCK {dhp['pck']:.2f} | AUC {dhp['auc']:.2f}")

    if getattr(args, "Path_3DPW", ""):
        # Cross-dataset 3DPW evaluation — the reference parses --Path_3DPW
        # but never loads it (dead code); here it scores an external npz
        # {pose3d (N, 24|16, 3) metres, pose2d (N, 16, 2) normalized} with
        # flip-averaged inference.  SMPL-24 GT is mapped to the H36M-16
        # layout (data/pw3d.py) and P1/P2 are computed over the 14 mapped
        # joints after mean-centring (the pelvis has no SMPL counterpart).
        # Video-mode checkpoints run centre-frame inference over sliding
        # receptive-field windows (edge-padded; the flat npz carries no
        # sequence boundaries, so windows straddling a boundary mix frames —
        # a few frames out of N at most).
        import jax.numpy as jnp

        from dhaug_tpu.data.pw3d import PW3D_TO_16POINTS_TABLE, convert_to_16
        from dhaug_tpu.ops.metrics import mpjpe, p_mpjpe

        data = np.load(args.Path_3DPW)
        gt3d, in2d = np.asarray(data["pose3d"]), np.asarray(data["pose2d"])
        if gt3d.shape[1] == 24:
            gt3d = convert_to_16(gt3d, PW3D_TO_16POINTS_TABLE)
            mapped = np.asarray(sorted(PW3D_TO_16POINTS_TABLE.values()))
        else:
            mapped = np.arange(16)
        # fixed-shape batches: edge-pad the index list so the remainder batch
        # keeps the same XLA shape (no extra remote compile), one padded pass
        bs = args.batch_size
        n = in2d.shape[0]
        pad_to = -(-n // bs) * bs
        sel = np.minimum(np.arange(pad_to), n - 1)
        if video:
            half = rf // 2
            in2d_seq = np.pad(in2d, ((half, half), (0, 0), (0, 0)), "edge")
            win = sel[:, None] + np.arange(rf)[None]   # (pad_to, rf)
            dev2d = jnp.asarray(in2d_seq[win])         # (pad_to, rf, 16, 2)
        else:
            dev2d = jnp.asarray(in2d[sel])
        preds = [np.asarray(flip_forward(params, batch_stats,
                                         dev2d[s:s + bs]))
                 for s in range(0, pad_to, bs)]
        pred = np.concatenate(preds)
        if pred.ndim == 4:                             # (B, 1, 16, 3) video
            pred = pred[:, 0]
        pred = pred[:n][:, mapped]
        gt = gt3d[:, mapped]
        pred = pred - pred.mean(axis=1, keepdims=True)
        gt = gt - gt.mean(axis=1, keepdims=True)
        p1 = float(mpjpe(jnp.asarray(pred), jnp.asarray(gt))) * 1000.0
        p2 = float(p_mpjpe(jnp.asarray(pred), jnp.asarray(gt))) * 1000.0
        print(f"3DPW  : P1 {p1:.2f} mm | P2 {p2:.2f} mm "
              f"({len(mapped)}-joint protocol, {gt.shape[0]} frames)")

    if video and getattr(args, "action_wise", False):
        # per-action H36M P1 for video checkpoints: regroup the SAME eval
        # sequences the headline number used (stashed on h36m_eval by
        # video_data_preparation) under the same protocol branch —
        # whole-sequence sequence-weighted for the VideoPose twins,
        # windowed frame-weighted otherwise
        from dhaug_tpu.train.video_runner import per_action_eval_loaders
        print("H36M per-action P1 (mm):")
        for action, loader in per_action_eval_loaders(
                args.batch_size, h36m_eval, (rf - 1) // 2):
            m = eval_agg(forward, params, batch_stats,
                         _video_eval_batches(loader, args.batch_size))
            print(f"  {action:14s} {m['p1']:7.2f}")
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
