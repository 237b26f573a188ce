#!/usr/bin/env python
"""Checkpoint evaluation on H36M S9/S11 + MPI-INF-3DHP.

CLI-compatible rebuild of DH-AUG_master/run_evaluate.py.  Accepts
checkpoints from both run_baseline.py ('state_dict') and run_Fk_GAN.py
('model_pos') — the reference crashes on the latter (SURVEY.md §2.2).

Example:
    python run_evaluate.py --evaluate checkpoint/.../ckpt_best.ckpt \
        --posenet_name videopose --synthetic_data true
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

    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.data_prep import prepare_data
    from dhaug_tpu.train.posenet import make_posenet_eval_step
    from dhaug_tpu.train.runners import evaluate_both
    from dhaug_tpu.utils.checkpoint import load_ckpt, restore_into

    print("==> Loading dataset...")
    bundle = prepare_data(args)

    ckpt = load_ckpt(args.evaluate)
    posenet_name = ckpt.get("posenet_name", args.posenet_name)
    model = make_posenet(posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton(), flag="test")
    params, batch_stats = init_posenet(model, jax.random.PRNGKey(0),
                                       bundle.h36m_test.poses_2d[:2])
    saved = ckpt.get("state_dict", ckpt.get("model_pos"))
    params = restore_into(params, saved)
    if ckpt.get("batch_stats"):
        batch_stats = restore_into(batch_stats, ckpt["batch_stats"])

    forward, flip_forward = make_posenet_eval_step(model)
    h36m, dhp = evaluate_both(forward, flip_forward, params, batch_stats,
                              bundle, args.batch_size)
    print(f"H36M  : P1 {h36m['p1']:.2f} mm | P2 {h36m['p2']:.2f} mm")
    print(f"3DHP  : P1 {dhp['p1']:.2f} mm | P2 {dhp['p2']:.2f} mm "
          f"| PCK {dhp['pck']:.2f} | AUC {dhp['auc']:.2f}")
    return h36m, dhp


if __name__ == "__main__":
    main(sys.argv[1:])
