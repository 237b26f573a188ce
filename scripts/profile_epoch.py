#!/usr/bin/env python
"""Per-phase wall-clock profile of one training epoch on the current
backend — answers "where does the end-to-end epoch wall go?" (the GAN phase
alone runs at ~9 ms/iteration, yet a full epoch costs tens of seconds
through this environment's tunnel).

Each phase ends in the same host fetch the production loop performs, so the
timings include the true synchronization cost.  Run from the repo root:

    python scripts/profile_epoch.py --data_root /tmp/bigdata [--epochs 2]
    python scripts/profile_epoch.py --video  # video-mode twin (batch 512)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(name, fn):
    t = time.perf_counter()
    out = fn()
    print(f"{name:21s}: {time.perf_counter() - t:7.2f} s")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="/tmp/bigdata")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="default 1024 single-frame / 512 video")
    ap.add_argument("--video", action="store_true",
                    help="profile the video-mode epoch (5-model GAN, clip "
                         "posenet passes, whole-sequence eval)")
    ap.add_argument("--jax_platform", default="")
    opts = ap.parse_args()
    if not opts.batch_size:
        opts.batch_size = 512 if opts.video else 1024
    if opts.video:
        return main_video(opts)

    from dhaug_tpu.train.config import parse_aug_args
    args = parse_aug_args([
        "--posenet_name", "mlp", "--lr_p", "1e-3", "--keypoints", "gt",
        "--batch_size", str(opts.batch_size), "--epochs", "50",
        "--data_enhancement_method", "GAN",
        "--single_or_multi_train_mode", "single",
        "--synthetic_data", "true", "--data_root", opts.data_root,
        "--warmup", "0",
    ] + (["--jax_platform", opts.jax_platform] if opts.jax_platform else []))

    from dhaug_tpu.train.runners import setup_jax
    setup_jax(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.data.loaders import PoseTarget
    from dhaug_tpu.gan.single_frame import build_gan, reskin_dataset, run_gan_epoch
    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.data_prep import prepare_data
    from dhaug_tpu.train.posenet import make_posenet_epoch_fn, train_epoch_scan
    from dhaug_tpu.train.runners import cache_eval_arrays, make_eval_both_scan
    from dhaug_tpu.train.state import adam_posenet, make_state
    from dhaug_tpu.utils.log import Summary

    t0 = time.perf_counter()
    bundle = prepare_data(args)
    cache_eval_arrays(bundle)
    print(f"data prep            : {time.perf_counter() - t0:7.2f} s")

    np_rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    train_subjects = ["S1", "S5", "S6", "S7", "S8"]

    model = make_posenet("mlp", stages=args.stages, dropout=args.dropout)
    params, batch_stats = init_posenet(model, key,
                                       bundle.train_det2d3d.poses_2d[:2])
    pos_tx = adam_posenet(args.lr_p)
    pos_state = make_state(pos_tx, params, batch_stats)
    pos_epoch_fn = make_posenet_epoch_fn(model, pos_tx, criterion="mse")
    eval_both = make_eval_both_scan(model, bundle, args.batch_size)
    gan = build_gan(args, train_subjects, key)
    summary = Summary(None)
    templates = np.load(os.path.join(args.data_root, "data_extra",
                                     "bone_length_npy",
                                     "hm36s15678_bl_templates.npy"))
    dev_real_2d = jnp.asarray(bundle.train_det2d3d.poses_2d)
    dev_real_3d = jnp.asarray(bundle.train_det2d3d.poses_3d)

    timed = _timed

    for epoch in range(opts.epochs):
        print(f"--- epoch {epoch} ---")
        gt2d3d = timed("reskin", lambda: reskin_dataset(
            bundle.train_gt2d3d, templates, np_rng))
        target_2d = PoseTarget(gt2d3d.poses_2d)
        target_3d = PoseTarget(gt2d3d.poses_3d)
        key, key2, key3, key4 = jax.random.split(key, 4)
        res = timed("gan epoch", lambda: run_gan_epoch(
            gan, gt2d3d, target_2d, target_3d, args.batch_size, np_rng,
            key2, summary))
        gan, fake_ds = res
        if fake_ds is not None:
            pos_state_box = [pos_state]

            from dhaug_tpu.utils.profiling import fence

            def fake_pass():
                s, l = train_epoch_scan(pos_epoch_fn, pos_state_box[0],
                                        fake_ds.poses_2d, fake_ds.poses_3d,
                                        np_rng, args.batch_size, key3)
                pos_state_box[0] = s
                fence(l)
                return l
            timed("posenet fake pass", fake_pass)
            timed("eval (fake)", lambda: eval_both(
                pos_state_box[0].params, pos_state_box[0].batch_stats))

            def real_pass():
                s, l = train_epoch_scan(pos_epoch_fn, pos_state_box[0],
                                        dev_real_2d, dev_real_3d,
                                        np_rng, args.batch_size, key4)
                pos_state_box[0] = s
                fence(l)
                return l
            timed("posenet real pass", real_pass)
            timed("eval (real)", lambda: eval_both(
                pos_state_box[0].params, pos_state_box[0].batch_stats))
            pos_state = pos_state_box[0]

        # the per-epoch best-checkpoint save fetches the full train state
        # through the same packed transfer the production save uses
        # (utils/checkpoint.fetch_tree — a per-leaf np.asarray here would
        # misattribute hundreds of ~40 ms tunnel round trips to this phase)
        from dhaug_tpu.utils.checkpoint import fetch_tree
        def ckpt_fetch():
            return fetch_tree({"pos": pos_state.params,
                               "gen": gan.gen_state.params,
                               "d3d": gan.d3d_state.params,
                               "d2d": gan.d2d_state.params})
        timed("ckpt state fetch", ckpt_fetch)


def main_video(opts):
    """Video-mode twin: per-sequence re-skin + clip loader rebuild, the
    5-model GAN epoch scan, fake/real clip posenet passes, whole-sequence
    evals, and the 6-net checkpoint state fetch — the exact per-epoch phases
    of train/video_runner.video_mode_main."""
    from dhaug_tpu.train.config import parse_aug_args
    args = parse_aug_args([
        "--posenet_name", "mulit_farme_videopose", "--keypoints", "gt",
        "--batch_size", str(opts.batch_size), "--epochs", "50",
        "--architecture", "3,3",
        "--data_enhancement_method", "GAN",
        "--single_or_multi_train_mode", "multi",
        "--synthetic_data", "true", "--data_root", opts.data_root,
        "--warmup", "0", "--single_dis_warmup_epoch", "0",
    ] + (["--jax_platform", opts.jax_platform] if opts.jax_platform else []))

    from dhaug_tpu.train.runners import setup_jax
    setup_jax(args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.gan.video import build_video_gan, run_video_gan_epoch
    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.data.chunked import UnchunkedSequences
    from dhaug_tpu.train.posenet import (evaluate, evaluate_sequences,
                                         make_posenet_epoch_fn,
                                         make_video_window_epoch_fn)
    from dhaug_tpu.train.state import adam_posenet, make_state
    from dhaug_tpu.train.video_runner import (_video_eval_batches,
                                              video_data_preparation,
                                              video_reskin_update)
    from dhaug_tpu.utils.checkpoint import fetch_tree
    from dhaug_tpu.utils.log import Summary
    from dhaug_tpu.utils.profiling import fence

    t0 = time.perf_counter()
    (bundle, train_loader, _gl, h36m_eval, mpi3d_eval,
     rf) = video_data_preparation(args)
    print(f"video data prep      : {time.perf_counter() - t0:7.2f} s")

    np_rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    model = make_posenet(args.posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton(), flag="train")
    eval_model = make_posenet(args.posenet_name, stages=args.stages,
                              dropout=args.dropout,
                              architecture=args.architecture,
                              skeleton=bundle.dataset.skeleton(), flag="test")
    params, batch_stats = init_posenet(
        model, key, np.zeros((2, rf, 16, 2), np.float32))
    pos_tx = adam_posenet(args.lr_p)
    pos_state = make_state(pos_tx, params, batch_stats)
    fake_epoch_fn = make_posenet_epoch_fn(
        model, pos_tx, criterion="mpjpe", flip=args.flip_pos_model_input,
        playback=args.GAN_video_playback_input)
    real_epoch_fn = make_video_window_epoch_fn(
        model, pos_tx, window=rf, criterion="mpjpe",
        flip=args.flip_pos_model_input,
        playback=args.Pos_video_playback_input)
    from dhaug_tpu.train.posenet import make_posenet_eval_step
    forward, flip_forward = make_posenet_eval_step(eval_model)

    key, k_gan = jax.random.split(key)
    gan = build_video_gan(args, bundle.subjects_train, rf, k_gan)
    summary = Summary(None)
    templates = np.load(os.path.join(args.data_root, "data_extra",
                                     "bone_length_npy",
                                     "hm36s15678_bl_templates.npy"))
    dev_big2d = jnp.asarray(train_loader.big2d)
    dev_big3d = jnp.asarray(train_loader.big3d)
    center = (rf - 1) // 2

    for epoch in range(opts.epochs):
        print(f"--- epoch {epoch} ---")
        gan_loader = _timed("reskin + clip loader", lambda: video_reskin_update(
            args, bundle, templates, np_rng))
        key, k_epoch = jax.random.split(key)
        box = [gan]

        def gan_epoch():
            g, fakes = run_video_gan_epoch(box[0], gan_loader,
                                           args.batch_size, k_epoch, summary,
                                           use_motion=True, writer=None)
            box[0] = g
            return fakes
        fakes = _timed("video gan epoch", gan_epoch)
        gan = box[0]
        summary.epoch += 1

        f3d, f2d, _ = fakes
        n_b = f3d.shape[0] // args.batch_size
        key, k1, k2 = jax.random.split(key, 3)

        def fake_pass():
            idx = jnp.asarray(
                np_rng.permutation(f3d.shape[0])[: n_b * args.batch_size]
                .reshape(n_b, args.batch_size))
            s, l = fake_epoch_fn(
                pos_state, jnp.asarray(f2d),
                jnp.asarray(f3d[:, center:center + 1]), idx, k1)
            fence(l)
            return s, l
        pos_state, _ = _timed("posenet fake pass", fake_pass)

        def real_pass():
            n = train_loader.n_chunks
            nb = n // args.batch_size
            order = np_rng.permutation(n)[: nb * args.batch_size]
            start2d = jnp.asarray(train_loader.start2d[order]
                                  .reshape(nb, args.batch_size))
            idx3d = jnp.asarray(train_loader.idx3d[order]
                                .reshape(nb, args.batch_size))
            s, l = real_epoch_fn(pos_state, dev_big2d, dev_big3d,
                                 start2d, idx3d, k2)
            fence(l)
            return s, l
        pos_state, _ = _timed("posenet real pass", real_pass)

        def one_eval():
            # mirror the production protocol (train/video_runner.py):
            # sequence-weighted aggregation for whole-sequence loaders and
            # the DEFAULT padding bucket — passing rf here would give nearly
            # every sequence length its own XLA shape (a fresh remote
            # compile each) and measure a non-production eval
            eval_agg = evaluate_sequences \
                if isinstance(h36m_eval, UnchunkedSequences) else evaluate
            h36m = eval_agg(forward, pos_state.params, pos_state.batch_stats,
                            _video_eval_batches(h36m_eval, args.batch_size))
            dhp = eval_agg(forward, pos_state.params, pos_state.batch_stats,
                           _video_eval_batches(mpi3d_eval, args.batch_size),
                           flip_forward=flip_forward)
            return h36m, dhp
        _timed("eval (h36m + 3dhp)", one_eval)

        _timed("ckpt state fetch", lambda: fetch_tree({
            "pos": pos_state.params,
            "gen": gan.gen_state.params, "d3d": gan.d3d_state.params,
            "d2d": gan.d2d_state.params, "md3d": gan.md3d_state.params,
            "md2d": gan.md2d_state.params}))


if __name__ == "__main__":
    main()
