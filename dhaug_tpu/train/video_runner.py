"""Video-mode (multi-frame) training: data prep, posenet loops, eval, main.

Rebuilds vedio_multi_frame_mode_main (run_Fk_GAN.py:191-318) and the video
plumbing of video_mode_operate.py: chunked loaders, per-sequence bone
re-skin, clip-based GAN training, centre-frame fake posenet training,
whole-sequence evaluation with the dilated eval twin.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from dhaug_tpu.data.chunked import (ChunkWindows, UnchunkedSequences,
                                    split_mpi3d_sequences)
from dhaug_tpu.train.data_prep import prepare_data


def _receptive_field(args) -> int:
    from dhaug_tpu.models.factory import receptive_field
    return receptive_field(args.architecture)


def video_data_preparation(args):
    """video_mode_fk_data_preparation (video_mode_operate.py:417-528)."""
    bundle = prepare_data(args, per_frame_cam=False)
    rf = _receptive_field(args)
    pad = (rf - 1) // 2

    train_loader = ChunkWindows(args.batch_size, bundle.cams_train,
                                bundle.poses_train, bundle.poses_train_2d,
                                pad=pad, full_3d_window=False, shuffle=True,
                                random_seed=args.random_seed)
    # the GAN clip loader is rebuilt every epoch by video_reskin_update
    # (fresh bone-length template per sequence), so none is built here
    gan_loader = None

    # H36M eval: whole sequences for the dilated net, centre-frame chunks for
    # everything else (video_mode_operate.py:470-481).
    poses_valid, poses_valid_2d = [], []
    from dhaug_tpu.data.loaders import fetch
    pv, pv2, acts, cams_v = fetch(bundle.subjects_test, bundle.dataset,
                                  bundle.keypoints, bundle.action_filter,
                                  stride=args.downsample, train=False,
                                  with_extrinsics=False, per_frame_cam=False)
    if args.posenet_name == "mulit_farme_videopose":
        h36m_eval = UnchunkedSequences(cams_v, pv, pv2, pad=pad)
    else:
        h36m_eval = ChunkWindows(args.batch_size, cams_v, pv, pv2, pad=pad,
                                 full_3d_window=False, shuffle=False,
                                 drop_last=False)
    # the per-action breakdown (run_evaluate --action-wise) regroups THESE
    # sequences via per_action_eval_loaders — stashing them here keeps the
    # breakdown on the exact data and protocol branch of the headline eval
    # (no second fetch that could diverge).  fetch guarantees the four lists
    # are positionally aligned (it raises on partial 3D).
    h36m_eval.eval_sequences = (cams_v, pv, pv2, [a[0] for a in acts])

    mpi = np.load(os.path.join(args.data_root, "data_extra", "test_set",
                               "test_3dhp.npz"))
    seq3d, seq2d = split_mpi3d_sequences(mpi["pose3d"], mpi["pose2d"])
    if args.posenet_name == "mulit_farme_videopose":
        mpi3d_eval = UnchunkedSequences([np.zeros(1)] * len(seq3d), seq3d,
                                        seq2d, pad=pad)
    else:
        mpi3d_eval = ChunkWindows(args.batch_size, None, seq3d, seq2d, pad=pad,
                                  full_3d_window=False, shuffle=False,
                                  drop_last=False)
    return bundle, train_loader, gan_loader, h36m_eval, mpi3d_eval, rf


def per_action_eval_loaders(batch_size: int, h36m_eval, pad: int):
    """Yield (action, loader) pairs grouping video_data_preparation's H36M
    eval sequences by action, each loader built under the SAME protocol
    branch as the headline eval: whole-sequence (UnchunkedSequences) for the
    dilated VideoPose twin, centre-frame windows (ChunkWindows) otherwise.

    Lives next to the loader construction above so any future step between
    fetch and the headline loader (a filter, a changed pad) automatically
    applies to the breakdown too."""
    cams_v, pv, pv2, seq_act = h36m_eval.eval_sequences
    whole = isinstance(h36m_eval, UnchunkedSequences)
    for action in sorted(set(seq_act)):
        idx = [i for i, a in enumerate(seq_act) if a == action]
        cams = [cams_v[i] for i in idx]
        p3 = [pv[i] for i in idx]
        p2 = [pv2[i] for i in idx]
        if whole:
            loader = UnchunkedSequences(cams, p3, p2, pad=pad)
        else:
            loader = ChunkWindows(batch_size, cams, p3, p2, pad=pad,
                                  full_3d_window=False, shuffle=False,
                                  drop_last=False)
        yield action, loader


def video_reskin_update(args, bundle, templates, rng):
    """Per-sequence single-template re-skin + re-projection, rebuilding the
    GAN clip loader (video_mode_operate.py:879-966).

    All sequences run as ONE flattened device computation (the single-frame
    path's fixed-chunk jitted program, gan/single_frame._reskin_chunk) with a
    per-frame template row, followed by a single bulk device->host fetch —
    instead of a per-sequence eager loop with two synchronous round trips per
    sequence (~40 ms each through this host's TPU tunnel; real H36M has ~600
    train sequences).  The template draw order (one rng.integers per
    sequence, then the loader seed) is unchanged, so runs stay
    reproducible."""
    import jax.numpy as jnp

    from dhaug_tpu.gan.single_frame import _RESKIN_CHUNK, _reskin_chunk

    rf = _receptive_field(args)
    pad = (rf - 1) // 2
    lengths = [np.asarray(s).shape[0] for s in bundle.poses_train]
    tmpl_idx = [int(rng.integers(0, templates.shape[0])) for _ in lengths]

    flat3d = np.concatenate([np.asarray(s, np.float32)
                             for s in bundle.poses_train])
    # full 16-col cam records tiled per frame: same operand signature as the
    # single-frame path, so the TPU program is shared from the compile cache
    flatcam = np.concatenate(
        [np.tile(np.asarray(c, np.float32).reshape(-1)[None, :16], (n, 1))
         for c, n in zip(bundle.cams_train, lengths)])
    flatidx = np.concatenate(
        [np.full(n, t, np.int64) for t, n in zip(tmpl_idx, lengths)])

    templates_j = jnp.asarray(templates)
    n = flat3d.shape[0]
    dev3d, dev2d = [], []
    for s in range(0, n, _RESKIN_CHUNK):
        e = min(s + _RESKIN_CHUNK, n)
        padn = _RESKIN_CHUNK - (e - s)
        sl3 = np.concatenate([flat3d[s:e], flat3d[e - 1:e].repeat(padn, 0)]) \
            if padn else flat3d[s:e]
        slc = np.concatenate([flatcam[s:e], flatcam[e - 1:e].repeat(padn, 0)]) \
            if padn else flatcam[s:e]
        sli = np.concatenate([flatidx[s:e], flatidx[e - 1:e].repeat(padn)]) \
            if padn else flatidx[s:e]
        c3, c2 = _reskin_chunk(jnp.asarray(sl3), jnp.asarray(slc),
                               templates_j, jnp.asarray(sli))
        dev3d.append(c3[: e - s])
        dev2d.append(c2[: e - s])
    all3d = np.asarray(jnp.concatenate(dev3d) if len(dev3d) > 1 else dev3d[0])
    all2d = np.asarray(jnp.concatenate(dev2d) if len(dev2d) > 1 else dev2d[0])
    splits = np.cumsum(lengths)[:-1]
    new3d = np.split(all3d, splits)
    new2d = np.split(all2d, splits)
    return ChunkWindows(args.batch_size, bundle.cams_train, new3d, new2d,
                        pad=pad, full_3d_window=True, shuffle=True,
                        random_seed=int(rng.integers(0, 2 ** 31)))


def _video_eval_batches(loader, batch_size: int, bucket: int = 128,
                        mesh=None):
    """Adapt the two loader flavours to (inputs_2d, targets_3d, valid)
    fixed-ish shapes.  Whole sequences are bucket-padded (edge) so the
    dilated net sees few distinct XLA shapes.

    ``mesh``: the ChunkWindows flavour shards each (batch_size, ...) window
    batch over 'data'.  The UnchunkedSequences flavour stays single-device —
    its leading axis is the sequence's camera count (<= 4), not a shardable
    batch; whole-sequence inference parallelism would need time-axis
    sharding of the dilated convs, which the <= 4 evals/epoch don't justify."""
    if isinstance(loader, UnchunkedSequences):
        for _cam, seq3d, seq2d in loader.next_epoch():
            T = seq3d.shape[1]
            T_pad = -(-T // bucket) * bucket
            extra = T_pad - T
            if extra:
                seq2d = np.pad(seq2d, ((0, 0), (0, extra), (0, 0), (0, 0)), "edge")
                seq3d = np.pad(seq3d, ((0, 0), (0, extra), (0, 0), (0, 0)), "edge")
            yield seq2d, seq3d, T
    else:
        shard = None
        if mesh is not None and batch_size % mesh.shape["data"] == 0:
            from dhaug_tpu.parallel.mesh import shard_batch
            import functools
            shard = functools.partial(shard_batch, mesh)
        for cam, w3d, w2d in loader.next_epoch():
            n = w3d.shape[0]
            if n < batch_size:  # pad the remainder batch
                padn = batch_size - n
                w2d = np.concatenate([w2d, np.repeat(w2d[-1:], padn, 0)])
                w3d = np.concatenate([w3d, np.repeat(w3d[-1:], padn, 0)])
            if shard is not None:
                import jax.numpy as jnp
                w2d, w3d = shard(jnp.asarray(w2d), jnp.asarray(w3d))
            yield w2d, w3d, n


def video_mode_main(args, train_subjects: List[str]):
    import jax

    import jax.numpy as jnp

    from dhaug_tpu.gan.video import build_video_gan, run_video_gan_epoch
    from dhaug_tpu.models.factory import init_posenet, make_posenet
    from dhaug_tpu.train.posenet import (evaluate, evaluate_sequences,
                                         make_posenet_epoch_fn,
                                         make_posenet_eval_step,
                                         make_video_window_epoch_fn)
    from dhaug_tpu.train.runners import (make_logger, make_run_dir,
                                         write_eval_scalars)
    from dhaug_tpu.train.state import (adam_posenet, lambda_lr, make_state,
                                       set_learning_rate)
    from dhaug_tpu.utils.checkpoint import save_ckpt

    np_rng = np.random.default_rng(args.random_seed)
    key = jax.random.PRNGKey(args.random_seed)

    from dhaug_tpu.parallel.mesh import mesh_from_args
    mesh = mesh_from_args(args)

    (bundle, train_loader, gan_loader, h36m_eval, mpi3d_eval,
     rf) = video_data_preparation(args)
    print(f"==> receptive field: {rf}")

    print("==> Creating PoseNet model...")
    model = make_posenet(args.posenet_name, stages=args.stages,
                         dropout=args.dropout, architecture=args.architecture,
                         skeleton=bundle.dataset.skeleton(), flag="train")
    eval_model = make_posenet(args.posenet_name, stages=args.stages,
                              dropout=args.dropout,
                              architecture=args.architecture,
                              skeleton=bundle.dataset.skeleton(), flag="test")
    key, k_init = jax.random.split(key)
    example = np.zeros((2, rf, 16, 2), np.float32)
    params, batch_stats = init_posenet(model, k_init, example)
    pos_tx = adam_posenet(args.lr_p, max_norm=1.0 if args.max_norm else 1e9)
    pos_state = make_state(pos_tx, params, batch_stats)
    # scan-epoch programs: one dispatch per posenet pass
    fake_epoch_fn = make_posenet_epoch_fn(
        model, pos_tx, criterion="mpjpe", flip=args.flip_pos_model_input,
        playback=args.GAN_video_playback_input)
    real_epoch_fn = make_video_window_epoch_fn(
        model, pos_tx, window=rf, criterion="mpjpe",
        flip=args.flip_pos_model_input,
        playback=args.Pos_video_playback_input)
    # real train split: device-resident padded concatenations, once per run
    dev_big2d = jnp.asarray(train_loader.big2d)
    dev_big3d = jnp.asarray(train_loader.big3d)
    # evaluation uses the dilated twin with the training weights
    forward, flip_forward = make_posenet_eval_step(eval_model)

    key, k_gan = jax.random.split(key)
    gan = build_video_gan(args, train_subjects, rf, k_gan, mesh=mesh) \
        if args.data_enhancement_method == "GAN" else None

    run_dir = make_run_dir(args)
    print(f"==> Making checkpoint dir: {run_dir}")
    logger, summary = make_logger(run_dir, args)

    templates = np.load(os.path.join(args.data_root, "data_extra",
                                     "bone_length_npy",
                                     "hm36s15678_bl_templates.npy"))

    # the windowed eval flavour runs data-parallel under the mesh; the
    # whole-sequence (UnchunkedSequences) flavour stays single-device (see
    # _video_eval_batches docstring)
    eval_mesh = mesh if not isinstance(h36m_eval, UnchunkedSequences) else None

    # whole-sequence (UnchunkedSequences) evaluation uses the reference's
    # SEQUENCE-weighted aggregation (num_poses == 1 per UnchunkedGenerator
    # yield, video_mode_operate.py:787,828); the windowed flavour keeps the
    # per-frame weighting of the single-frame protocol
    eval_agg = evaluate_sequences \
        if isinstance(h36m_eval, UnchunkedSequences) else evaluate

    def eval_both():
        params, stats = pos_state.params, pos_state.batch_stats
        if eval_mesh is not None:
            from dhaug_tpu.parallel.mesh import place_state, replicate
            params = place_state(eval_mesh, params)
            if stats:
                stats = replicate(eval_mesh, stats)
        h36m = eval_agg(forward, params, stats,
                        _video_eval_batches(h36m_eval, args.batch_size,
                                            mesh=eval_mesh))
        dhp = eval_agg(forward, params, stats,
                       _video_eval_batches(mpi3d_eval, args.batch_size,
                                           mesh=eval_mesh),
                       flip_forward=flip_forward)
        return h36m, dhp

    def _place(arrays_rep, idx_rows, state):
        """Data-parallel placement for a scan-epoch dispatch (no-op without
        --data_parallel_devices)."""
        if mesh is None:
            return arrays_rep, idx_rows, state
        from dhaug_tpu.parallel.mesh import (place_state, replicate,
                                             shard_index_rows)
        return (tuple(replicate(mesh, a) for a in arrays_rep),
                tuple(shard_index_rows(mesh, i) for i in idx_rows),
                place_state(mesh, state))

    def train_on_fakes(state, fakes, key):
        """Fake clips: full-clip 2D input, centre-frame 3D target
        (video_mode_PoseDataSet, video_GAN_fun.py:46-76) — one scan dispatch."""
        f3d, f2d, _ = fakes
        center = (rf - 1) // 2
        n = f3d.shape[0]
        n_b = n // args.batch_size
        if n_b == 0:
            return state
        idx = jnp.asarray(np_rng.permutation(n)[: n_b * args.batch_size]
                          .reshape(n_b, args.batch_size))
        (d2, d3), (idx,), state = _place(
            (jnp.asarray(f2d), jnp.asarray(f3d[:, center:center + 1])),
            (idx,), state)
        state, _ = fake_epoch_fn(state, d2, d3, idx, key)
        return state

    def train_on_real(state, key):
        """Real clips via on-device window gathers — one scan dispatch."""
        n = train_loader.n_chunks
        n_b = n // args.batch_size
        if n_b == 0:
            return state
        order = np_rng.permutation(n)[: n_b * args.batch_size]
        start2d = jnp.asarray(train_loader.start2d[order]
                              .reshape(n_b, args.batch_size))
        idx3d = jnp.asarray(train_loader.idx3d[order]
                            .reshape(n_b, args.batch_size))
        (b2, b3), (start2d, idx3d), state = _place(
            (dev_big2d, dev_big3d), (start2d, idx3d), state)
        state, _ = real_epoch_fn(state, b2, b3, start2d, idx3d, key)
        return state

    dhpp1_best = s911p1_best = None
    lr_now = args.lr_p
    trained_epochs = 0  # the reference's scheduler only steps on trained epochs
    scores = {"h36m": {"p1": 0.0, "p2": 0.0},
              "dhp": {"p1": 0.0, "p2": 0.0, "pck": 0.0, "auc": 0.0}}
    fakes = None
    start_epoch = 0
    total_epochs = (args.epochs + args.warmup + args.single_dis_warmup_epoch +
                    args.additional_train_epoch)
    gan_epochs_end = args.epochs + args.warmup + args.single_dis_warmup_epoch

    # Full-state resume (all 6 nets + optimizers + counters + RNG), matching
    # the single-frame runner; the reference's --resume/--GAN_resume flags
    # have no load path at all (SURVEY.md §5).
    from dhaug_tpu.utils.checkpoint import load_snapshot, restore_into
    resume_path = args.resume or args.GAN_resume
    if resume_path:
        saved = load_snapshot(resume_path)
        pos_state = restore_into(pos_state, saved["pos_state"])
        if gan is not None and "gen_state" in saved:
            gan = gan._replace(
                gen_state=restore_into(gan.gen_state, saved["gen_state"]),
                d3d_state=restore_into(gan.d3d_state, saved["d3d_state"]),
                d2d_state=restore_into(gan.d2d_state, saved["d2d_state"]),
                md3d_state=restore_into(gan.md3d_state, saved["md3d_state"]),
                md2d_state=restore_into(gan.md2d_state, saved["md2d_state"]))
        summary.load_state_dict(saved["summary"])
        np_rng.bit_generator.state = saved["np_rng"]
        key = jnp.asarray(saved["key"])
        start_epoch = int(saved["epoch"]) + 1
        summary.epoch = start_epoch
        lr_now = float(saved.get("lr_now", args.lr_p))
        trained_epochs = int(saved.get("trained_epochs", 0))
        dhpp1_best = saved.get("dhpp1_best")
        s911p1_best = saved.get("s911p1_best")
        print(f"==> Resumed from {resume_path} at epoch {start_epoch}")

    def full_state_ckpt(now_epoch):
        state = {"epoch": now_epoch, "lr_now": lr_now,
                 "trained_epochs": trained_epochs,
                 "dhpp1_best": dhpp1_best, "s911p1_best": s911p1_best,
                 "pos_state": pos_state, "summary": summary.state_dict(),
                 "np_rng": np_rng.bit_generator.state,
                 "key": np.asarray(key)}
        if gan is not None:
            state.update({"gen_state": gan.gen_state,
                          "d3d_state": gan.d3d_state,
                          "d2d_state": gan.d2d_state,
                          "md3d_state": gan.md3d_state,
                          "md2d_state": gan.md2d_state})
        return state

    for now_epoch in range(start_epoch, total_epochs):
        if args.data_enhancement_method == "GAN":
            gan_loader = video_reskin_update(args, bundle, templates, np_rng)
            key, k_epoch = jax.random.split(key)
            use_motion = summary.epoch >= args.single_dis_warmup_epoch
            gan, fakes = run_video_gan_epoch(gan, gan_loader, args.batch_size,
                                             k_epoch, summary, use_motion,
                                             summary.writer, mesh=mesh)

        if args.record_all_picture and fakes is not None:
            # per-epoch real/fake clip dumps (video_GAN_fun.py:590-600 dumps
            # REAL frames alongside the fake ones)
            from dhaug_tpu.utils.viz import plot_video_strip
            f3d, f2d, _ = fakes
            plot_video_strip(np.asarray(f3d[0]), np.asarray(f2d[0]),
                             os.path.join(run_dir, "tmp",
                                          f"fake_video_ep{summary.epoch}.jpg"),
                             title=f"fake clip, epoch {summary.epoch}")
            if gan_loader is not None and getattr(gan_loader, "big3d", None) is not None:
                s = int(gan_loader.start3d[0])
                real_clip = np.asarray(gan_loader.big3d[s:s + rf])
                plot_video_strip(real_clip, None,
                                 os.path.join(run_dir, "tmp",
                                              f"real_video_ep{summary.epoch}.jpg"),
                                 title=f"real (re-skinned) clip, epoch {summary.epoch}")

        train_now = (summary.epoch > (args.warmup + args.single_dis_warmup_epoch)
                     and args.data_enhancement_method == "GAN") or \
            args.data_enhancement_method == "normal"

        if train_now:
            if args.data_enhancement_method == "GAN" and fakes is not None:
                key, k1 = jax.random.split(key)
                pos_state = train_on_fakes(pos_state, fakes, k1)
                h36m, dhp = eval_both()
                logger.append([summary.epoch, 0, h36m["p1"], h36m["p2"],
                               dhp["p1"], dhp["p2"], dhp["pck"], dhp["auc"]])
                write_eval_scalars(summary.writer, summary.epoch, h36m, dhp,
                                   "_fake")
                scores = {"h36m": h36m, "dhp": dhp}

            key, k2 = jax.random.split(key)
            pos_state = train_on_real(pos_state, k2)
            h36m, dhp = eval_both()
            write_eval_scalars(summary.writer, summary.epoch, h36m, dhp,
                               "_real")
            scores = {"h36m": h36m, "dhp": dhp}

            trained_epochs += 1
            # GAN mode steps the linear schedule until the GAN phase ends
            # (training starts warmup+single_dis epochs late, so the
            # schedule counter stays <= args.epochs there); 'normal' trains
            # from epoch 0 and must switch to the x0.95 additional decay at
            # args.epochs like the reference (run_Fk_GAN.py:281-301) — the
            # GAN boundary would run the linear schedule to exactly 0
            lr_end = gan_epochs_end \
                if args.data_enhancement_method == "GAN" else args.epochs
            if now_epoch < lr_end:
                lr_now = lambda_lr(args.lr_p, trained_epochs, args.epochs)
            else:
                lr_now = lr_now * args.additional_LR_decay
            pos_state = set_learning_rate(pos_state, max(lr_now, 0.0))
            print(f"\nEpoch: {summary.epoch} | LR: {lr_now:.8f} "
                  f"| H36M P1 {scores['h36m']['p1']:.2f} "
                  f"| 3DHP P1 {scores['dhp']['p1']:.2f}")

        h36m, dhp = scores["h36m"], scores["dhp"]
        logger.append([summary.epoch, lr_now, h36m["p1"], h36m["p2"],
                       dhp["p1"], dhp["p2"], dhp.get("pck", 0),
                       dhp.get("auc", 0)])

        ckpt = {"epoch": summary.epoch, "model_pos": pos_state.params,
                "batch_stats": pos_state.batch_stats,
                "posenet_name": args.posenet_name}
        if dhp["p1"] and (dhpp1_best is None or dhpp1_best > dhp["p1"]):
            dhpp1_best = dhp["p1"]
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
                           os.path.join(run_dir, "wasserstein_curves.png"),
                           title="GAN critic curves (epoch means)")
    logger.close()
    return scores
