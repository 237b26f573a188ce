#!/usr/bin/env python
"""Bulk FK-GAN pose synthesis — generate a DH-3DHP-style synthetic dataset.

The reference released a one-off synthetic dataset ("DH-3DHP",
README.md:104-106) generated with its GAN; this CLI is the production
version: sample N augmented (3D, 2D) pairs from a trained generator
checkpoint (or, with --random_init, from the prior) with the batch sharded
over every local device (pod-scale: each chip synthesizes its shard
independently; ICI is only touched by the final host gather).

Examples:
    python scripts/synthesize_dataset.py --n_poses 100000 \
        --out /tmp/dh_synth.npz --random_init true
    python scripts/synthesize_dataset.py --ckpt ckpt_resume_latest.ckpt \
        --n_poses 1000000 --out dh_synth.npz
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_poses", default=100000, type=int)
    ap.add_argument("--batch", default=8192, type=int, help="per-dispatch batch")
    ap.add_argument("--out", default="dh_synth.npz", type=str)
    ap.add_argument("--ckpt", default="", type=str,
                    help="run_Fk_GAN resume checkpoint with a gen_state")
    ap.add_argument("--random_init", default=False,
                    type=lambda x: str(x).lower() == "true")
    ap.add_argument("--Gen_DenseDim", default=1000, type=int)
    ap.add_argument("--seed", default=0, type=int,
                    help="RNG seed. NOTE: each device shard folds its mesh "
                         "position into the key, so the dataset for a fixed "
                         "seed depends on the device count too (recorded as "
                         "'n_devices' in the output npz)")
    ap.add_argument("--jax_platform", default="", type=str)
    # multi-host (DCN) sharding: run one process per host, all pointed at
    # the same coordinator; the mesh spans every process's devices, each
    # shard synthesizes independently, and process 0 writes the npz.  The
    # (seed, GLOBAL device count) pair pins the dataset, so a 2-process x
    # 4-device run reproduces the 1-process x 8-device dataset exactly.
    ap.add_argument("--coordinator", default="", type=str,
                    help="host:port of process 0 (enables jax.distributed)")
    ap.add_argument("--num_processes", default=1, type=int)
    ap.add_argument("--process_id", default=0, type=int)
    args = ap.parse_args(argv)

    import jax
    if args.jax_platform:
        jax.config.update("jax_platforms", args.jax_platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    multiprocess = bool(args.coordinator) and args.num_processes > 1
    if multiprocess:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.gan.wgan import camera_bank
    from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
    from dhaug_tpu.ops.camera import project_to_2d, world_to_camera_batch
    from dhaug_tpu.ops.fk import CANONICAL_BONE_LEN
    from dhaug_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from dhaug_tpu.parallel.sharded import make_sharded_synthesizer

    cfg = GeneratorConfig(dense_dim=args.Gen_DenseDim)
    net = FkGeneratorNet(cfg)
    key = jax.random.PRNGKey(args.seed)
    params = net.init(key, jnp.zeros((2, 128)))["params"]
    if args.ckpt:
        # load_snapshot auto-detects the format (pickle file vs an orbax
        # snapshot directory from --ckpt_format orbax)
        from dhaug_tpu.utils.checkpoint import load_snapshot, restore_into
        saved = load_snapshot(args.ckpt)
        gen_state = saved.get("gen_state")
        saved_params = gen_state.params if gen_state is not None else saved["gen"]
        params = restore_into(params, saved_params)
        print(f"==> loaded generator from {args.ckpt}")
    elif not args.random_init:
        print("WARNING: no --ckpt given; using a randomly initialized generator")

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=1)
    B = args.batch - (args.batch % max(n_dev, 1)) or n_dev
    from dhaug_tpu.ops.fk_pallas import fk_pallas_supported
    use_pallas = fk_pallas_supported()
    if use_pallas:
        # fused Pallas trunk (models/trunk_pallas.py, ~14% faster at the
        # same bf16-multiply / fp32-accumulate precision as XLA's default
        # matmul) + fused Pallas FK.  Under a multi-device mesh the
        # synthesizer shard_maps the whole per-shard body over 'data'
        # (GSPMD can't partition a pallas_call).
        from dhaug_tpu.models.trunk_pallas import trunk_forward_pallas
        gen_apply = lambda p, x: trunk_forward_pallas(p, x)
    else:
        gen_apply = lambda p, x: net.apply({"params": p}, x)
    synthesize = make_sharded_synthesizer(gen_apply, cfg, mesh=mesh,
                                          use_pallas_fk=use_pallas)

    quats, trans, intrs = camera_bank(["S1", "S5", "S6", "S7", "S8"])

    @jax.jit
    def synth_pairs(params, bone_len, key):
        k_pose, k_cam = jax.random.split(key)
        pose16 = synthesize(params, bone_len, k_pose)
        cam_idx = jax.random.randint(k_cam, (), 0, quats.shape[0])
        cam3d = world_to_camera_batch(pose16, quats[cam_idx][None],
                                      trans[cam_idx][None])
        intr = jnp.broadcast_to(intrs[cam_idx][None], (pose16.shape[0], 9))
        pose2d = project_to_2d(cam3d, intr)
        return cam3d, pose2d, intr

    bone_host = np.broadcast_to(np.asarray(CANONICAL_BONE_LEN),
                                (B, 15)).astype(np.float32)
    out3d, out2d, outcam = [], [], []
    t0 = time.perf_counter()
    with mesh:
        if multiprocess:
            # global arrays assembled from per-process local rows; the
            # fetch below is a cross-process (DCN) allgather
            from jax.experimental import multihost_utils
            from jax.sharding import NamedSharding, PartitionSpec
            # replicate the generator params ONCE as global arrays; passing
            # the raw host pytree into the jitted loop would re-transfer
            # ~24 MB (Gen_DenseDim=1000) across the mesh on EVERY dispatch
            rep = NamedSharding(mesh, PartitionSpec())
            params_r = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x), np.shape(x)), params)
            rows = B // args.num_processes
            bone_len = jax.make_array_from_process_local_data(
                NamedSharding(mesh, PartitionSpec("data")),
                bone_host[args.process_id * rows:(args.process_id + 1) * rows],
                (B, 15))
            fetch = lambda x: np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        else:
            params_r = replicate(mesh, params)
            bone_len = shard_batch(mesh, jnp.asarray(bone_host))
            fetch = np.asarray
        done = 0
        i = 0
        while done < args.n_poses:
            k = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1), i)
            cam3d, pose2d, intr = synth_pairs(params_r, bone_len, k)
            take = min(B, args.n_poses - done)
            out3d.append(fetch(cam3d)[:take])
            out2d.append(fetch(pose2d)[:take])
            outcam.append(fetch(intr)[:take])
            done += take
            i += 1
    dt = time.perf_counter() - t0
    pose3d = np.concatenate(out3d)
    pose2d = np.concatenate(out2d)
    cams = np.concatenate(outcam)
    # n_devices is part of the sampling identity: shards fold their mesh
    # position into the RNG key, so (seed, GLOBAL n_devices) pins the
    # dataset regardless of how many processes the devices span
    if not multiprocess or args.process_id == 0:
        np.savez_compressed(args.out, pose3d=pose3d, pose2d=pose2d, cam=cams,
                            seed=np.int64(args.seed),
                            n_devices=np.int64(n_dev))
        print(f"wrote {args.out}: {pose3d.shape[0]} poses in {dt:.1f}s "
              f"({pose3d.shape[0] / dt:.0f} poses/s over {n_dev} device(s)"
              f"{f' / {args.num_processes} processes' if multiprocess else ''})")


if __name__ == "__main__":
    main(sys.argv[1:])
