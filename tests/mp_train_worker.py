"""Multi-process dp GAN-training worker (slow-lane DCN demonstration).

Runs the PRODUCTION single-frame GAN epoch program (gan/wgan.py::epoch_step)
with the per-iteration batch axis dp-sharded over a GLOBAL mesh spanning
every process's devices (``jax.distributed``), then writes the per-iteration
metric trajectories, the fake-pose buffer, and the final parameters of all
three nets to an npz (process 0 only).  The companion test
(test_parallel.py::test_multiprocess_dcn_training_matches_single_process)
asserts that a 2-process x 4-device run reproduces the 1-process x 8-device
run — extending the multi-host validation from bulk synthesis
(scripts/synthesize_dataset.py) to the training path itself.  The reference
is strictly single-GPU (no torch.distributed anywhere,
/root/reference/DH-AUG_master/run_Fk_GAN.py); this is greenfield TPU-pod
scope.

Not named test_*: pytest must not collect it — it is only ever spawned as a
subprocess with its own (possibly distributed) JAX runtime.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, type=str)
    ap.add_argument("--coordinator", default="", type=str,
                    help="host:port of process 0 (enables jax.distributed)")
    ap.add_argument("--num_processes", default=1, type=int)
    ap.add_argument("--process_id", default=0, type=int)
    args = ap.parse_args(argv)

    import jax
    # subprocesses don't inherit tests/conftest.py: pin the CPU backend the
    # supported way (JAX_PLATFORMS env is ignored — CLAUDE.md) and the
    # compile cache (XLA:CPU programs still take seconds to build)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    multiprocess = bool(args.coordinator) and args.num_processes > 1
    if multiprocess:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dhaug_tpu.gan.wgan import (GanHyper, camera_bank,
                                    make_single_frame_steps, tiled_cam16)
    from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                 Fk3DDiscriminator)
    from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
    from dhaug_tpu.parallel.mesh import make_mesh, shard_index_rows
    from dhaug_tpu.train.state import adam_gan, make_state

    # identical tiny-GAN setup to test_parallel._tiny_gan_steps: every draw
    # is pinned by PRNGKey(0)/default_rng(0), so both process topologies
    # construct bit-identical host-side inputs
    key = jax.random.PRNGKey(0)
    gen_cfg = GeneratorConfig(dense_dim=32)
    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=32)
    d2d = Fk2DDiscriminator(dense_dim=32)
    host = lambda tree: jax.tree.map(np.asarray, tree)
    gp = host(gen.init(key, jnp.zeros((2, 128)))["params"])
    p3 = host(d3d.init(key, jnp.zeros((2, 16, 3)))["params"])
    p2 = host(d2d.init(key, jnp.zeros((2, 16, 2)))["params"])
    quats, trans, intrs = camera_bank(["S1"])
    gen_tx, d3d_tx, d2d_tx = adam_gan(), adam_gan(), adam_gan()
    steps = make_single_frame_steps(
        lambda p, x: gen.apply({"params": p}, x),
        lambda p, x: d3d.apply({"params": p}, x),
        lambda p, x: d2d.apply({"params": p}, x),
        d3d_tx, d2d_tx, gen_tx, gen_cfg, GanHyper(flip=True),
        quats, trans, intrs)

    B, nb, N = 16, 6, 100
    rng = np.random.default_rng(0)
    h3d = (rng.normal(size=(N, 16, 3)) * 0.3).astype(np.float32)
    hcam = np.asarray(tiled_cam16(intrs[0], quats[0], trans[0], N))
    ht2d = (rng.normal(size=(N, 16, 2)) * 0.3).astype(np.float32)
    idx_r = rng.permutation(N)[: nb * B].reshape(nb, B).astype(np.int32)
    idx_t = rng.permutation(N)[: nb * B].reshape(nb, B).astype(np.int32)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    g_st = make_state(gen_tx, gp)
    s3_st = make_state(d3d_tx, p3)
    s2_st = make_state(d2d_tx, p2)

    with mesh:
        if multiprocess:
            # global (nb, B) index arrays assembled from per-process local
            # columns — the per-iteration batch axis shards over 'data'
            # across BOTH processes, so every matmul/update runs dp with the
            # gradient all-reduce crossing the process boundary (DCN-style)
            cols = B // args.num_processes
            lo = args.process_id * cols
            sh = NamedSharding(mesh, P(None, "data"))
            ir = jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(idx_r[:, lo:lo + cols]), (nb, B))
            it = jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(idx_t[:, lo:lo + cols]), (nb, B))
        else:
            ir = shard_index_rows(mesh, jnp.asarray(idx_r))
            it = shard_index_rows(mesh, jnp.asarray(idx_t))
        # epoch data + net/optimizer states stay host pytrees: identical on
        # every process, jit replicates them over the global mesh
        g_st, s3_st, s2_st, outs = steps.epoch_step(
            g_st, s3_st, s2_st, h3d, hcam, ht2d, ir, it,
            np.int32(0), jax.random.PRNGKey(7))

        # scalars/params come out fully replicated (np.asarray-able from any
        # process); the fake buffer is batch-sharded across processes, so
        # reshard it to replicated under jit before fetching
        to_rep = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
        fake3d = np.asarray(to_rep(outs[0]))
        flat = lambda tree: np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(tree)])
        if not multiprocess or args.process_id == 0:
            np.savez(args.out,
                     w3d=np.asarray(outs[3]["3d_wasserstein"]),
                     w2d=np.asarray(outs[3]["2d_wasserstein"]),
                     g_cost=np.asarray(outs[3]["g_cost"]),
                     fake3d=fake3d,
                     gen_params=flat(g_st.params),
                     d3d_params=flat(s3_st.params),
                     d2d_params=flat(s2_st.params),
                     n_devices=np.int64(n_dev))
            print(f"wrote {args.out}: epoch_step over {n_dev} device(s) / "
                  f"{args.num_processes} process(es)")


if __name__ == "__main__":
    main(sys.argv[1:])
