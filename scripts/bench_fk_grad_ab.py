#!/usr/bin/env python
"""A/B: the GAN epoch program with the GENERATOR update's FK on the
custom_vjp Pallas kernel (use_pallas_fk_grad=True) vs the XLA lowering
(False).  The stop-gradient critic-phase fakes run the fused kernel in BOTH
arms — that path was already Pallas; this isolates the round-4 change (the
hand-derived backward kernel on the gradient path).

Same process, interleaved timed dispatches, scalar-fetch fences — between
separate processes the tunnel adds +-25-30% (CLAUDE.md), inside one process
the interleave averages the drift.

Usage: python scripts/bench_fk_grad_ab.py [--iters 4] [--scan 40]
"""
import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default=4, type=int)
    ap.add_argument("--scan", default=40, type=int)
    ap.add_argument("--batch", default=1024, type=int)
    ap.add_argument("--dense", default=1000, type=int)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.gan.wgan import (GanHyper, camera_bank,
                                    make_single_frame_steps, tiled_cam16)
    from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                 Fk3DDiscriminator)
    from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
    from dhaug_tpu.train.state import adam_gan, make_state

    B, DENSE, SCAN = args.batch, args.dense, args.scan
    from dhaug_tpu.ops.fk_pallas import fk_pallas_supported
    on_tpu = fk_pallas_supported()
    print(f"backend={jax.default_backend()} B={B} dense={DENSE} scan={SCAN}")

    key = jax.random.PRNGKey(0)
    gen_cfg = GeneratorConfig(dense_dim=DENSE)
    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=DENSE)
    d2d = Fk2DDiscriminator(dense_dim=DENSE)
    gp = gen.init(key, jnp.zeros((2, 128)))["params"]
    p3 = d3d.init(key, jnp.zeros((2, 16, 3)))["params"]
    p2 = d2d.init(key, jnp.zeros((2, 16, 2)))["params"]
    quats, trans, intrs = camera_bank(["S1", "S5", "S6", "S7", "S8"])

    rng = np.random.default_rng(0)
    N = SCAN * B
    dev3d = jnp.asarray(rng.normal(size=(N, 16, 3)).astype(np.float32) * 0.3)
    devcam = tiled_cam16(intrs[0], quats[0], trans[0], N)
    devt2d = jnp.asarray(rng.normal(size=(N, 16, 2)).astype(np.float32) * 0.3)
    idx = jnp.asarray(np.arange(N).reshape(SCAN, B))

    def make_arm(grad_pallas: bool):
        hyper = GanHyper(flip=True, use_pallas_fk=on_tpu,
                         use_pallas_fk_grad=grad_pallas,
                         pallas_interpret=not on_tpu)
        txs = (adam_gan(), adam_gan(), adam_gan())
        steps = make_single_frame_steps(
            lambda p, x: gen.apply({"params": p}, x),
            lambda p, x: d3d.apply({"params": p}, x),
            lambda p, x: d2d.apply({"params": p}, x),
            txs[1], txs[2], txs[0], gen_cfg, hyper, quats, trans, intrs)
        # per-arm COPIES: epoch_step donates its state buffers on TPU, so
        # the two arms must not share the init arrays
        copy = lambda t: jax.tree.map(jnp.copy, t)
        states = [make_state(txs[0], copy(gp)), make_state(txs[1], copy(p3)),
                  make_state(txs[2], copy(p2))]

        def dispatch(k):
            g, s3, s2, out = steps.epoch_step(
                states[0], states[1], states[2], dev3d, devcam, devt2d,
                idx, idx, jnp.asarray(0, jnp.int32), k)
            states[0], states[1], states[2] = g, s3, s2
            return float(out[3]["3d_wasserstein"].mean())

        return dispatch

    arms = {"xla_grad": make_arm(False), "pallas_grad": make_arm(True)}
    for name, d in arms.items():
        t0 = time.perf_counter()
        d(jax.random.PRNGKey(1))  # warmup / compile
        print(f"{name}: warmup+compile {time.perf_counter() - t0:.1f}s")

    times = {name: [] for name in arms}
    metrics = {name: [] for name in arms}
    for i in range(args.iters):
        for name, d in arms.items():  # interleaved
            t0 = time.perf_counter()
            metrics[name].append(d(jax.random.PRNGKey(2 + i)))
            times[name].append(time.perf_counter() - t0)
    # same seeds + same init copies in both arms: the trajectories must
    # agree to kernel precision — a hardware-level equality check of the
    # custom_vjp backward against the XLA lowering
    for a, b in zip(metrics["xla_grad"], metrics["pallas_grad"]):
        print(f"w3d xla={a:+.6f} pallas={b:+.6f} diff={abs(a - b):.2e}")
    per = {}
    for name, ts in times.items():
        per[name] = statistics.median(ts) / SCAN
        print(f"{name}: {per[name] * 1000:.3f} ms/iter "
              f"({1.0 / per[name]:.2f} iters/s)  "
              f"raw={[round(t, 3) for t in ts]}")
    print(f"speedup pallas_grad vs xla_grad: "
          f"x{per['xla_grad'] / per['pallas_grad']:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:])
