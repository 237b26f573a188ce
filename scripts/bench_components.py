#!/usr/bin/env python
"""Component-level TPU timings with true synchronization.

block_until_ready can return early under this environment's tunneled TPU
runtime, so every timed dispatch here ends in a scalar fetch.  Reports:
  * FK chain: XLA lowering vs fused Pallas kernel
  * full synthesis pipeline at several batch sizes
  * one GAN critics_step + generator_step (production dims)
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch_timed(f, *args, iters=8, warmup=3):
    for _ in range(warmup):
        float(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import numpy as np

    from dhaug_tpu.ops.fk import CANONICAL_BONE_LEN, FKInputs, fk_world_pose
    from dhaug_tpu.ops.fk_pallas import fk_world_pose_pallas

    rng = np.random.default_rng(0)
    B = 65536
    angles = jnp.asarray(rng.uniform(-90, 90, (B, 33)), jnp.float32)
    bl = jnp.asarray(rng.uniform(0.1, 0.7, (B, 15)), jnp.float32)
    grot = jnp.asarray(rng.uniform(-180, 180, (B, 3)), jnp.float32)
    root = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)

    S = 16

    @jax.jit
    def fk_xla_many(a, b, g, r):
        def body(_, i):
            return None, fk_world_pose(FKInputs(a, b, g, r + i), 16).mean()
        _, sums = jax.lax.scan(body, None, jnp.arange(S, dtype=jnp.float32))
        return sums.mean()

    @jax.jit
    def fk_pallas_many(a, b, g, r):
        def body(_, i):
            return None, fk_world_pose_pallas(a, b, g, r + i).mean()
        _, sums = jax.lax.scan(body, None, jnp.arange(S, dtype=jnp.float32))
        return sums.mean()

    dt = fetch_timed(fk_xla_many, angles, bl, grot, root)
    print(f"fk xla    : {dt * 1000:8.2f} ms / {S}x{B} poses -> "
          f"{S * B / dt / 1e6:7.2f} M poses/s")
    dt = fetch_timed(fk_pallas_many, angles, bl, grot, root)
    print(f"fk pallas : {dt * 1000:8.2f} ms / {S}x{B} poses -> "
          f"{S * B / dt / 1e6:7.2f} M poses/s")

    # ---- GAN step timings (production dims) ----
    from dhaug_tpu.gan.single_frame import build_gan
    from dhaug_tpu.train.config import parse_aug_args
    args = parse_aug_args(["--batch_size", "1024"])
    gan = build_gan(args, ["S1", "S5", "S6", "S7", "S8"], jax.random.PRNGKey(0))
    B2 = 1024
    real = jnp.asarray(rng.normal(size=(B2, 16, 3)).astype(np.float32) * 0.3)
    from dhaug_tpu.gan.wgan import camera_bank
    q, t, intr = camera_bank(["S1"])
    cam16 = jnp.concatenate([jnp.broadcast_to(intr[0], (B2, 9)),
                             jnp.broadcast_to(q[0], (B2, 4)),
                             jnp.broadcast_to(t[0], (B2, 3))], axis=1)
    tgt2d = jnp.asarray(rng.normal(size=(B2, 16, 2)).astype(np.float32) * 0.3)

    d3d, d2d = gan.d3d_state, gan.d2d_state

    def critics(key):
        out = gan.steps.critics_step(d3d, d2d, gan.gen_state.params,
                                     real, cam16, tgt2d, key)
        return out[-1]["3d_wasserstein"]

    key = jax.random.PRNGKey(1)
    dt = fetch_timed(lambda k: critics(k), key)
    print(f"critics_step (B=1024, flip on): {dt * 1000:8.2f} ms "
          f"-> {1 / dt:6.1f} steps/s")

    out = gan.steps.critics_step(d3d, d2d, gan.gen_state.params, real, cam16,
                                 tgt2d, key)
    bone_len, cam_idx = out[3], out[2]

    def gen(key):
        st, m = gan.steps.generator_step(gan.gen_state, d3d.params, d2d.params,
                                         bone_len, cam_idx, key)
        return m["g_cost"]

    dt = fetch_timed(lambda k: gen(k), key)
    print(f"generator_step (B=1024):        {dt * 1000:8.2f} ms "
          f"-> {1 / dt:6.1f} steps/s")

    # pipelined GAN epoch rate: dispatch N iterations back-to-back (the real
    # epoch loop pattern — 5 critic iters per generator iter), sync once.
    N = 50
    keys = [jax.random.PRNGKey(100 + i) for i in range(N)]
    d3s, d2s, gs = d3d, d2d, gan.gen_state

    def run_epoch_like():
        nonlocal d3s, d2s, gs
        last = None
        for i in range(N):
            out = gan.steps.critics_step(d3s, d2s, gs.params, real, cam16,
                                         tgt2d, keys[i])
            d3s, d2s = out[0], out[1]
            if i % 5 == 4:
                gs, gm = gan.steps.generator_step(gs, d3s.params, d2s.params,
                                                  out[3], out[2], keys[i])
                last = gm["g_cost"]
        return float(last)

    run_epoch_like()  # warmup
    t0 = time.perf_counter()
    run_epoch_like()
    dt = time.perf_counter() - t0
    print(f"pipelined GAN iterations:       {dt / N * 1000:8.2f} ms/iter "
          f"-> {N / dt:6.1f} iters/s ({N / dt * 1024:,.0f} poses judged/s)")


if __name__ == "__main__":
    main()
