#!/usr/bin/env python
"""Video-mode GAN training-iteration benchmark on the real chip.

One iteration = the production 5-model epoch program's per-scan-step work
(gan/video.py::epoch_step): the 12-critic-update block (single-frame 3D/2D +
motion critics, flip AND playback duplication, WGAN-GP double grads in every
update) plus the every-5th generator update over all four critics — the video
twin of bench.py's single-frame GAN metric, at the reference's video
production config (batch 512, receptive field 9, dense 1000;
/root/reference/DH-AUG_master/README.md:102).

Timing protocol per CLAUDE.md: the epoch scan is ONE dispatch; the fence is
a scalar fetch of the final metrics (block_until_ready is unreliable here).
Compare: `scripts/bench_reference_torch.py --mode video_gan_iter` (CPU).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from dhaug_tpu.gan.video import build_video_gan
    from dhaug_tpu.gan.wgan import camera_bank, tiled_cam16
    from dhaug_tpu.train.config import parse_aug_args

    B, F, N_BATCHES = 512, 9, 40
    args = parse_aug_args(["--batch_size", str(B),
                           "--single_or_multi_train_mode", "multi",
                           "--architecture", "3,3",
                           "--GAN_video_playback_input", "true"])
    subjects = ["S1", "S5", "S6", "S7", "S8"]
    gan = build_video_gan(args, subjects, F, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    T = N_BATCHES * B + F            # enough frames for distinct windows
    big3d = jnp.asarray(rng.normal(size=(T, 16, 3)).astype(np.float32) * 0.3)
    big2d = jnp.asarray(rng.normal(size=(T, 16, 2)).astype(np.float32) * 0.3)
    q, t, intr = camera_bank(["S1"])
    n_chunks = N_BATCHES * B
    cams = tiled_cam16(intr[0], q[0], t[0], n_chunks)
    starts = rng.integers(0, T - F, size=(2, N_BATCHES, B))
    start3d = jnp.asarray(starts[0], jnp.int32)
    start2d = jnp.asarray(starts[1], jnp.int32)
    cam_sel = jnp.asarray(
        rng.integers(0, n_chunks, size=(N_BATCHES, B)), jnp.int32)

    def run(states, key, iter0):
        out = gan.steps.epoch_step(*states, big3d, big2d, cams,
                                   start3d, start2d, cam_sel,
                                   jnp.asarray(iter0, jnp.int32), key,
                                   use_motion=True)
        return out[:5], out[5]

    states = (gan.gen_state, gan.d3d_state, gan.d2d_state,
              gan.md3d_state, gan.md2d_state)
    print(f"compiling + warmup (B={B}, F={F}, {N_BATCHES} iters/dispatch)...",
          flush=True)
    t0 = time.perf_counter()
    states, outs = run(states, jax.random.PRNGKey(1), 0)
    w = float(outs[3]["Fk_d3d_Wasserstein_D"][-1])   # fence
    print(f"  first dispatch {time.perf_counter() - t0:.1f} s "
          f"(w3d={w:.4f})", flush=True)

    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        states, outs = run(states, jax.random.PRNGKey(2 + rep),
                           (rep + 1) * N_BATCHES)
        w = float(outs[3]["Fk_d3d_Wasserstein_D"][-1])   # fence
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"  rep {rep}: {dt * 1000:.0f} ms for {N_BATCHES} iters -> "
              f"{N_BATCHES / dt:.2f} iters/s ({dt / N_BATCHES * 1000:.1f} "
              f"ms/iter), w3d={w:.4f}", flush=True)

    best = min(times)
    print(f"video GAN training iteration (B={B}, F={F}, flip+playback+motion"
          f"): {N_BATCHES / best:.2f} iters/s ({best / N_BATCHES * 1000:.1f} "
          f"ms/iter)")


if __name__ == "__main__":
    main()
