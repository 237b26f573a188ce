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
The default 80 iterations/dispatch matches the single-frame bench and sits
close to the production video epoch length (~156 at the 80k fixture), so
the fixed ~35 ms tunnel round trip adds <0.5 ms/iter.
Compare: `scripts/bench_reference_torch.py --mode video_gan_iter` (CPU).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_batches: int = 80, reps: int = 3, verbose: bool = True) -> dict:
    """Measure the production video epoch program's per-iteration cost and
    return {"iters_per_sec", "ms_per_iter"} (median of ``reps`` dispatches
    of ``n_batches`` iterations each — the same statistic as bench.py's
    other lines).  Also imported by bench.py for its video JSON line."""
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

    say = print if verbose else (lambda *a, **k: None)
    B, F = 512, 9
    args = parse_aug_args(["--batch_size", str(B),
                           "--single_or_multi_train_mode", "multi",
                           "--architecture", "3,3",
                           "--GAN_video_playback_input", "true"])
    subjects = ["S1", "S5", "S6", "S7", "S8"]
    gan = build_video_gan(args, subjects, F, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    T = n_batches * B + F            # enough frames for distinct windows
    big3d = jnp.asarray(rng.normal(size=(T, 16, 3)).astype(np.float32) * 0.3)
    big2d = jnp.asarray(rng.normal(size=(T, 16, 2)).astype(np.float32) * 0.3)
    q, t, intr = camera_bank(["S1"])
    n_chunks = n_batches * B
    cams = tiled_cam16(intr[0], q[0], t[0], n_chunks)
    starts = rng.integers(0, T - F, size=(2, n_batches, B))
    start3d = jnp.asarray(starts[0], jnp.int32)
    start2d = jnp.asarray(starts[1], jnp.int32)
    cam_sel = jnp.asarray(
        rng.integers(0, n_chunks, size=(n_batches, B)), jnp.int32)

    def run(states, key, iter0):
        out = gan.steps.epoch_step(*states, big3d, big2d, cams,
                                   start3d, start2d, cam_sel,
                                   jnp.asarray(iter0, jnp.int32), key,
                                   use_motion=True)
        return out[:5], out[5]

    states = (gan.gen_state, gan.d3d_state, gan.d2d_state,
              gan.md3d_state, gan.md2d_state)
    say(f"compiling + warmup (B={B}, F={F}, {n_batches} iters/dispatch)...",
        flush=True)
    t0 = time.perf_counter()
    states, outs = run(states, jax.random.PRNGKey(1), 0)
    w = float(outs[3]["Fk_d3d_Wasserstein_D"][-1])   # fence
    say(f"  first dispatch {time.perf_counter() - t0:.1f} s "
        f"(w3d={w:.4f})", flush=True)

    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        states, outs = run(states, jax.random.PRNGKey(2 + rep),
                           (rep + 1) * n_batches)
        w = float(outs[3]["Fk_d3d_Wasserstein_D"][-1])   # fence
        dt = time.perf_counter() - t0
        times.append(dt)
        say(f"  rep {rep}: {dt * 1000:.0f} ms for {n_batches} iters -> "
            f"{n_batches / dt:.2f} iters/s ({dt / n_batches * 1000:.1f} "
            f"ms/iter), w3d={w:.4f}", flush=True)

    # median, not min: bench.py embeds this next to median-based GAN-iter
    # and poses/s lines, and under the tunnel's ±25-30% run-to-run variance
    # a min would be systematically optimistic relative to them
    import statistics
    mid = statistics.median(times)
    return {"iters_per_sec": n_batches / mid,
            "ms_per_iter": mid / n_batches * 1000.0}


def main():
    r = measure()
    print(f"video GAN training iteration (B=512, F=9, flip+playback+motion"
          f"): {r['iters_per_sec']:.2f} iters/s ({r['ms_per_iter']:.1f} "
          f"ms/iter)")


if __name__ == "__main__":
    main()
