#!/usr/bin/env python
"""XLA cost analysis of the production GAN iteration programs.

Compiles (AOT) the single-frame and video per-iteration programs at the
production shapes used by the benchmarks (bench.py, scripts/bench_video_gan.py)
and prints XLA's own FLOP count per GAN iteration, plus the MFU implied by a
given measured ms/iter.  This complements bench.py's hand-derived lower-bound
FLOP model (`_gan_iter_flops`) with the compiler's count when judging how
close each path runs to the hardware roofline.

One GAN iteration = critics_step every iteration + generator_step every 5th
(model_fk_gan_train.py:415), so flops/iter = critics + gen/5.  The epoch scan
programs are NOT used here because XLA's cost analysis counts a while-loop
body once regardless of trip count; the standalone jitted steps are the same
per-iteration math (the sharded/equality tests pin that).

Usage:
  python scripts/cost_analysis.py [--cpu] [--ms_single 10.0] [--ms_video 63.7]

The FLOP count of the lowered program is shape-determined; backend-specific
fusion does not change matmul FLOPs, so --cpu gives the same count without
waiting on the remote-compile tunnel.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("TPU_PEAK_FLOPS", 197e12))


def _flops(lowered) -> tuple[float, float]:
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def single_frame_costs():
    import jax
    import jax.numpy as jnp

    from dhaug_tpu.gan.wgan import GanHyper, camera_bank, make_single_frame_steps
    from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                 Fk3DDiscriminator)
    from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
    from dhaug_tpu.train.state import adam_gan, make_state

    B, DENSE = 1024, 1000
    key = jax.random.PRNGKey(0)
    gen_cfg = GeneratorConfig(dense_dim=DENSE)
    hyper = GanHyper(flip=True, use_pallas_fk=False)
    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=DENSE)
    d2d = Fk2DDiscriminator(dense_dim=DENSE)
    gp = gen.init(key, jnp.zeros((2, 128)))["params"]
    p3 = d3d.init(key, jnp.zeros((2, 16, 3)))["params"]
    p2 = d2d.init(key, jnp.zeros((2, 16, 2)))["params"]
    gen_tx, d3d_tx, d2d_tx = adam_gan(), adam_gan(), adam_gan()
    quats, trans, intrs = camera_bank(["S1"])
    steps = make_single_frame_steps(
        lambda p, x: gen.apply({"params": p}, x),
        lambda p, x: d3d.apply({"params": p}, x),
        lambda p, x: d2d.apply({"params": p}, x),
        d3d_tx, d2d_tx, gen_tx, gen_cfg, hyper, quats, trans, intrs)

    sg = make_state(gen_tx, gp)
    s3 = make_state(d3d_tx, p3)
    s2 = make_state(d2d_tx, p2)
    real3d = jnp.zeros((B, 16, 3))
    cam16 = jnp.zeros((B, 16))
    real2d = jnp.zeros((B, 16, 2))
    crit = jax.jit(steps.critics_step).lower(s3, s2, sg.params, real3d,
                                             cam16, real2d, key)
    c_fl, c_by = _flops(crit)
    bone = jnp.zeros((B, 15))
    genl = steps.generator_step.lower(sg, s3.params, s2.params, bone,
                                      jnp.asarray(0, jnp.int32), key)
    g_fl, g_by = _flops(genl)
    return (c_fl, c_by), (g_fl, g_by)


def video_costs():
    import jax
    import jax.numpy as jnp

    from dhaug_tpu.gan.video import build_video_gan
    from dhaug_tpu.train.config import parse_aug_args

    B, F = 512, 9
    args = parse_aug_args(["--batch_size", str(B),
                           "--single_or_multi_train_mode", "multi",
                           "--architecture", "3,3",
                           "--GAN_video_playback_input", "true"])
    # pin the XLA FK lowering so the FLOP count is backend-independent
    # (on TPU the Pallas custom call would be counted as 0 FLOPs), matching
    # the single-frame path's use_pallas_fk=False
    gan = build_video_gan(args, ["S1"], F, jax.random.PRNGKey(0),
                          use_pallas_fk=False)
    key = jax.random.PRNGKey(1)
    real3d = jnp.zeros((B, F, 16, 3))
    cam16 = jnp.zeros((B, 16))
    real2d = jnp.zeros((B, F, 16, 2))
    crit = gan.steps.critics_step.lower(
        gan.d3d_state, gan.d2d_state, gan.md3d_state, gan.md2d_state,
        gan.gen_state.params, real3d, cam16, real2d, key, use_motion=True)
    c_fl, c_by = _flops(crit)
    bone = jnp.zeros((B, 15))
    genl = gan.steps.generator_step.lower(
        gan.gen_state, gan.d3d_state.params, gan.d2d_state.params,
        gan.md3d_state.params, gan.md2d_state.params, bone,
        jnp.asarray(0, jnp.int32), key, use_motion=True)
    g_fl, g_by = _flops(genl)
    return (c_fl, c_by), (g_fl, g_by)


def report(name, crit, gen, ms_per_iter):
    flops = crit[0] + gen[0] / 5.0
    bytes_hbm = crit[1] + gen[1] / 5.0
    out = {"program": name,
           "critics_gflops": round(crit[0] / 1e9, 1),
           "gen_update_gflops": round(gen[0] / 1e9, 1),
           "xla_gflops_per_iter": round(flops / 1e9, 1)}
    if ms_per_iter:
        achieved = flops / (ms_per_iter / 1e3)
        out["measured_ms_per_iter"] = ms_per_iter
        out["achieved_tflops"] = round(achieved / 1e12, 2)
        out["mfu_xla"] = round(achieved / PEAK_FLOPS, 4)
        out["hbm_gbps_implied"] = round(bytes_hbm / (ms_per_iter / 1e3) / 1e9, 1)
    print(out, flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms_single", type=float, default=9.0,
                    help="measured single-frame ms/iter (bench.py)")
    ap.add_argument("--ms_video", type=float, default=62.5,
                    help="measured video ms/iter (scripts/bench_video_gan.py)")
    ap.add_argument("--skip_video", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env var is ignored in "
                         "this container — CLAUDE.md)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    crit, gen = single_frame_costs()
    report("single_frame_iter(B=1024)", crit, gen, args.ms_single)
    if not args.skip_video:
        crit, gen = video_costs()
        report("video_iter(B=512,F=9)", crit, gen, args.ms_video)


if __name__ == "__main__":
    main()
