#!/usr/bin/env python
"""Benchmark: FK-GAN augmented-pose synthesis throughput on one chip.

Measures the full augmented-pair pipeline — noise -> generator trunk
(Gen_DenseDim=1000) -> angle assembly -> DH forward kinematics (fused
Pallas kernel) -> world pose -> camera transform -> distorted 2D projection
— i.e. the per-batch fake synthesis work of the reference's GAN loop, as one
jitted program at the production batch size (1024).

Measurement protocol: every timed dispatch ends in a scalar reduction of the
synthesized poses that is fetched to the host — the only reliable
synchronization in this environment (block_until_ready can return before
remote execution completes under the tunneled TPU runtime, producing
impossible numbers).  The synchronous round trip costs a fixed ~30 ms here
regardless of work, so the bench amortizes it the way bulk synthesis does:
SCAN_STEPS large batches per dispatch via lax.scan.  The reported value is
the median over ITERS dispatches.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "poses/s", "vs_baseline": N}

vs_baseline compares against the reference-style PyTorch implementation of
the same pipeline measured on this machine's CPU
(scripts/bench_reference_torch.py: 7167.7 poses/s; the reference repo is
single-GPU PyTorch and publishes no throughput numbers — SURVEY.md §6).
"""
from __future__ import annotations

import json
import os
import statistics
import time

# Same-machine torch-CPU reference measurement (scripts/bench_reference_torch.py).
TORCH_REFERENCE_POSES_PER_SEC = 7167.7

BATCH = 65536      # bulk-synthesis batch per scan step
SCAN_STEPS = 8     # batches per dispatch (amortizes the ~30 ms sync latency)
DENSE = 1000
ITERS = 5


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp

    from dhaug_tpu.gan.wgan import camera_bank
    from dhaug_tpu.models.generator import (FkGeneratorNet, GeneratorConfig,
                                            sample_scaler8, synthesize_poses)
    from dhaug_tpu.ops.camera import project_to_2d, world_to_camera_batch
    from dhaug_tpu.ops.fk import CANONICAL_BONE_LEN

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    key = jax.random.PRNGKey(0)
    cfg = GeneratorConfig(dense_dim=DENSE)
    net = FkGeneratorNet(cfg)
    params = net.init(key, jnp.zeros((2, 128)))["params"]
    bone_len = jnp.broadcast_to(jnp.asarray(CANONICAL_BONE_LEN), (BATCH, 15))
    quats, trans, intrs = camera_bank(["S1"])

    def one_batch(params, bone_len, key):
        k_n, k_s = jax.random.split(key)
        noise = jax.random.normal(k_n, (BATCH, 128))
        head = net.apply({"params": params}, noise)
        scaler = sample_scaler8(k_s, BATCH, "different")
        # fused Pallas FK on TPU (inference path); XLA path elsewhere
        pose16 = synthesize_poses(head, bone_len, scaler, cfg,
                                  use_pallas=on_tpu)
        cam3d = world_to_camera_batch(pose16, quats[:1], trans[:1])
        intr = jnp.broadcast_to(intrs[0][None], (BATCH, 9))
        pose2d = project_to_2d(cam3d, intr)
        return cam3d, pose2d

    @jax.jit
    def synthesize_many(params, bone_len, key):
        def body(_, kk):
            cam3d, pose2d = one_batch(params, bone_len, kk)
            # scalar summary per step: every output element feeds the fetch
            return None, cam3d.mean() + pose2d.mean()
        _, sums = jax.lax.scan(body, None, jax.random.split(key, SCAN_STEPS))
        return jnp.mean(sums)

    keys = [jax.random.PRNGKey(i + 1) for i in range(ITERS)]
    for _ in range(3):
        float(synthesize_many(params, bone_len, key))  # warmup / compile

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        float(synthesize_many(params, bone_len, keys[i]))  # fetch = true sync
        times.append(time.perf_counter() - t0)
    per_call = statistics.median(times)

    pps = BATCH * SCAN_STEPS / per_call
    result = {
        "metric": "augmented poses/sec/chip (FK-GAN sampling)",
        "value": round(pps, 1),
        "unit": "poses/s",
        "vs_baseline": round(pps / TORCH_REFERENCE_POSES_PER_SEC, 2),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
