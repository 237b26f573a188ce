#!/usr/bin/env python
"""Benchmark: FK-GAN augmented-pose synthesis throughput on one chip.

Measures the full augmented-pair pipeline — noise -> generator trunk
(Gen_DenseDim=1000) -> angle assembly -> DH forward kinematics -> world pose
-> camera transform -> distorted 2D projection — i.e. the per-batch fake
synthesis work of the reference's GAN loop, as one jitted program at the
production batch size (1024).

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
import sys
import time

# Same-machine torch-CPU reference measurement (scripts/bench_reference_torch.py).
TORCH_REFERENCE_POSES_PER_SEC = 7167.7

BATCH = 1024
DENSE = 1000
SCAN_STEPS = 64   # batches synthesized per dispatch (device-side lax.scan)
ITERS = 5         # timed dispatches


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
        pose16 = synthesize_poses(head, bone_len, scaler, cfg)
        cam3d = world_to_camera_batch(pose16, quats[:1], trans[:1])
        intr = jnp.broadcast_to(intrs[0][None], (BATCH, 9))
        pose2d = project_to_2d(cam3d, intr)
        return cam3d, pose2d

    @jax.jit
    def synthesize_many(params, bone_len, key):
        """SCAN_STEPS batches per dispatch: device-side loop so the
        measurement reflects chip throughput, not host/tunnel latency."""
        def body(carry, k):
            cam3d, pose2d = one_batch(params, bone_len, k)
            # fold the outputs into a running checksum so nothing is DCE'd
            # but HBM doesn't hold SCAN_STEPS full buffers
            return carry + cam3d.sum() + pose2d.sum(), ()
        total, _ = jax.lax.scan(body, 0.0, jax.random.split(key, SCAN_STEPS))
        return total

    # warmup / compile
    jax.block_until_ready(synthesize_many(params, bone_len, key))

    keys = jax.random.split(jax.random.PRNGKey(1), ITERS)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = synthesize_many(params, bone_len, keys[i])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pps = BATCH * SCAN_STEPS * ITERS / dt
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
