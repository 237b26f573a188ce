"""Fused Pallas TPU kernel for the generator dense trunk (inference paths).

The trunk (FkGeneratorNet: prelude 128->D, 3 residual blocks of DxD, head
D->F*35; Fk_generator.py:114-129) is ~90% of bulk-synthesis cost and is
HBM-bound under XLA: every layer round-trips a (B, D) fp32 activation
through HBM (~8 KB/pose/layer).  This kernel keeps the bf16 weight copies
(~12.3 MB at D=1000) resident in VMEM across the whole batch — their
BlockSpec index map is constant, so Pallas fetches them once — and streams
only noise tiles in and head tiles out.  Activations live in VMEM at fp32.

Numerics: each matmul casts its operands to bf16 and accumulates in fp32 —
exactly the per-multiply precision of XLA's DEFAULT fp32 matmul on TPU
(single-pass bf16 multiply, fp32 accumulate), so the kernel tracks the
production XLA trunk to bf16 rounding (~1e-2 relative on the pre-tanh
head).  Biases and residual adds stay fp32.

Like ops/fk_pallas.py this is an INFERENCE kernel: bulk synthesis and
benchmarks only.  Training keeps the flax/XLA trunk (differentiable, and
update-level parity is pinned there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def trunk_weights(params) -> tuple:
    """Flatten FkGeneratorNet params into the kernel's operand order:
    (w0, b0, [wa_i, ba_i, wb_i, bb_i for 3 res blocks], wh, bh).
    Weights are cast to bf16 (the precision XLA's default matmul multiplies
    at anyway); biases stay fp32 reshaped to (1, d) rows."""
    def w(p):
        return jnp.asarray(p["kernel"], jnp.bfloat16)

    def b(p):
        return jnp.asarray(p["bias"], jnp.float32)[None, :]

    ops = [w(params["DensePrelude_0"]["Dense_0"]),
           b(params["DensePrelude_0"]["Dense_0"])]
    for i in range(3):
        blk = params[f"DenseResBlock_{i}"]
        ops += [w(blk["Dense_0"]), b(blk["Dense_0"]),
                w(blk["Dense_1"]), b(blk["Dense_1"])]
    ops += [w(params["Dense_0"]), b(params["Dense_0"])]
    return tuple(ops)


def _trunk_kernel(noise_ref, w0, b0, w1a, b1a, w1b, b1b, w2a, b2a, w2b, b2b,
                  w3a, b3a, w3b, b3b, wh, bh, out_ref):
    def mm(x, wref):
        return jnp.dot(x.astype(jnp.bfloat16), wref[:],
                       preferred_element_type=jnp.float32)

    h = jnp.maximum(mm(noise_ref[:], w0) + b0[:], 0.0)
    for wa, ba, wb, bb in ((w1a, b1a, w1b, b1b),
                           (w2a, b2a, w2b, b2b),
                           (w3a, b3a, w3b, b3b)):
        y = jnp.maximum(mm(h, wa) + ba[:], 0.0)
        y = mm(y, wb) + bb[:]
        h = jnp.maximum(y + h, 0.0)
    out_ref[:] = mm(h, wh) + bh[:]


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def trunk_forward_pallas(params, noise: jnp.ndarray,
                         interpret: bool = False,
                         tile: int = 256) -> jnp.ndarray:
    """Fused trunk forward: params (FkGeneratorNet tree), noise (B, 128)
    -> head (B, out_dim) fp32, equal to ``net.apply`` up to bf16 matmul
    rounding.  B pads to a multiple of ``tile`` internally."""
    ops = trunk_weights(params)
    noise_dim = ops[0].shape[0]
    out_dim = ops[-2].shape[1]
    B = noise.shape[0]
    Bp = -(-B // tile) * tile
    x = noise.astype(jnp.float32)
    if Bp != B:
        x = jnp.concatenate([x, jnp.zeros((Bp - B, noise_dim), x.dtype)])

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _trunk_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, out_dim), jnp.float32),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, noise_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [full(a) for a in ops],
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *ops)
    return out[:B]


def trunk_reference_bf16(params, noise: jnp.ndarray) -> jnp.ndarray:
    """XLA emulation of the kernel's exact cast pattern (bf16 multiply,
    fp32 accumulate/bias/residual) — the test oracle for the kernel."""
    ops = trunk_weights(params)

    def mm(x, w):
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)

    h = jnp.maximum(mm(noise.astype(jnp.float32), ops[0]) + ops[1], 0.0)
    for i in range(3):
        wa, ba, wb, bb = ops[2 + 4 * i: 6 + 4 * i]
        y = jnp.maximum(mm(h, wa) + ba, 0.0)
        y = mm(y, wb) + bb
        h = jnp.maximum(y + h, 0.0)
    return mm(h, ops[-2]) + ops[-1]
