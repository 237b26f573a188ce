"""Fused Pallas TPU kernel for the DH forward-kinematics chain.

The XLA lowering of :func:`dhaug_tpu.ops.fk.fk_world_pose` is ~150 small
fused elementwise ops (33 link constructions + 28 chain products on (B,3,3)
tensors).  This kernel evaluates the whole skeleton in ONE pass with the
batch on the lane dimension: every scalar of the chain algebra becomes a
(1, TB) row vector, the five chains unroll at trace time, and all rotation
state lives in registers/VMEM — no HBM traffic between links.

Layout contract: inputs arrive transposed, features-major —
  angles_t     (33, B)   degrees, chain-packed order (see ops.fk)
  bone_len_t   (15, B)   metres, FK bone order
  global_rot_t (3, B)    degrees, XYZ Euler
  root_t       (3, B)    metres
output: pose16_t (48, B) = 16 joints x 3 coords, joint-major.
:func:`fk_world_pose_pallas` wraps the kernel with the (B, ...) <-> (..., B)
transposes and returns (B, 16, 3) like the XLA path.

Precision: fp32 throughout on the VPU (no MXU involved), so this kernel is
bit-comparable to the precision-pinned XLA path to ~1e-6.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dhaug_tpu.ops import fk as fkspec

_DEG = math.pi / 180.0

# (slot16, chain, joint) scatter in 16-joint order, derived from the 32-slot
# scatter + the 32->16 gather.
_SCATTER16 = []
for slot16, slot32 in enumerate(fkspec.H36M_32_TO_16_TABLE):
    for (s, chain, joint) in fkspec._SCATTER:
        if s == slot32:
            _SCATTER16.append((slot16, chain, joint))
            break
assert len(_SCATTER16) == 16


def _rot_apply(R, v):
    """R: tuple of 9 rows (r00..r22); v: tuple of 3 rows -> 3 rows."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    x, y, z = v
    return (r00 * x + r01 * y + r02 * z,
            r10 * x + r11 * y + r12 * z,
            r20 * x + r21 * y + r22 * z)


def _rot_mul(A, B):
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = B
    return (
        a00 * b00 + a01 * b10 + a02 * b20,
        a00 * b01 + a01 * b11 + a02 * b21,
        a00 * b02 + a01 * b12 + a02 * b22,
        a10 * b00 + a11 * b10 + a12 * b20,
        a10 * b01 + a11 * b11 + a12 * b21,
        a10 * b02 + a11 * b12 + a12 * b22,
        a20 * b00 + a21 * b10 + a22 * b20,
        a20 * b01 + a21 * b11 + a22 * b21,
        a20 * b02 + a21 * b12 + a22 * b22,
    )


def _link(alpha_deg: float, theta0_deg: float, theta_row, a_row, d_row):
    """One DH link as (Q rows, t rows).  alpha/theta0 are compile-time
    constants; theta/a/d are (1, TB) rows."""
    al = alpha_deg * _DEG
    ca, sa = math.cos(al), math.sin(al)
    th = (theta_row + theta0_deg) * _DEG
    ct, st = jnp.cos(th), jnp.sin(th)
    zero = jnp.zeros_like(ct)
    Q = (ct, -st, zero,
         st * ca, ct * ca, jnp.full_like(ct, -sa),
         st * sa, ct * sa, jnp.full_like(ct, ca))
    t = (a_row, -sa * d_row, ca * d_row)
    return Q, t


def _walk(links, start=None):
    """Unrolled (R, p) chain walk over [(Q, t), ...].  Returns list of
    positions and the rotation after each link."""
    positions, rotations = [], []
    R, p = (None, None) if start is None else start
    for Q, t in links:
        if R is None:
            p = t
            R = Q
        else:
            tx, ty, tz = _rot_apply(R, t)
            p = (p[0] + tx, p[1] + ty, p[2] + tz)
            R = _rot_mul(R, Q)
        positions.append(p)
        rotations.append(R)
    return positions, rotations


def _fk_kernel(angles_ref, bone_ref, grot_ref, root_ref, out_ref):
    ang = lambda i: angles_ref[i, :]
    bl = lambda i: bone_ref[i, :]
    zero = jnp.zeros_like(angles_ref[0, :])

    # --- build the five chains' links -------------------------------------
    def chain(alphas, theta0s, angles, a_rows, d_rows):
        return [_link(alphas[i], theta0s[i], angles[i], a_rows[i], d_rows[i])
                for i in range(len(alphas))]

    z5 = [zero] * 5
    right_leg = chain(fkspec.RIGHT_LEG_ALPHA, fkspec.RIGHT_LEG_THETA,
                      [ang(i) for i in range(0, 5)],
                      [bl(5), zero, zero, bl(3), bl(1)], z5)
    left_leg = chain(fkspec.LEFT_LEG_ALPHA, fkspec.LEFT_LEG_THETA,
                     [ang(i) for i in range(5, 10)],
                     [-bl(4), zero, zero, bl(2), bl(0)], z5)
    body = chain(fkspec.BODY_ALPHA, fkspec.BODY_THETA,
                 [ang(i) for i in range(10, 23)],
                 [zero] * 12 + [bl(14)],
                 [zero, zero, zero, bl(6), zero, zero, bl(7)] + [zero] * 6)
    right_hand = chain(fkspec.RIGHT_HAND_ALPHA, fkspec.RIGHT_HAND_THETA,
                       [ang(i) for i in range(23, 28)],
                       [-bl(9), zero, zero, bl(11), bl(13)], z5)
    left_hand = chain(fkspec.LEFT_HAND_ALPHA, fkspec.LEFT_HAND_THETA,
                      [ang(i) for i in range(28, 33)],
                      [bl(8), zero, zero, bl(10), bl(12)], z5)

    # --- walk them ---------------------------------------------------------
    rl_pos, _ = _walk(right_leg)
    ll_pos, _ = _walk(left_leg)
    body_pos, body_rot = _walk(body)
    rh_tail, _ = _walk(right_hand, start=(body_rot[8], body_pos[8]))
    lh_tail, _ = _walk(left_hand, start=(body_rot[8], body_pos[8]))

    chains = {"right_leg": rl_pos, "left_leg": ll_pos, "body": body_pos,
              "right_hand": {9 + i: p for i, p in enumerate(rh_tail)},
              "left_hand": {9 + i: p for i, p in enumerate(lh_tail)}}

    # --- global rotation Rx@Ry@Rz (closed form) + root ---------------------
    gx = grot_ref[0, :] * _DEG
    gy = grot_ref[1, :] * _DEG
    gz = grot_ref[2, :] * _DEG
    cx, sx = jnp.cos(gx), jnp.sin(gx)
    cy, sy = jnp.cos(gy), jnp.sin(gy)
    cz, sz = jnp.cos(gz), jnp.sin(gz)
    Rg = (cy * cz, -cy * sz, sy,
          sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy,
          -cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy)

    rx, ry, rz = root_ref[0, :], root_ref[1, :], root_ref[2, :]
    for slot16, chain_name, joint in _SCATTER16:
        p = chains[chain_name][joint]
        wx, wy, wz = _rot_apply(Rg, p)
        out_ref[slot16 * 3 + 0, :] = wx + rx
        out_ref[slot16 * 3 + 1, :] = wy + ry
        out_ref[slot16 * 3 + 2, :] = wz + rz


def fk_pallas_supported() -> bool:
    """True when the fused kernel can run natively — TPU backends only (the
    kernel lowers through Mosaic; a GPU or other non-TPU backend would fail
    at compile time, and the CPU backend only supports interpret mode, which
    is for tests).  This environment's tunneled backend reports platform
    'tpu'."""
    try:
        return jax.devices()[0].platform in ("tpu",)
    except Exception:  # pragma: no cover - backend init failure
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def fk_world_pose_pallas(angles: jnp.ndarray, bone_len: jnp.ndarray,
                         global_rot: jnp.ndarray, root: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas-fused equivalent of fk_world_pose(..., n_joints=16).

    angles (B, 33), bone_len (B, 15), global_rot (B, 3), root (B, 3) ->
    (B, 16, 3).  B is padded to a multiple of the 512-lane tile internally.
    """
    B = angles.shape[0]
    TB = 512
    Bp = -(-B // TB) * TB
    pad = Bp - B

    def prep(x):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x.T  # features-major

    out_t = pl.pallas_call(
        _fk_kernel,
        out_shape=jax.ShapeDtypeStruct((48, Bp), jnp.float32),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((33, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((15, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((48, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(prep(angles), prep(bone_len), prep(global_rot), prep(root))

    pose = out_t.T.reshape((Bp, 16, 3))
    return pose[:B]


def fk_world_pose_pallas_sharded(mesh, angles, bone_len, global_rot, root,
                                 axis: str = "data", interpret: bool = False):
    """Run the fused kernel under a Mesh with the batch sharded over
    ``axis``: each device executes the kernel on its local shard
    (embarrassingly parallel — no collectives).  Pallas kernels don't
    partition automatically under GSPMD, so this is the multi-chip entry
    point for bulk synthesis."""
    from jax.sharding import PartitionSpec as P

    spec = P(axis)
    body = lambda a, b, g, r: fk_world_pose_pallas(a, b, g, r,
                                                   interpret=interpret)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec, spec),
                  out_specs=spec)
    try:
        from jax import shard_map  # jax >= 0.6
        # the pallas_call's out_shape carries no vma info
        fn = shard_map(body, check_vma=False, **kwargs)
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        fn = shard_map(body, check_rep=False, **kwargs)
    return fn(angles, bone_len, global_rot, root)
