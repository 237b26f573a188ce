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


# ---------------------------------------------------------------------------
# Hand-derived backward kernel + custom_vjp (round-3 VERDICT missing #3):
# makes the fused kernel differentiable so the generator / video-generator
# updates can run it too (reference hot loop 2 is differentiable end to end,
# forward_kinematics_DH_model.py:659-677).
#
# Reverse-mode through the (R, p) chain recurrence, derived from
#   p_i = p_{i-1} + R_{i-1} t_i ,   R_i = R_{i-1} Q_i :
#   dt_i      = R_{i-1}^T dp_acc
#   dQ_i      = R_{i-1}^T dR_acc
#   dR_{i-1}  = dR_acc Q_i^T + dp_acc (x) t_i      (dp_acc accumulates down)
# with the arm chains' (dR_start, dp_start) injected into body link 8, and
# the global-rotation gradient contracted against the closed-form Euler
# partials.  The backward recomputes the forward links in registers (VMEM
# residuals would cost more than the ~33-link recompute).
# ---------------------------------------------------------------------------


def _rot_T_apply(R, v):
    """R^T v for 9-row R, 3-row v."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    x, y, z = v
    return (r00 * x + r10 * y + r20 * z,
            r01 * x + r11 * y + r21 * z,
            r02 * x + r12 * y + r22 * z)


def _rot_mul_T1(A, B):
    """A^T @ B (c_ij = sum_k a_ki b_kj)."""
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = B
    return (
        a00 * b00 + a10 * b10 + a20 * b20,
        a00 * b01 + a10 * b11 + a20 * b21,
        a00 * b02 + a10 * b12 + a20 * b22,
        a01 * b00 + a11 * b10 + a21 * b20,
        a01 * b01 + a11 * b11 + a21 * b21,
        a01 * b02 + a11 * b12 + a21 * b22,
        a02 * b00 + a12 * b10 + a22 * b20,
        a02 * b01 + a12 * b11 + a22 * b21,
        a02 * b02 + a12 * b12 + a22 * b22,
    )


def _rot_mul_T2(A, B):
    """A @ B^T (c_ij = sum_k a_ik b_jk)."""
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = A
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = B
    return (
        a00 * b00 + a01 * b01 + a02 * b02,
        a00 * b10 + a01 * b11 + a02 * b12,
        a00 * b20 + a01 * b21 + a02 * b22,
        a10 * b00 + a11 * b01 + a12 * b02,
        a10 * b10 + a11 * b11 + a12 * b12,
        a10 * b20 + a11 * b21 + a12 * b22,
        a20 * b00 + a21 * b01 + a22 * b02,
        a20 * b10 + a21 * b11 + a22 * b12,
        a20 * b20 + a21 * b21 + a22 * b22,
    )


def _outer3(g, v):
    """g (x) v for 3-rows -> 9 rows."""
    gx, gy, gz = g
    vx, vy, vz = v
    return (gx * vx, gx * vy, gx * vz,
            gy * vx, gy * vy, gy * vz,
            gz * vx, gz * vy, gz * vz)


def _add3(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _add9(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _walk_bwd(links, rotations, dp_ext, dR_ext, start_R=None):
    """Reverse walk of one chain.

    links: [(Q, t), ...]; rotations: forward cumulative rotations [R_i]
    (INCLUDING the start rotation composed in, as _walk returns them);
    dp_ext/dR_ext: per-link external cotangents (None = zero).
    Returns (dQ per link, dt per link, dR_start, dp_start) where the start
    grads are meaningful only when start_R was given (arm chains).
    """
    L = len(links)
    zero = jnp.zeros_like(links[0][1][0])
    dp = (zero, zero, zero)
    dR = (zero,) * 9
    dQs, dts = [None] * L, [None] * L
    for i in reversed(range(L)):
        if dp_ext[i] is not None:
            dp = _add3(dp, dp_ext[i])
        if dR_ext[i] is not None:
            dR = _add9(dR, dR_ext[i])
        Q, t = links[i]
        if i > 0:
            Rprev = rotations[i - 1]
        else:
            Rprev = start_R  # None means identity
        if Rprev is None:
            dts[i] = dp
            dQs[i] = dR
        else:
            dts[i] = _rot_T_apply(Rprev, dp)
            dQs[i] = _rot_mul_T1(Rprev, dR)
        dR = _add9(_rot_mul_T2(dR, Q), _outer3(dp, t))
        # dp flows through unchanged (p_{i-1} term)
    return dQs, dts, dR, dp


def _dangle_rows(theta0s, angle_rows, alphas, dQs):
    """Per-link dL/dangle (degrees) from dQ cotangents."""
    out = []
    for i, dQ in enumerate(dQs):
        al = alphas[i] * _DEG
        ca, sa = math.cos(al), math.sin(al)
        th = (angle_rows[i] + theta0s[i]) * _DEG
        ct, st = jnp.cos(th), jnp.sin(th)
        dq00, dq01, _, dq10, dq11, _, dq20, dq21, _ = dQ
        drad = (-st * dq00 - ct * dq01
                + ca * (ct * dq10 - st * dq11)
                + sa * (ct * dq20 - st * dq21))
        out.append(drad * _DEG)
    return out


def _da_dd(alphas, dts):
    """Per-link (da, dd) from dt cotangents: t = (a, -sa d, ca d)."""
    das, dds = [], []
    for i, dt in enumerate(dts):
        al = alphas[i] * _DEG
        ca, sa = math.cos(al), math.sin(al)
        das.append(dt[0])
        dds.append(-sa * dt[1] + ca * dt[2])
    return das, dds


def _fk_bwd_kernel(angles_ref, bone_ref, grot_ref, g_ref,
                   dang_ref, dbl_ref, dgrot_ref, droot_ref):
    ang = lambda i: angles_ref[i, :]
    bl = lambda i: bone_ref[i, :]
    zero = jnp.zeros_like(angles_ref[0, :])

    # --- recompute the forward links / rotations / positions ---------------
    def chain(alphas, theta0s, angles, a_rows, d_rows):
        return [_link(alphas[i], theta0s[i], angles[i], a_rows[i], d_rows[i])
                for i in range(len(alphas))]

    z5 = [zero] * 5
    rl_ang = [ang(i) for i in range(0, 5)]
    ll_ang = [ang(i) for i in range(5, 10)]
    bd_ang = [ang(i) for i in range(10, 23)]
    rh_ang = [ang(i) for i in range(23, 28)]
    lh_ang = [ang(i) for i in range(28, 33)]
    right_leg = chain(fkspec.RIGHT_LEG_ALPHA, fkspec.RIGHT_LEG_THETA, rl_ang,
                      [bl(5), zero, zero, bl(3), bl(1)], z5)
    left_leg = chain(fkspec.LEFT_LEG_ALPHA, fkspec.LEFT_LEG_THETA, ll_ang,
                     [-bl(4), zero, zero, bl(2), bl(0)], z5)
    body = chain(fkspec.BODY_ALPHA, fkspec.BODY_THETA, bd_ang,
                 [zero] * 12 + [bl(14)],
                 [zero, zero, zero, bl(6), zero, zero, bl(7)] + [zero] * 6)
    right_hand = chain(fkspec.RIGHT_HAND_ALPHA, fkspec.RIGHT_HAND_THETA,
                       rh_ang, [-bl(9), zero, zero, bl(11), bl(13)], z5)
    left_hand = chain(fkspec.LEFT_HAND_ALPHA, fkspec.LEFT_HAND_THETA,
                      lh_ang, [bl(8), zero, zero, bl(10), bl(12)], z5)

    rl_pos, rl_rot = _walk(right_leg)
    ll_pos, ll_rot = _walk(left_leg)
    body_pos, body_rot = _walk(body)
    rh_tail, rh_rot = _walk(right_hand, start=(body_rot[8], body_pos[8]))
    lh_tail, lh_rot = _walk(left_hand, start=(body_rot[8], body_pos[8]))
    chains_pos = {"right_leg": rl_pos, "left_leg": ll_pos, "body": body_pos,
                  "right_hand": {9 + i: p for i, p in enumerate(rh_tail)},
                  "left_hand": {9 + i: p for i, p in enumerate(lh_tail)}}

    # --- global rotation + its closed-form Euler partials -------------------
    gx = grot_ref[0, :] * _DEG
    gy = grot_ref[1, :] * _DEG
    gz = grot_ref[2, :] * _DEG
    cx, sx = jnp.cos(gx), jnp.sin(gx)
    cy, sy = jnp.cos(gy), jnp.sin(gy)
    cz, sz = jnp.cos(gz), jnp.sin(gz)
    Rg = (cy * cz, -cy * sz, sy,
          sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy,
          -cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy)
    zer = jnp.zeros_like(cx)
    dRg_dx = (zer, zer, zer,
              cx * sy * cz - sx * sz, -cx * sy * sz - sx * cz, -cx * cy,
              sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy)
    dRg_dy = (-sy * cz, sy * sz, cy,
              sx * cy * cz, -sx * cy * sz, sx * sy,
              -cx * cy * cz, cx * cy * sz, -cx * sy)
    dRg_dz = (-cy * sz, -cy * cz, zer,
              -sx * sy * sz + cx * cz, -sx * sy * cz - cx * sz, zer,
              cx * sy * sz + sx * cz, cx * sy * cz - sx * sz, zer)

    # --- scatter cotangents: dRg accumulation + per-joint dp ---------------
    g_rows = lambda s: (g_ref[s * 3 + 0, :], g_ref[s * 3 + 1, :],
                        g_ref[s * 3 + 2, :])
    dRg = (zer,) * 9
    droot = (zer, zer, zer)
    # per-chain, per-joint dp buckets (some joints never scattered -> None)
    dp_buckets = {
        "right_leg": [None] * 5, "left_leg": [None] * 5,
        "body": [None] * 13, "right_hand": [None] * 5, "left_hand": [None] * 5}

    def bucket_add(name, idx, v):
        cur = dp_buckets[name][idx]
        dp_buckets[name][idx] = v if cur is None else _add3(cur, v)

    for slot16, chain_name, joint in _SCATTER16:
        gw = g_rows(slot16)
        droot = _add3(droot, gw)
        u = chains_pos[chain_name][joint]
        dRg = _add9(dRg, _outer3(gw, u))
        du = _rot_T_apply(Rg, gw)
        local = joint - 9 if chain_name in ("right_hand", "left_hand") else joint
        bucket_add(chain_name, local, du)

    # --- reverse walks -------------------------------------------------------
    none5 = [None] * 5
    none13 = [None] * 13
    rl_dQ, rl_dt, _, _ = _walk_bwd(right_leg, rl_rot,
                                   dp_buckets["right_leg"], none5)
    ll_dQ, ll_dt, _, _ = _walk_bwd(left_leg, ll_rot,
                                   dp_buckets["left_leg"], none5)
    rh_dQ, rh_dt, rh_dRs, rh_dps = _walk_bwd(
        right_hand, rh_rot, dp_buckets["right_hand"], none5,
        start_R=body_rot[8])
    lh_dQ, lh_dt, lh_dRs, lh_dps = _walk_bwd(
        left_hand, lh_rot, dp_buckets["left_hand"], none5,
        start_R=body_rot[8])
    # arms hang off body link 8's cumulative (R, p)
    bucket_add("body", 8, _add3(rh_dps, lh_dps))
    body_dR_ext = list(none13)
    body_dR_ext[8] = _add9(rh_dRs, lh_dRs)
    bd_dQ, bd_dt, _, _ = _walk_bwd(body, body_rot, dp_buckets["body"],
                                   body_dR_ext)

    # --- dQ -> dangle, dt -> (da, dd) ---------------------------------------
    rl_da = _dangle_rows(fkspec.RIGHT_LEG_THETA, rl_ang,
                         fkspec.RIGHT_LEG_ALPHA, rl_dQ)
    ll_da = _dangle_rows(fkspec.LEFT_LEG_THETA, ll_ang,
                         fkspec.LEFT_LEG_ALPHA, ll_dQ)
    bd_da = _dangle_rows(fkspec.BODY_THETA, bd_ang, fkspec.BODY_ALPHA, bd_dQ)
    rh_da = _dangle_rows(fkspec.RIGHT_HAND_THETA, rh_ang,
                         fkspec.RIGHT_HAND_ALPHA, rh_dQ)
    lh_da = _dangle_rows(fkspec.LEFT_HAND_THETA, lh_ang,
                         fkspec.LEFT_HAND_ALPHA, lh_dQ)
    for i, row in enumerate(rl_da + ll_da + bd_da + rh_da + lh_da):
        dang_ref[i, :] = row

    rl_a, _ = _da_dd(fkspec.RIGHT_LEG_ALPHA, rl_dt)
    ll_a, _ = _da_dd(fkspec.LEFT_LEG_ALPHA, ll_dt)
    bd_a, bd_d = _da_dd(fkspec.BODY_ALPHA, bd_dt)
    rh_a, _ = _da_dd(fkspec.RIGHT_HAND_ALPHA, rh_dt)
    lh_a, _ = _da_dd(fkspec.LEFT_HAND_ALPHA, lh_dt)
    # bone_len slots (ops/fk.py:240-245): sign flips where a = -bl
    dbl_ref[0, :] = ll_a[4]          # left_small_leg
    dbl_ref[1, :] = rl_a[4]          # right_small_leg
    dbl_ref[2, :] = ll_a[3]          # left_big_leg
    dbl_ref[3, :] = rl_a[3]          # right_big_leg
    dbl_ref[4, :] = -ll_a[0]         # left_hip  (a0 = -bl4)
    dbl_ref[5, :] = rl_a[0]          # right_hip
    dbl_ref[6, :] = bd_d[3]          # waist    (d3)
    dbl_ref[7, :] = bd_d[6]          # thorax   (d6)
    dbl_ref[8, :] = lh_a[0]          # left_shoulder
    dbl_ref[9, :] = -rh_a[0]         # right_shoulder (a0 = -bl9)
    dbl_ref[10, :] = lh_a[3]         # left_big_arm
    dbl_ref[11, :] = rh_a[3]         # right_big_arm
    dbl_ref[12, :] = lh_a[4]         # left_small_arm
    dbl_ref[13, :] = rh_a[4]         # right_small_arm
    dbl_ref[14, :] = bd_a[12]        # neck

    # --- dRg -> dglobal_rot (degrees) ---------------------------------------
    def contract(dA):
        return sum(a * b for a, b in zip(dRg, dA))

    dgrot_ref[0, :] = contract(dRg_dx) * _DEG
    dgrot_ref[1, :] = contract(dRg_dy) * _DEG
    dgrot_ref[2, :] = contract(dRg_dz) * _DEG

    droot_ref[0, :] = droot[0]
    droot_ref[1, :] = droot[1]
    droot_ref[2, :] = droot[2]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fk_bwd_pallas(angles, bone_len, global_rot, g_pose16,
                  interpret: bool = False):
    """Backward kernel wrapper: cotangent g (B, 16, 3) ->
    (dangles (B, 33), dbone_len (B, 15), dglobal_rot (B, 3), droot (B, 3))."""
    B = angles.shape[0]
    TB = 512
    Bp = -(-B // TB) * TB
    pad = Bp - B

    def prep(x):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
        return x.reshape(Bp, -1).T

    outs = pl.pallas_call(
        _fk_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((33, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((15, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((3, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((3, Bp), jnp.float32)],
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((33, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((15, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((33, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((15, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(prep(angles), prep(bone_len), prep(global_rot), prep(g_pose16))

    dang, dbl, dgrot, droot = outs
    return (dang.T[:B], dbl.T[:B], dgrot.T[:B], droot.T[:B])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fk_pallas_diff(interpret, angles, bone_len, global_rot, root):
    return fk_world_pose_pallas(angles, bone_len, global_rot, root,
                                interpret=interpret)


def _fk_pallas_diff_fwd(interpret, angles, bone_len, global_rot, root):
    out = fk_world_pose_pallas(angles, bone_len, global_rot, root,
                               interpret=interpret)
    return out, (angles, bone_len, global_rot)


def _fk_pallas_diff_bwd(interpret, res, g):
    angles, bone_len, global_rot = res
    dang, dbl, dgrot, droot = fk_bwd_pallas(angles, bone_len, global_rot, g,
                                            interpret=interpret)
    return (dang.astype(angles.dtype), dbl.astype(bone_len.dtype),
            dgrot.astype(global_rot.dtype), droot.astype(global_rot.dtype))


_fk_pallas_diff.defvjp(_fk_pallas_diff_fwd, _fk_pallas_diff_bwd)


def fk_world_pose_pallas_vjp(angles, bone_len, global_rot, root,
                             interpret: bool = False):
    """Differentiable fused FK: forward = the Pallas kernel, backward = the
    hand-derived reverse-chain Pallas kernel (gradcheck vs the XLA path in
    tests/test_fk_pallas.py).  Drop-in for fk_world_pose_16 on gradient
    paths (the generator and video-generator updates)."""
    return _fk_pallas_diff(interpret, angles, bone_len, global_rot, root)


def fk_world_pose_pallas_sharded(mesh, angles, bone_len, global_rot, root,
                                 axis: str = "data", interpret: bool = False):
    """Run the fused kernel under a Mesh with the batch sharded over
    ``axis``: each device executes the kernel on its local shard
    (embarrassingly parallel — no collectives).  Pallas kernels don't
    partition automatically under GSPMD, so this is the multi-chip entry
    point for bulk synthesis."""
    from jax.sharding import PartitionSpec as P

    spec = P(axis)
    # the vjp-wrapped kernel: identical forward, and the shard_mapped body
    # stays differentiable (custom_vjp transposes per shard)
    body = lambda a, b, g, r: fk_world_pose_pallas_vjp(a, b, g, r,
                                                       interpret=interpret)
    from dhaug_tpu.parallel.mesh import shard_map_unchecked
    fn = shard_map_unchecked(body, mesh=mesh,
                             in_specs=(spec, spec, spec, spec),
                             out_specs=spec)
    return fn(angles, bone_len, global_rot, root)
