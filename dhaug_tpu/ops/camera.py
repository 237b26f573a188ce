"""Camera model: screen normalization, world<->camera, H36M projection.

Capability parity with DH-AUG_master/common/camera.py.  Differences by design:

  * Pure functions — the reference's ``normalize_screen_coordinates`` mutates
    its input in place (common/camera.py:12-14) and callers rely on it; here
    every function returns a new array (JAX arrays are immutable anyway).
  * One shape-polymorphic implementation each — the reference carries separate
    numpy / torch / "GAN_torch_batch" / "video_GAN_torch" variants
    (common/camera.py:28-59); broadcasting makes them one function here.
  * Differentiable everywhere (project_to_2d is used inside the GAN loss).

The nonstandard aspect-preserving normalization (y uses w, offset h/w —
common/camera.py:13) is preserved exactly: 2D coords live in
[-1, 1] x [-h/w, h/w].
"""
from __future__ import annotations

import jax.numpy as jnp

from dhaug_tpu.ops.quaternion import qinverse, qrot


def normalize_screen_coordinates(points: jnp.ndarray, w: float, h: float) -> jnp.ndarray:
    """Pixel coords -> normalized coords in [-1,1] x [-h/w, h/w].  (..., 2)."""
    x = points[..., 0] / w * 2.0 - 1.0
    y = points[..., 1] / w * 2.0 - h / w
    return jnp.stack([x, y], axis=-1)


def image_coordinates(points: jnp.ndarray, w: float, h: float) -> jnp.ndarray:
    """Inverse of :func:`normalize_screen_coordinates`.  (..., 2)."""
    x = (points[..., 0] + 1.0) * w / 2.0
    y = (points[..., 1] + h / w) * w / 2.0
    return jnp.stack([x, y], axis=-1)


def world_to_camera(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """World -> camera frame.  X: (..., 3); R: quaternion broadcastable to
    (..., 4); t broadcastable to (..., 3)."""
    Rt = qinverse(R)
    Rt = jnp.broadcast_to(Rt, X.shape[:-1] + (4,))
    return qrot(Rt, X - t)


def camera_to_world(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Camera -> world frame (inverse of :func:`world_to_camera`)."""
    R = jnp.broadcast_to(R, X.shape[:-1] + (4,))
    return qrot(R, X) + t


def camera_to_world_batch(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-sample extrinsics: X (B, J, 3), R (B, 4), t (B, 3).

    Equivalent of the reference's GAN_torch_camera_to_world_batch
    (common/camera.py:53) without the manual repeat plumbing.
    """
    return camera_to_world(X, R[:, None, :], t[:, None, :])


def world_to_camera_batch(X: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Per-sample extrinsics world->camera: X (B, J, 3), R (B, 4) or (1, 4)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    if R.ndim == 2:
        R = R[:, None, :]
    if t.ndim == 2:
        t = t[:, None, :]
    return world_to_camera(X, R, t)


def project_to_2d(X: jnp.ndarray, camera_params: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space 3D points through the full H36M camera model.

    X: (N, ..., 3); camera_params: (N, 9) = [f(2), c(2), k(3), p(2)]
    (a (N, 16) intrinsic+extrinsic vector is accepted; only [:9] is used,
    matching common/camera.py:73,83).  The perspective divide is clamped to
    [-1, 1] exactly as the reference does (common/camera.py:85).
    Differentiable; this sits inside the GAN generator loss.
    """
    params = camera_params[..., :9]
    # Broadcast (N, 9) over the middle dims of X.
    while params.ndim < X.ndim:
        params = params[:, None]
    f = params[..., :2]
    c = params[..., 2:4]
    k = params[..., 4:7]
    p = params[..., 7:9]

    XX = jnp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(XX ** 2, axis=-1, keepdims=True)
    radial = 1.0 + jnp.sum(
        k * jnp.concatenate([r2, r2 ** 2, r2 ** 3], axis=-1), axis=-1, keepdims=True
    )
    tan = jnp.sum(p * XX, axis=-1, keepdims=True)
    XXX = XX * (radial + tan) + p * r2
    return f * XXX + c


def project_to_2d_linear(X: jnp.ndarray, camera_params: jnp.ndarray) -> jnp.ndarray:
    """Pinhole-only projection (focal length + principal point)."""
    params = camera_params[..., :9]
    while params.ndim < X.ndim:
        params = params[:, None]
    f = params[..., :2]
    c = params[..., 2:4]
    XX = jnp.clip(X[..., :2] / X[..., 2:], -1.0, 1.0)
    return f * XX + c
