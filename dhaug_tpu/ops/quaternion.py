"""Quaternion rotation ops (pure jnp, shape-polymorphic, differentiable).

Capability parity with the reference's torch quaternion helpers
(DH-AUG_master/common/quaternion.py:6,27): rotate vectors by unit quaternions
and invert unit quaternions.  Unlike the reference these are written once for
any leading batch shape — broadcasting replaces the reference's explicit
``repeat``/``tile`` plumbing (DH-AUG_master/common/camera.py:33,38,48-51).
"""
from __future__ import annotations

import jax.numpy as jnp


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q`` (w, x, y, z).

    q: (..., 4), v: (..., 3); leading dims broadcast.  Returns (..., 3).
    Uses the cross-product form v + 2*(w*(qv x v) + qv x (qv x v)).
    """
    w = q[..., :1]
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (w * uv + uuv)


def qinverse(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion: (w, -x, -y, -z)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
