"""Pose-estimation metrics: MPJPE, P-MPJPE (Procrustes), PCK, AUC.

Capability parity with DH-AUG_master/utils/loss.py.  The reference computes
P-MPJPE with per-call numpy SVD on the host (utils/loss.py:123-164) and PCK
with a Python loop over samples (utils/loss.py:192-210); here everything is
batched jnp so evaluation runs on-device and jits.  Definitions are kept
bit-identical: metres in, scores in metres (callers scale by 1000 to mm, as
function_aug/model_pos_eval.py:60-62 does), PCK threshold 150 mm, AUC over 31
thresholds linspace(0, 150).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error ("Protocol #1")."""
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1))


def mpjpe_by_joint(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1), axis=0)


def weighted_mpjpe(predicted, target, w):
    return jnp.mean(w * jnp.linalg.norm(predicted - target, axis=-1))


def p_mpjpe_per_sample(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample Procrustes-aligned MPJPE, (N, J, 3) -> (N,).  Batched SVD
    on device; :func:`p_mpjpe` is its mean."""
    muX = jnp.mean(target, axis=1, keepdims=True)
    muY = jnp.mean(predicted, axis=1, keepdims=True)
    X0 = target - muX
    Y0 = predicted - muY
    normX = jnp.sqrt(jnp.sum(X0 ** 2, axis=(1, 2), keepdims=True))
    normY = jnp.sqrt(jnp.sum(Y0 ** 2, axis=(1, 2), keepdims=True))
    X0 = X0 / normX
    Y0 = Y0 / normY

    # fp32-pinned contractions: TPU's default bf16 multiply would perturb
    # the metre-scale alignment (and the reported P2 mm) by ~1-2 mm
    # (CLAUDE.md geometry-precision rule)
    _hi = jax.lax.Precision.HIGHEST
    H = jnp.matmul(jnp.swapaxes(X0, 1, 2), Y0, precision=_hi)
    U, s, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, 1, 2)
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2), precision=_hi)
    sign_detR = jnp.sign(jnp.linalg.det(R))[:, None]
    V = V.at[:, :, -1].multiply(sign_detR)
    s = s.at[:, -1].multiply(sign_detR[:, 0])
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2), precision=_hi)

    tr = jnp.sum(s, axis=1, keepdims=True)[:, :, None]
    a = tr * normX / normY
    t = muX - a * jnp.matmul(muY, R, precision=_hi)
    predicted_aligned = a * jnp.matmul(predicted, R, precision=_hi) + t
    return jnp.mean(jnp.linalg.norm(predicted_aligned - target, axis=-1), axis=-1)


def p_mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MPJPE after per-sample rigid alignment (scale, rotation, translation),
    "Protocol #2".  predicted/target: (N, J, 3).  Batched SVD on device."""
    return jnp.mean(p_mpjpe_per_sample(predicted, target))


def n_mpjpe(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Scale-normalized MPJPE (optimal per-sample scale on the prediction)."""
    norm_predicted = jnp.mean(jnp.sum(predicted ** 2, axis=-1, keepdims=True), axis=-2, keepdims=True)
    norm_target = jnp.mean(jnp.sum(target * predicted, axis=-1, keepdims=True), axis=-2, keepdims=True)
    scale = norm_target / norm_predicted
    return mpjpe(scale * predicted, target)


def mean_velocity_error(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    vp = jnp.diff(predicted, axis=0)
    vt = jnp.diff(target, axis=0)
    return jnp.mean(jnp.linalg.norm(vp - vt, axis=-1))


def compute_pck(gts: jnp.ndarray, preds: jnp.ndarray, scale: float = 1000.0,
                threshold: float = 150.0) -> jnp.ndarray:
    """Percentage of joints with error < ``threshold`` mm.  gts/preds (N, J, 3)
    in metres; ``scale`` converts to mm (reference hardcodes 1000,
    utils/loss.py:204)."""
    err = jnp.linalg.norm(preds - gts, axis=-1) * scale
    return jnp.mean((err < threshold).astype(jnp.float32)) * 100.0


def compute_auc(gts: jnp.ndarray, preds: jnp.ndarray, scale: float = 1000.0) -> jnp.ndarray:
    """Mean PCK over 31 thresholds in [0, 150] mm (3DHP protocol)."""
    err = jnp.linalg.norm(preds - gts, axis=-1) * scale  # (N, J) once
    thresholds = jnp.linspace(0.0, 150.0, 31)
    pcks = jax.vmap(lambda th: jnp.mean((err < th).astype(jnp.float32)) * 100.0)(thresholds)
    return jnp.mean(pcks)


def diff_range_loss(a, b, std):
    """Rectified L2 on (a-b): zero inside +-std, squared error outside."""
    diff = (a - b) ** 2
    weight = jnp.where(diff > std ** 2, 1.0, 0.0)
    return jnp.mean(diff * weight)


def rectified_l2_loss(gamma, threshold):
    diff = gamma ** 2
    weight = jnp.where(diff > threshold ** 2, 1.0, 0.0)
    return jnp.mean(diff * weight)
