"""Tests for dhaug_tpu.ops.metrics."""
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops import metrics as M


def _rot(axis_angles):
    ax, ay, az = axis_angles
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


def test_mpjpe_zero_for_identical():
    x = jnp.ones((4, 16, 3))
    assert float(M.mpjpe(x, x)) == 0.0


def test_mpjpe_known_value():
    a = jnp.zeros((1, 2, 3))
    b = jnp.asarray(np.array([[[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]]]))
    np.testing.assert_allclose(float(M.mpjpe(a, b)), 2.5, atol=1e-6)


def test_p_mpjpe_invariant_to_similarity_transform():
    rng = np.random.default_rng(0)
    target = rng.normal(size=(8, 16, 3))
    R = _rot((0.3, -0.8, 1.2))
    pred = 1.7 * target @ R.T + np.array([0.5, -2.0, 3.0])
    score = float(M.p_mpjpe(jnp.asarray(pred), jnp.asarray(target)))
    assert score < 1e-5


def test_p_mpjpe_handles_reflection_fix():
    rng = np.random.default_rng(1)
    target = rng.normal(size=(4, 16, 3))
    pred = target.copy()
    pred[..., 0] *= -1  # mirrored pose: best proper rotation is NOT a reflection
    score = float(M.p_mpjpe(jnp.asarray(pred), jnp.asarray(target)))
    assert np.isfinite(score) and score > 0


def test_p_mpjpe_matches_numpy_reference():
    # Cross-check the batched SVD path against a direct per-sample computation.
    rng = np.random.default_rng(2)
    target = rng.normal(size=(6, 16, 3))
    pred = target + 0.05 * rng.normal(size=(6, 16, 3))

    def single(p, t):
        muX, muY = t.mean(0), p.mean(0)
        X0, Y0 = t - muX, p - muY
        nX = np.sqrt((X0 ** 2).sum())
        nY = np.sqrt((Y0 ** 2).sum())
        X0, Y0 = X0 / nX, Y0 / nY
        U, s, Vt = np.linalg.svd(X0.T @ Y0)
        V = Vt.T
        R = V @ U.T
        sign = np.sign(np.linalg.det(R))
        V[:, -1] *= sign
        s[-1] *= sign
        R = V @ U.T
        a = s.sum() * nX / nY
        tr = muX - a * muY @ R
        aligned = a * p @ R + tr
        return np.linalg.norm(aligned - t, axis=-1).mean()

    want = np.mean([single(pred[i], target[i]) for i in range(6)])
    got = float(M.p_mpjpe(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pck_identical_is_100():
    x = jnp.ones((5, 16, 3))
    assert float(M.compute_pck(x, x)) == 100.0


def test_pck_threshold():
    gts = jnp.zeros((1, 2, 3))
    # one joint at 100mm error, one at 200mm
    preds = jnp.asarray(np.array([[[0.1, 0, 0], [0.2, 0, 0]]]))
    np.testing.assert_allclose(float(M.compute_pck(gts, preds)), 50.0, atol=1e-5)


def test_auc_between_0_and_100_and_below_pck():
    rng = np.random.default_rng(3)
    gts = rng.normal(size=(10, 16, 3)) * 0.3
    preds = gts + rng.normal(size=(10, 16, 3)) * 0.05
    pck = float(M.compute_pck(jnp.asarray(gts), jnp.asarray(preds)))
    auc = float(M.compute_auc(jnp.asarray(gts), jnp.asarray(preds)))
    assert 0.0 <= auc <= pck <= 100.0


def test_diff_range_loss_dead_zone():
    a = jnp.asarray([0.1, 2.0])
    b = jnp.zeros((2,))
    out = float(M.diff_range_loss(a, b, std=0.5))
    np.testing.assert_allclose(out, (2.0 ** 2) / 2, atol=1e-6)


def test_rectified_l2_dead_zone():
    g = jnp.asarray([0.1, -3.0])
    out = float(M.rectified_l2_loss(g, threshold=1.0))
    np.testing.assert_allclose(out, 9.0 / 2, atol=1e-6)
