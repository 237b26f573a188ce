"""Tests for quaternion / camera ops (dhaug_tpu.ops.camera, .quaternion)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhaug_tpu.ops import camera as cam
from dhaug_tpu.ops.quaternion import qinverse, qrot


def random_unit_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class TestQuaternion:
    def test_qrot_matches_rotation_matrix(self):
        rng = np.random.default_rng(0)
        q = random_unit_quat(rng)
        v = rng.normal(size=(3,))
        got = qrot(jnp.asarray(q), jnp.asarray(v))
        want = quat_to_matrix(q) @ v
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_qrot_batched_broadcast(self):
        rng = np.random.default_rng(1)
        q = random_unit_quat(rng, (8,))
        v = rng.normal(size=(8, 16, 3))
        got = qrot(jnp.asarray(q)[:, None, :], jnp.asarray(v))
        for i in range(8):
            want = v[i] @ quat_to_matrix(q[i]).T
            np.testing.assert_allclose(got[i], want, atol=1e-5)

    def test_qinverse_roundtrip(self):
        rng = np.random.default_rng(2)
        q = random_unit_quat(rng, (5,))
        v = rng.normal(size=(5, 3))
        out = qrot(qinverse(jnp.asarray(q)), qrot(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(out, v, atol=1e-6)


class TestScreenCoords:
    def test_normalize_roundtrip(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 1000, size=(10, 16, 2))
        w, h = 1000.0, 1002.0
        norm = cam.normalize_screen_coordinates(jnp.asarray(pts), w, h)
        back = cam.image_coordinates(norm, w, h)
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_normalization_convention(self):
        # x in [-1, 1]; y offset is h/w (aspect preserving), both scaled by 2/w.
        pt = jnp.array([[500.0, 501.0]])
        out = cam.normalize_screen_coordinates(pt, 1000.0, 1002.0)
        np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(out[0, 1], 501.0 / 1000 * 2 - 1.002, atol=1e-6)

    def test_does_not_mutate_input(self):
        pts = jnp.ones((2, 2))
        _ = cam.normalize_screen_coordinates(pts, 100, 100)
        np.testing.assert_allclose(pts, np.ones((2, 2)))


class TestWorldCamera:
    def test_world_camera_roundtrip(self):
        rng = np.random.default_rng(4)
        q = random_unit_quat(rng)
        t = rng.normal(size=(3,))
        X = rng.normal(size=(7, 16, 3))
        Xc = cam.world_to_camera(jnp.asarray(X), jnp.asarray(q), jnp.asarray(t))
        Xw = cam.camera_to_world(Xc, jnp.asarray(q), jnp.asarray(t))
        np.testing.assert_allclose(Xw, X, atol=1e-5)

    def test_batch_variants_agree(self):
        rng = np.random.default_rng(5)
        q = random_unit_quat(rng, (6,))
        t = rng.normal(size=(6, 3))
        X = rng.normal(size=(6, 16, 3))
        a = cam.camera_to_world_batch(jnp.asarray(X), jnp.asarray(q), jnp.asarray(t))
        for i in range(6):
            b = cam.camera_to_world(jnp.asarray(X[i]), jnp.asarray(q[i]), jnp.asarray(t[i]))
            np.testing.assert_allclose(a[i], b, atol=1e-6)


class TestProjection:
    def _intrinsics(self):
        # H36M camera 54138969 after screen normalization
        # (common/h36m_dataset.py:46-56 + :250-260).
        w, h = 1000.0, 1002.0
        f = np.array([1145.0494384765625, 1143.7811279296875]) / w * 2.0
        c = np.array([512.54150390625 / w * 2 - 1, 515.4514770507812 / w * 2 - h / w])
        k = np.array([-0.20709891617298126, 0.24777518212795258, -0.0030751503072679043])
        p = np.array([-0.0009756988729350269, -0.00142447161488235])
        return np.concatenate([f, c, k, p])[None]

    def test_pinhole_center(self):
        params = self._intrinsics()
        X = jnp.array([[[0.0, 0.0, 4.0]]])
        out = cam.project_to_2d(X, jnp.asarray(params))
        np.testing.assert_allclose(out[0, 0], params[0, 2:4], atol=1e-6)

    def test_linear_vs_full_small_offsets(self):
        params = self._intrinsics()
        rng = np.random.default_rng(6)
        X = rng.normal(size=(1, 16, 3)) * 0.05
        X[..., 2] += 4.0
        full = cam.project_to_2d(jnp.asarray(X), jnp.asarray(params))
        lin = cam.project_to_2d_linear(jnp.asarray(X), jnp.asarray(params))
        # Distortion is a small correction near the image center.
        assert np.max(np.abs(np.asarray(full) - np.asarray(lin))) < 1e-2
        assert np.max(np.abs(np.asarray(full) - np.asarray(lin))) > 1e-7

    def test_differentiable(self):
        params = jnp.asarray(self._intrinsics())

        def loss(X):
            return jnp.sum(cam.project_to_2d(X, params) ** 2)

        g = jax.grad(loss)(jnp.ones((1, 16, 3)) * jnp.array([0.1, 0.1, 4.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_accepts_16_param_vector(self):
        params = self._intrinsics()
        ext = np.concatenate([params, np.zeros((1, 7))], axis=1)
        X = jnp.array([[[0.1, -0.1, 4.0]]])
        a = cam.project_to_2d(X, jnp.asarray(params))
        b = cam.project_to_2d(X, jnp.asarray(ext))
        np.testing.assert_allclose(a, b, atol=1e-7)
