"""Golden tests for the DH forward-kinematics core (dhaug_tpu.ops.fk)."""
import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops import fk
from dhaug_tpu.ops.bones import bone_lengths_fk
from tests.reference_fk import reference_fk_single


def _random_inputs(rng, batch=()):
    angles = rng.uniform(-90, 90, size=batch + (33,))
    bone_len = rng.uniform(0.1, 0.7, size=batch + (15,))
    global_rot = rng.uniform(-180, 180, size=batch + (3,))
    root = rng.normal(size=batch + (3,))
    return angles, bone_len, global_rot, root


def test_zero_pose_canonical_layout():
    """Zero angles + canonical lengths must reproduce a fixed, symmetric
    T-pose-like layout (the reference's init_Fk_DH_angle golden fixture)."""
    pose = np.asarray(fk.init_fk_dh_angle(jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32))
    want = reference_fk_single(np.zeros(33), np.array(fk.CANONICAL_BONE_LEN),
                               np.zeros(3), np.zeros(3))
    np.testing.assert_allclose(pose, want, atol=1e-5)

    # structural sanity: hip at origin, left/right mirror symmetry in x
    np.testing.assert_allclose(pose[0], 0.0, atol=1e-6)
    for left, right in [(6, 1), (7, 2), (8, 3), (17, 25), (18, 26), (19, 27)]:
        np.testing.assert_allclose(pose[left, 0], -pose[right, 0], atol=1e-5)
        np.testing.assert_allclose(pose[left, 1:], pose[right, 1:], atol=1e-5)
    # unused 32-layout slots stay zero
    used = {s for (s, _, _) in fk._SCATTER}
    for slot in range(32):
        if slot not in used:
            np.testing.assert_allclose(pose[slot], 0.0, atol=1e-7)


def test_matches_naive_reference_on_random_poses():
    rng = np.random.default_rng(0)
    for _ in range(5):
        angles, bl, grot, root = _random_inputs(rng)
        got = np.asarray(fk.fk_world_pose(fk.FKInputs(
            jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
            jnp.asarray(grot, jnp.float32), jnp.asarray(root, jnp.float32))))
        want = reference_fk_single(angles, bl, grot, root)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_batched_equals_loop():
    rng = np.random.default_rng(1)
    angles, bl, grot, root = _random_inputs(rng, batch=(6,))
    batched = np.asarray(fk.fk_world_pose(fk.FKInputs(
        jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
        jnp.asarray(grot, jnp.float32), jnp.asarray(root, jnp.float32))))
    for i in range(6):
        single = np.asarray(fk.fk_world_pose(fk.FKInputs(
            jnp.asarray(angles[i], jnp.float32), jnp.asarray(bl[i], jnp.float32),
            jnp.asarray(grot[i], jnp.float32), jnp.asarray(root[i], jnp.float32))))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_bone_length_recovery():
    """FK output must reproduce its 15 input bone lengths exactly, for
    arbitrary joint angles — each bone corresponds to one rigid DH link."""
    rng = np.random.default_rng(2)
    angles, bl, grot, root = _random_inputs(rng, batch=(16,))
    pose16 = fk.fk_world_pose(fk.FKInputs(
        jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
        jnp.asarray(grot, jnp.float32), jnp.asarray(root, jnp.float32)), n_joints=16)
    got = np.asarray(bone_lengths_fk(pose16))
    # Head bone (8,9) maps 16-joint slots Thorax->Head; Head == Neck endpoint,
    # so its recovered length equals the neck input (index 14).
    np.testing.assert_allclose(got, bl, atol=3e-4)


def test_root_translation_and_global_rotation():
    rng = np.random.default_rng(3)
    angles, bl, _, _ = _random_inputs(rng)
    base = np.asarray(fk.fk_world_pose(fk.FKInputs(
        jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32)), n_joints=16))
    root = np.array([1.0, -2.0, 0.5], np.float32)
    shifted = np.asarray(fk.fk_world_pose(fk.FKInputs(
        jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.asarray(root)), n_joints=16))
    np.testing.assert_allclose(shifted - base, np.broadcast_to(root, base.shape), atol=1e-6)

    # rotation about z by 90 deg: (x, y) -> (-y, x), bone lengths preserved
    rot = np.asarray(fk.fk_world_pose(fk.FKInputs(
        jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
        jnp.asarray([0.0, 0.0, 90.0], dtype=jnp.float32), jnp.zeros(3, jnp.float32)), n_joints=16))
    np.testing.assert_allclose(rot[:, 0], -base[:, 1], atol=1e-5)
    np.testing.assert_allclose(rot[:, 1], base[:, 0], atol=1e-5)


def test_16_joint_gather_consistent():
    rng = np.random.default_rng(4)
    angles, bl, grot, root = _random_inputs(rng, batch=(3,))
    inputs = fk.FKInputs(jnp.asarray(angles, jnp.float32), jnp.asarray(bl, jnp.float32),
                         jnp.asarray(grot, jnp.float32), jnp.asarray(root, jnp.float32))
    p32 = np.asarray(fk.fk_world_pose(inputs, 32))
    p16 = np.asarray(fk.fk_world_pose(inputs, 16))
    np.testing.assert_allclose(p16, p32[:, np.array(fk.H36M_32_TO_16_TABLE)], atol=0)


def test_jit_and_grad():
    rng = np.random.default_rng(5)
    angles, bl, grot, root = _random_inputs(rng, batch=(4,))

    @jax.jit
    def loss(a):
        out = fk.fk_world_pose(fk.FKInputs(
            a, jnp.asarray(bl, jnp.float32),
            jnp.asarray(grot, jnp.float32), jnp.asarray(root, jnp.float32)), 16)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(jnp.asarray(angles, jnp.float32))
    assert g.shape == (4, 33)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
