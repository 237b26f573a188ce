"""Tests for bone algebra / KCS features (dhaug_tpu.ops.bones)."""
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops import bones as B
from dhaug_tpu.ops import fk


def _random_pose(rng, batch=(4,)):
    return rng.normal(size=batch + (16, 3)).astype(np.float32)


def test_bone_vectors_fk_definition():
    rng = np.random.default_rng(0)
    pose = _random_pose(rng)
    vecs = np.asarray(B.bone_vectors_fk(jnp.asarray(pose)))
    for b, (i, j) in enumerate(fk.USED_16KEY_15BONE_TABLE):
        np.testing.assert_allclose(vecs[:, b], pose[:, j] - pose[:, i], atol=1e-6)


def test_bone_vectors_tree_definition():
    rng = np.random.default_rng(1)
    pose = _random_pose(rng)
    vecs = np.asarray(B.bone_vectors_tree(jnp.asarray(pose)))
    for b, (parent, child) in enumerate(B.H36M_TREE_BONES):
        np.testing.assert_allclose(vecs[:, b], pose[:, child] - pose[:, parent], atol=1e-6)


def test_pose_bone_roundtrip_tree():
    rng = np.random.default_rng(2)
    pose = _random_pose(rng)
    rel = pose - pose[:, :1]
    rec = np.asarray(B.pose_from_bone_vectors_tree(B.bone_vectors_tree(jnp.asarray(rel))))
    np.testing.assert_allclose(rec, rel, atol=1e-5)


def test_reskin_preserves_directions_and_sets_lengths():
    rng = np.random.default_rng(3)
    pose = _random_pose(rng, (6,))
    new_len = rng.uniform(0.2, 0.8, size=(6, 15)).astype(np.float32)
    out = B.reskin_pose(jnp.asarray(pose), jnp.asarray(new_len))
    out_vecs = B.bone_vectors_tree(out)
    np.testing.assert_allclose(np.asarray(B.bone_lengths(out_vecs)), new_len, atol=1e-5)
    # directions preserved
    in_unit = np.asarray(B.bone_unit_vectors_tree(jnp.asarray(pose - pose[:, :1])))
    out_unit = np.asarray(out_vecs / B.bone_lengths(out_vecs)[..., None])
    np.testing.assert_allclose(out_unit, in_unit, atol=1e-4)
    # root kept
    np.testing.assert_allclose(np.asarray(out)[:, 0], pose[:, 0], atol=1e-6)


def test_blaugment9to15_mirror_groups():
    rng = np.random.default_rng(4)
    pose = _random_pose(rng, (2,))
    bl = np.asarray(B.bone_lengths(B.bone_vectors_tree(jnp.asarray(pose - pose[:, :1]))))
    blr = np.zeros((2, 9), np.float32)
    blr[:, 0] = 0.5  # first group scales tree bones 0 and 3 (both upper legs)
    out = B.blaugment9to15(jnp.asarray(pose), jnp.asarray(bl), jnp.asarray(blr))
    out_len = np.asarray(B.bone_lengths(B.bone_vectors_tree(out - out[:, :1])))
    np.testing.assert_allclose(out_len[:, 0], bl[:, 0] * 1.5, atol=1e-5)
    np.testing.assert_allclose(out_len[:, 3], bl[:, 3] * 1.5, atol=1e-5)
    np.testing.assert_allclose(out_len[:, 1], bl[:, 1], atol=1e-5)


def test_bone_lengths_fk_on_fk_output():
    # consistency anchor: already covered in test_fk, quick smoke here
    pose = fk.fk_world_pose(fk.FKInputs(
        jnp.zeros((33,)), jnp.asarray(fk.CANONICAL_BONE_LEN),
        jnp.zeros((3,)), jnp.zeros((3,))), 16)
    lens = np.asarray(B.bone_lengths_fk(pose))
    np.testing.assert_allclose(lens, fk.CANONICAL_BONE_LEN, atol=1e-5)


def test_kcs_features_shapes_and_range():
    rng = np.random.default_rng(5)
    pose = _random_pose(rng, (8,))
    feats30 = np.asarray(B.kcs_features(jnp.asarray(pose), with_lengths=True))
    feats15 = np.asarray(B.kcs_features(jnp.asarray(pose), with_lengths=False))
    assert feats30.shape == (8, 30)
    assert feats15.shape == (8, 15)
    # first 15 entries are cosines
    assert np.all(feats30[:, :15] <= 1.0 + 1e-5)
    assert np.all(feats30[:, :15] >= -1.0 - 1e-5)
    np.testing.assert_allclose(feats30[:, :15], feats15, atol=1e-6)
    # last 15 are the FK bone lengths
    np.testing.assert_allclose(
        feats30[:, 15:], np.asarray(B.bone_lengths_fk(jnp.asarray(pose))), atol=1e-6)


def test_kcs_known_cosine():
    # straight leg: small-leg and big-leg vectors parallel -> cosine 1
    pose = np.zeros((1, 16, 3), np.float32)
    pose[0, 4] = [0.2, 0, 0]       # LHip
    pose[0, 5] = [0.2, 0, -0.5]    # LKnee
    pose[0, 6] = [0.2, 0, -1.0]    # LAnkle
    # give every other joint distinct positions to avoid zero-length bones
    rng = np.random.default_rng(6)
    for j in [1, 2, 3, 7, 8, 9, 10, 11, 12, 13, 14, 15]:
        pose[0, j] = rng.normal(size=3)
    feats = np.asarray(B.kcs_features(jnp.asarray(pose), with_lengths=False))
    np.testing.assert_allclose(feats[0, 0], 1.0, atol=1e-5)
