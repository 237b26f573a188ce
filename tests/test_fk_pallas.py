"""Parity tests for the fused Pallas FK kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from dhaug_tpu.ops.fk import CANONICAL_BONE_LEN, FKInputs, fk_world_pose
from dhaug_tpu.ops.fk_pallas import fk_world_pose_pallas


def _inputs(rng, B):
    return (jnp.asarray(rng.uniform(-120, 120, (B, 33)), jnp.float32),
            jnp.asarray(rng.uniform(0.1, 0.7, (B, 15)), jnp.float32),
            jnp.asarray(rng.uniform(-180, 180, (B, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))


def test_matches_xla_path():
    rng = np.random.default_rng(0)
    angles, bl, grot, root = _inputs(rng, 96)
    ref = fk_world_pose(FKInputs(angles, bl, grot, root), 16)
    out = fk_world_pose_pallas(angles, bl, grot, root, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_non_tile_multiple_batch():
    rng = np.random.default_rng(1)
    angles, bl, grot, root = _inputs(rng, 513)  # forces padding
    ref = fk_world_pose(FKInputs(angles, bl, grot, root), 16)
    out = fk_world_pose_pallas(angles, bl, grot, root, interpret=True)
    assert out.shape == (513, 16, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_kernel_matches_single_device():
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from dhaug_tpu.ops.fk_pallas import fk_world_pose_pallas_sharded
    from dhaug_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.default_rng(2)
    angles, bl, grot, root = _inputs(rng, 8 * 512)
    ref = fk_world_pose(FKInputs(angles, bl, grot, root), 16)
    mesh = make_mesh(8)
    with mesh:
        a, b, g, r = shard_batch(mesh, angles, bl, grot, root)
        out = fk_world_pose_pallas_sharded(mesh, a, b, g, r, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_canonical_pose():
    B = 4
    angles = jnp.zeros((B, 33))
    bl = jnp.broadcast_to(jnp.asarray(CANONICAL_BONE_LEN), (B, 15))
    out = fk_world_pose_pallas(angles, bl, jnp.zeros((B, 3)),
                               jnp.zeros((B, 3)), interpret=True)
    ref = fk_world_pose(FKInputs(angles, bl, jnp.zeros((B, 3)),
                                 jnp.zeros((B, 3))), 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestTrunkPallas:
    """Fused generator-trunk kernel (models/trunk_pallas.py, inference
    paths): interpret mode must match the bf16-multiply oracle bitwise and
    track the fp32 XLA trunk to bf16 rounding."""

    def _setup(self, dense=64, B=100):
        from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
        cfg = GeneratorConfig(dense_dim=dense)
        net = FkGeneratorNet(cfg)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 128)))["params"]
        noise = jax.random.normal(jax.random.PRNGKey(1), (B, 128))
        return net, params, noise

    def test_matches_bf16_oracle_bitwise(self):
        from dhaug_tpu.models.trunk_pallas import (trunk_forward_pallas,
                                                   trunk_reference_bf16)
        net, params, noise = self._setup()
        out = trunk_forward_pallas(params, noise, interpret=True)
        ref = trunk_reference_bf16(params, noise)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_tracks_fp32_trunk(self):
        from dhaug_tpu.models.trunk_pallas import trunk_forward_pallas
        net, params, noise = self._setup(dense=128, B=300)
        out = trunk_forward_pallas(params, noise, interpret=True)
        ref = net.apply({"params": params}, noise)
        # bf16 multiplies (XLA's own default on TPU) vs the CPU fp32
        # reference: deviation bounded by bf16 rounding through the chain
        scale = float(jnp.std(ref))
        assert float(jnp.max(jnp.abs(out - ref))) < 0.05 * scale

    def test_batch_padding(self):
        from dhaug_tpu.models.trunk_pallas import (trunk_forward_pallas,
                                                   trunk_reference_bf16)
        net, params, noise = self._setup(B=7)   # far below the tile size
        out = trunk_forward_pallas(params, noise, interpret=True)
        assert out.shape == (7, 35)
        ref = trunk_reference_bf16(params, noise)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
