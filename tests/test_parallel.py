"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dhaug_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                     shard_batch, shard_params_tp)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

KEY = jax.random.PRNGKey(0)


def test_mesh_shapes():
    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_shard_batch_layout():
    mesh = make_mesh(8)
    x = jnp.arange(16 * 3, dtype=jnp.float32).reshape(16, 3)
    xs = shard_batch(mesh, x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), x.ndim)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_sharded_matmul_equals_single_device():
    mesh = make_mesh(8, model_axis=2)
    w = jax.random.normal(KEY, (64, 512))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 64))

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=-1)

    ref = f(x, w)
    with mesh:
        ws = shard_params_tp(mesh, {"k": w}, min_width=512)["k"]
        xs = shard_batch(mesh, x)
        out = f(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_gan_step_matches_unsharded():
    """The full train step must produce identical metrics whether the batch
    is sharded over 8 devices or run on one (same params, same keys)."""
    from dhaug_tpu.gan.wgan import GanHyper, camera_bank
    from dhaug_tpu.models.discriminators import (Fk2DDiscriminator,
                                                 Fk3DDiscriminator)
    from dhaug_tpu.models.generator import FkGeneratorNet, GeneratorConfig
    from dhaug_tpu.gan.wgan import make_single_frame_steps
    from dhaug_tpu.train.state import adam_gan, make_state

    gen_cfg = GeneratorConfig(dense_dim=32)
    gen = FkGeneratorNet(gen_cfg)
    d3d = Fk3DDiscriminator(dense_dim=32)
    d2d = Fk2DDiscriminator(dense_dim=32)
    gp = gen.init(KEY, jnp.zeros((2, 128)))["params"]
    p3 = d3d.init(KEY, jnp.zeros((2, 16, 3)))["params"]
    p2 = d2d.init(KEY, jnp.zeros((2, 16, 2)))["params"]
    quats, trans, intrs = camera_bank(["S1"])
    txs = [adam_gan() for _ in range(3)]
    steps = make_single_frame_steps(
        lambda p, x: gen.apply({"params": p}, x),
        lambda p, x: d3d.apply({"params": p}, x),
        lambda p, x: d2d.apply({"params": p}, x),
        txs[0], txs[1], txs[2], gen_cfg, GanHyper(flip=False),
        quats, trans, intrs)

    B = 16
    real = jax.random.normal(KEY, (B, 16, 3)) * 0.3
    cam16 = jnp.concatenate([
        jnp.broadcast_to(intrs[0], (B, 9)),
        jnp.broadcast_to(quats[0], (B, 4)),
        jnp.broadcast_to(trans[0], (B, 3))], axis=1)
    tgt2d = jax.random.normal(KEY, (B, 16, 2)) * 0.3

    def run(shard):
        d3s = make_state(txs[0], p3)
        d2s = make_state(txs[1], p2)
        r, c, t = real, cam16, tgt2d
        if shard:
            mesh = make_mesh(8)
            with mesh:
                r, c, t = shard_batch(mesh, real, cam16, tgt2d)
                out = steps.critics_step(d3s, d2s, gp, r, c, t, KEY)
                return {k: float(v) for k, v in out[-1].items()}
        out = steps.critics_step(d3s, d2s, gp, r, c, t, KEY)
        return {k: float(v) for k, v in out[-1].items()}

    m_single = run(False)
    m_sharded = run(True)
    for k in m_single:
        np.testing.assert_allclose(m_sharded[k], m_single[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
