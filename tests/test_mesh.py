"""Mesh/sharding utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pafuse_tpu.parallel import mesh as pm


def test_make_mesh_all_devices():
    m = pm.make_mesh((-1,), ("data",))
    assert m.devices.size == len(jax.devices())
    assert m.axis_names == ("data",)


def test_make_mesh_fixed_shape():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = pm.make_mesh((4,), ("data",))
    assert m.devices.shape == (4,)
    m2 = pm.make_mesh((2, -1), ("data", "model"))
    assert m2.devices.shape == (2, 4)


def test_shard_batch_places_data():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = pm.make_mesh((8,), ("data",))
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = pm.shard_batch(batch, m)
    assert sharded["x"].sharding == pm.data_sharding(m)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_replicated_spec():
    m = pm.make_mesh((-1,), ("data",))
    x = jax.device_put(jnp.ones(4), pm.replicated(m))
    assert x.sharding.is_fully_replicated


def test_sharded_eval_step_matches_single_device():
    """Multi-chip eval (window batch sharded over the data mesh) must
    produce the same metrics as the single-device path."""
    import jax
    import jax.numpy as jnp
    from pafuse_tpu import evaluate as ev, geometry
    from pafuse_tpu.diffusion import D3DP, D3DPConfig

    model = D3DP(D3DPConfig(frames=9, timesteps=20, depth=1))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = 8
    x2d = jnp.asarray(rng.randn(B, 9, 134, 2), np.float32)
    x3d = jnp.asarray(rng.randn(B, 9, 134, 3), np.float32) * 0.1
    traj = x3d[:, :, :1]
    gt_parts = geometry.center_pose_parts(x3d)
    cam = jnp.tile(jnp.asarray(rng.rand(9), jnp.float32), (B, 1))
    mask = jnp.ones((B,), jnp.float32)

    # fixed noise so both paths sample identically
    key = jax.random.PRNGKey(1)
    single = ev.get_eval_step(model, 2, 2)
    mesh = pm.make_mesh((8,), ("data",))
    sharded = ev.get_eval_step(model, 2, 2, mesh=mesh)
    assert single is not sharded

    m1 = single(params, key, x2d, x2d, gt_parts, traj, cam, mask)
    m2 = sharded(params, key, x2d, x2d, gt_parts, traj, cam, mask)
    for k in m1:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   atol=1e-5, rtol=1e-5)


def test_hybrid_mesh_single_host_fallback():
    m = pm.make_hybrid_mesh(-1, ("data",))
    import jax
    assert int(np.prod(m.devices.shape)) == len(jax.devices())
    assert m.axis_names == ("data",)
