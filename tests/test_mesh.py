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
