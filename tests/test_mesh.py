"""Fast-tier mesh/sharding tests (the heavier DP-equivalence runs live in
test_parallel.py under the slow marker; these keep the 3-minute signal run
exercising the sharding layer)."""

import jax
import jax.numpy as jnp
import numpy as np

from egotap_tpu.core.config import Config
from egotap_tpu.parallel.mesh import (
    choose_num_data, data_parallel_setup, make_mesh, replicate, shard_batch)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_choose_num_data_divisor_reduction():
    assert choose_num_data(batch_size=8, requested=0) == 8
    assert choose_num_data(batch_size=8, requested=4) == 4
    # 12 % 8 != 0 -> largest divisor of 12 that is <= 8
    assert choose_num_data(batch_size=12, requested=8) == 6
    # requested beyond available devices clamps first
    assert choose_num_data(batch_size=64, requested=512) == 8
    assert choose_num_data(batch_size=7, requested=8) == 7
    assert choose_num_data(batch_size=5, requested=4) == 1


def test_shard_replicate_round_trip():
    mesh = make_mesh()
    batch = {"x": jnp.arange(16.0).reshape(8, 2)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sharded["x"]),
                                  np.asarray(batch["x"]))
    tree = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert tree["w"].sharding.is_fully_replicated


def test_data_parallel_setup_shapes():
    cfg = Config(batch_size=8, data_parallel=0)
    state = {"w": jnp.ones((4,))}
    mesh, state_r, shard = data_parallel_setup(cfg, state)
    assert mesh is not None and mesh.shape["data"] == 8
    assert state_r["w"].sharding.is_fully_replicated
    out = shard({"x": jnp.zeros((8, 3))})
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")

    # single-device request -> no mesh, identity shard
    cfg1 = Config(batch_size=8, data_parallel=1)
    mesh1, state1, shard1 = data_parallel_setup(cfg1, state)
    assert mesh1 is None
    assert shard1 is not None and state1 is state


def test_sharded_jit_matmul_matches():
    """A sharded jit computation agrees with the single-device result."""
    mesh = make_mesh()
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    w = jnp.ones((4, 2), jnp.float32)

    f = jax.jit(lambda x, w: jnp.mean(x @ w))
    ref = f(x, w)
    out = f(shard_batch({"x": x}, mesh)["x"], replicate(w, mesh))
    np.testing.assert_allclose(float(ref), float(out), rtol=1e-6)
