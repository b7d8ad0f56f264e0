import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from street_crafter_tpu.parallel import (
    MeshSpec, make_mesh, make_virtual_cpu_mesh, ShardingRules, shard_batch,
)


def test_meshspec_resolve():
    assert MeshSpec({"data": -1, "frames": 1}).resolve(8) == {"data": 8, "frames": 1}
    assert MeshSpec({"data": 2, "frames": 4}).resolve(8) == {"data": 2, "frames": 4}
    with pytest.raises(ValueError):
        MeshSpec({"data": 3}).resolve(8)
    with pytest.raises(ValueError):
        MeshSpec({"data": -1, "frames": -1}).resolve(8)


def test_make_mesh_8cpu():
    mesh = make_virtual_cpu_mesh(8, {"data": 2, "frames": 4})
    assert mesh.shape == {"data": 2, "frames": 4}


def test_psum_over_mesh():
    mesh = make_virtual_cpu_mesh(8, {"data": 8})
    x = jnp.arange(8.0)

    def f(x):
        return jax.lax.psum(x, "data")

    out = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.full(8, 28.0))


def test_sharded_batch_matmul():
    mesh = make_virtual_cpu_mesh(8, {"data": 8})
    x = jnp.ones((16, 32))
    w = jnp.ones((32, 8))
    xs = jax.device_put(x, shard_batch(mesh))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(xs, w)
    assert out.shape == (16, 8)
    np.testing.assert_allclose(np.asarray(out), 32.0)


def test_sharding_rules_opt_state():
    mesh = make_virtual_cpu_mesh(8, {"data": 8})
    rules = ShardingRules(mesh)
    leaf = jax.ShapeDtypeStruct((64, 3), jnp.float32)
    sh = rules.opt_state_spec(leaf)
    assert sh.spec == P("data", None)
    # non-divisible leaf is replicated
    leaf = jax.ShapeDtypeStruct((7, 3), jnp.float32)
    assert rules.opt_state_spec(leaf).spec == P()
