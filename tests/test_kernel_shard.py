"""Pallas-SPMD bridge (parallel/kernel_shard.py): the shard_map wrapping
must execute correctly on a mesh — not just compile. These run the REAL
wrapped kernels (interpret mode on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import NamedSharding, PartitionSpec as P

from street_crafter_tpu.parallel import (kernel_sharding, make_mesh,
                                         wrap_kernel)


def _scale_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def _impl(x):
    return pl.pallas_call(
        _scale_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(1,),
        in_specs=[pl.BlockSpec(x.shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec(x.shape, lambda i: (0, 0)),
        interpret=True)(x)


def test_wrap_kernel_identity_without_context():
    x = jnp.arange(32.0).reshape(4, 8)
    assert wrap_kernel(_impl, (2,), 2) is _impl
    np.testing.assert_allclose(np.asarray(_impl(x)), np.asarray(x) * 2)


def test_wrapped_kernel_executes_on_mesh():
    """vmap(spmd_axis_name) over shard_map(pallas) on a sharded batch:
    output matches the unwrapped computation and stays batch-sharded."""
    mesh = make_mesh({"data": 8})
    x = np.arange(8 * 4 * 16, dtype=np.float32).reshape(8, 4, 16)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    @jax.jit
    def f(xb):
        with kernel_sharding(mesh, ()):
            return jax.vmap(lambda e: wrap_kernel(_impl, (2,), 2)(e),
                            spmd_axis_name="data")(xb)

    out = f(xs)
    np.testing.assert_allclose(np.asarray(out), x * 2)
    assert out.sharding.spec == P("data")


def test_wrapped_kernel_leading_axis_sharding():
    """Direct leading-dim sharding via the context axes (the sample-path
    composition, no vmap)."""
    mesh = make_mesh({"data": 8})
    x = np.arange(16 * 32, dtype=np.float32).reshape(16, 32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    @jax.jit
    def f(xb):
        with kernel_sharding(mesh, ("data",)):
            return wrap_kernel(_impl, (2,), 2)(xb)

    np.testing.assert_allclose(np.asarray(f(xs)), x * 2)


def test_fused_raster_executes_under_mesh():
    """The actual fused eval raster, wrapped, executed under a camera-
    sharded vmap on the mesh — matches the single-device render."""
    from street_crafter_tpu.models.gs.params import init_pool_from_points
    from street_crafter_tpu.models.gs.renderer import render_flat
    from street_crafter_tpu.models.gs.scene import FlatGaussians
    from street_crafter_tpu.datasets import Camera

    rng = np.random.default_rng(3)
    n = 512
    pts = np.stack([rng.normal(0, 2, n), rng.normal(0, 1, n),
                    rng.uniform(3, 12, n)], -1).astype(np.float32)
    pool = init_pool_from_points(pts, rng.uniform(size=(n, 3)).astype(
        np.float32), capacity=n, fixed_scale=0.05, init_opacity=0.7)
    flat = FlatGaussians(xyz=pool.xyz, rotation=pool.get_rotation(),
                         scaling=pool.get_scaling(),
                         opacity=pool.get_opacity()[:, 0],
                         shs=pool.get_features(), valid=pool.valid)
    H, W = 64, 128
    K = np.array([[100.0, 0, 64], [0, 100.0, 32], [0, 0, 1]], np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    w2cs = np.stack([np.asarray(cam.w2c) + 0.0] * 8)
    w2cs[:, 0, 3] = np.linspace(-0.2, 0.2, 8)

    def render_one(w2c):
        return render_flat(flat, w2c, jnp.asarray(K), cam.camera_center,
                           W, H, sh_degree=1, method="fused")["rgb"]

    singles = np.stack([np.asarray(render_one(jnp.asarray(w)))
                        for w in w2cs])

    mesh = make_mesh({"data": 8})
    ws = jax.device_put(jnp.asarray(w2cs), NamedSharding(mesh, P("data")))

    @jax.jit
    def batched(wb):
        with kernel_sharding(mesh, ()):
            return jax.vmap(render_one, spmd_axis_name="data")(wb)

    np.testing.assert_allclose(np.asarray(batched(ws)), singles,
                               atol=1e-5, rtol=1e-5)


def test_raster_guard_rejects_context_axes():
    """The raster kernels' leading dim is the coarse-tile axis, not a batch
    axis — tracing them inside a non-empty-axes context must fail loudly
    (ADVICE r3) instead of silently sharding Tc over the mesh."""
    from street_crafter_tpu.parallel.kernel_shard import \
        assert_no_context_axes

    mesh = make_mesh({"data": 8})
    with kernel_sharding(mesh, ()):
        assert_no_context_axes("ok-case")  # empty axes: fine
    with kernel_sharding(mesh, ("data",)):
        with pytest.raises(ValueError, match="not a batch axis"):
            assert_no_context_axes("gs_raster_fused")
