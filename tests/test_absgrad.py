"""absgrad densification statistics (gsplat absgrad=True analog).

The reference rasterizes with gsplat absgrad by default
(street_gaussian_renderer.py:183,279) and densifies on the per-pixel
|dL/d means2d| sum; the signed pixel-summed gradient cancels on
sign-symmetric error patterns and under-densifies. Here the abs channel is
the cotangent of a dummy ``absgrad_sink`` input (ops/gs_raster.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.gs.densify import (
    DensifyState, densify_and_prune,
)
from street_crafter_tpu.models.gs.optim import init_adam
from street_crafter_tpu.models.gs.params import init_pool_from_points
from street_crafter_tpu.ops.gs_raster import rasterize_pixels


def _raster_grads(loss_of_colors, m2, con, col, opa, dep, rad, H, W):
    n = m2.shape[0]

    def loss(vz, sink):
        u = jnp.asarray(m2[:, 0]) + vz[:, 0]
        v = jnp.asarray(m2[:, 1]) + vz[:, 1]
        out = rasterize_pixels(
            u, v, jnp.asarray(con[:, 0]), jnp.asarray(con[:, 1]),
            jnp.asarray(con[:, 2]), jnp.asarray(col), jnp.asarray(opa),
            jnp.asarray(dep), jnp.ones(n, bool), jnp.asarray(rad),
            absgrad_sink=sink, width=W, height=H, tile_size=8,
            max_per_tile=max(n, 1))
        return loss_of_colors(out.colors)

    z = jnp.zeros((n, 2), jnp.float32)
    return jax.grad(loss, argnums=(0, 1))(z, z)


def test_signed_cancels_abs_does_not():
    """A centered symmetric gaussian under a symmetric loss: the signed
    screen gradient cancels to ~0 while the absgrad stays finite."""
    H = W = 16
    m2 = np.array([[8.0, 8.0]], np.float32)
    con = np.array([[0.5, 0.0, 0.5]], np.float32)
    col = np.array([[1.0, 0.0, 0.0]], np.float32)
    opa = np.array([0.9], np.float32)
    dep = np.array([2.0], np.float32)
    rad = np.array([6.0], np.float32)
    signed, absg = _raster_grads(jnp.sum, m2, con, col, opa, dep, rad, H, W)
    assert abs(float(signed[0, 0])) < 1e-5
    assert abs(float(signed[0, 1])) < 1e-5
    assert float(absg[0, 0]) > 1e-2
    assert float(absg[0, 1]) > 1e-2


def test_abs_equals_signed_for_one_sided_loss():
    """When all per-pixel gradients share a sign (loss over the left half
    only), |sum| == sum of |.| and the two channels agree."""
    H = W = 16
    m2 = np.array([[8.0, 8.0]], np.float32)
    con = np.array([[0.5, 0.0, 0.5]], np.float32)
    col = np.array([[1.0, 0.0, 0.0]], np.float32)
    opa = np.array([0.9], np.float32)
    dep = np.array([2.0], np.float32)
    rad = np.array([6.0], np.float32)
    signed, absg = _raster_grads(
        lambda c: jnp.sum(c[:, :8]), m2, con, col, opa, dep, rad, H, W)
    np.testing.assert_allclose(abs(float(signed[0, 0])), float(absg[0, 0]),
                               rtol=1e-4)


def test_densify_use_abs_selects_column():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(8, 3)).astype(np.float32)
    pool = init_pool_from_points(pts, np.full((8, 3), 0.5, np.float32),
                                 capacity=32)
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, -5.0))
    adam = init_adam(pool.trainable_dict())
    cap = pool.capacity
    # signed below threshold, abs above: only use_abs=True densifies
    state = DensifyState(
        grad_accum=jnp.zeros(cap),
        grad_abs_accum=jnp.where(jnp.arange(cap) < 4, 10.0, 0.0),
        denom=jnp.ones(cap), max_radii2d=jnp.zeros(cap))
    _, _, _, info_abs = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0), grad_threshold=1.0,
        percent_dense=0.01, extent=10.0, use_abs=True)
    _, _, _, info_signed = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0), grad_threshold=1.0,
        percent_dense=0.01, extent=10.0, use_abs=False)
    assert int(info_abs.n_cloned) == 4
    assert int(info_signed.n_cloned) == 0


def test_train_step_accumulates_both_channels(tmp_path):
    """End-to-end: one train step fills both accumulator columns, and the
    abs column dominates the signed one (per-pixel cancellation)."""
    from street_crafter_tpu.config import default_config
    from street_crafter_tpu.runner import create_scene
    from street_crafter_tpu.training.gs_trainer import (
        init_train_state, make_train_step,
    )
    from tests.synthetic_scene import make_scene

    scene_dir = make_scene(str(tmp_path), num_frames=2)
    c = default_config()
    c.source_path = scene_dir
    c.model_path = str(tmp_path / "model")
    c.data.cameras = [0]
    c.optim.capacity_bkgd = 2048
    c.optim.capacity_obj = 256
    c.optim.capacity_sky = 512
    c.optim.allow_missing_lpips = True
    c.render.max_intersects_per_tile = 64
    c.model.gaussian.sh_degree = 1
    scene = create_scene(c)
    state = init_train_state(scene.params)
    step = make_train_step(c, scene.meta, spatial_lr_scale=scene.extent,
                           active_sh_degree=1)
    info = scene.info.train_cameras[0]
    cam = scene.train_cameras[0]
    batch = scene.batch_for(info)
    state, _ = step(state, cam, batch, jax.random.PRNGKey(0))

    ds = state.dstate_bkgd
    signed = np.asarray(ds.grad_accum)
    absg = np.asarray(ds.grad_abs_accum)
    assert absg.sum() > 0
    assert signed.sum() > 0
    # abs-sum upper-bounds |sum| per gaussian (up to norm-of-components slack)
    vis = np.asarray(ds.denom) > 0
    assert (absg[vis] >= signed[vis] * (1 - 1e-4) - 1e-8).all()
    assert absg[vis].sum() > signed[vis].sum() * 1.01
