"""Synthetic end-to-end 3DGS optimization (SURVEY §4c): fit a tiny Gaussian
scene to target renders and verify convergence + densify/reset steps run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.config import default_config
from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.params import init_pool_from_points
from street_crafter_tpu.models.gs.renderer import render_scene
from street_crafter_tpu.models.gs.scene import SceneParams
from street_crafter_tpu.ops.ssim import psnr
from street_crafter_tpu.training.gs_trainer import (
    init_train_state, make_train_step, make_densify_step, reset_opacity_step,
)


def make_params(rng, jitter=0.0, cap=32):
    pts = np.array([
        [-1.0, 0.0, 5.0], [1.0, 0.0, 5.0], [0.0, 1.0, 6.0], [0.0, -1.0, 6.0],
        [0.5, 0.5, 4.0], [-0.5, -0.5, 4.5],
    ], np.float32)
    cols = np.array([
        [0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9],
        [0.9, 0.9, 0.1], [0.1, 0.9, 0.9], [0.9, 0.1, 0.9]], np.float32)
    if jitter:
        pts = pts + rng.normal(size=pts.shape).astype(np.float32) * jitter
        cols = np.clip(cols + rng.normal(size=cols.shape) * 0.25, 0.05, 0.95).astype(np.float32)
    pool = init_pool_from_points(pts, cols, capacity=cap, fixed_scale=0.35,
                                 init_opacity=0.8)
    return SceneParams(
        bkgd=pool, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None)


def make_cameras():
    K = np.array([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]], np.float32)
    cams = []
    for dx in (-0.6, 0.0, 0.6):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = dx
        cams.append(Camera.from_c2w(c2w, K, 48, 32))
    return cams


@pytest.fixture(scope="module")
def cfg():
    c = default_config()
    c.optim.position_lr_init = 0.002
    c.optim.position_lr_final = 0.0002
    c.optim.feature_lr = 0.02
    c.optim.opacity_lr = 0.05
    c.optim.scaling_lr = 0.01
    c.render.max_intersects_per_tile = 32
    c.render.tile_size = 16
    return c


def render_gt(params, cam):
    return render_scene(params, None, cam, include_obj=False,
                        max_per_tile=32, clamp=True)["rgb"]


def test_training_converges(rng, cfg):
    true_params = make_params(rng)
    cams = make_cameras()
    targets = [np.asarray(render_gt(true_params, c)) for c in cams]

    params = make_params(rng, jitter=0.25)
    state = init_train_state(params)
    step_fn = make_train_step(cfg, None, spatial_lr_scale=1.0)

    def batch_for(i):
        return {"gt_image": jnp.asarray(targets[i]),
                "frame_idx": jnp.int32(0), "frame": jnp.float32(0),
                "cam_id": jnp.int32(0)}

    key = jax.random.PRNGKey(0)
    psnr0 = min(float(psnr(render_gt(params, cams[i]), jnp.asarray(targets[i])))
                for i in range(3))
    for it in range(150):
        i = it % 3
        key, sub = jax.random.split(key)
        state, scalars = step_fn(state, cams[i], batch_for(i), sub)
    psnr1 = min(float(psnr(
        render_scene(state.params, None, cams[i], include_obj=False,
                     max_per_tile=32, clamp=True)["rgb"],
        jnp.asarray(targets[i]))) for i in range(3))
    assert np.isfinite(float(scalars["loss"]))
    assert psnr1 > psnr0 + 4.0, f"PSNR did not improve: {psnr0} -> {psnr1}"
    assert psnr1 > 22.0


def test_densify_and_reset_cycle(rng, cfg):
    params = make_params(rng, jitter=0.3)
    cams = make_cameras()
    true_params = make_params(rng)
    target = np.asarray(render_gt(true_params, cams[0]))
    state = init_train_state(params)
    step_fn = make_train_step(cfg, None, spatial_lr_scale=1.0)
    densify_fn = make_densify_step(cfg)
    batch = {"gt_image": jnp.asarray(target), "frame_idx": jnp.int32(0),
             "frame": jnp.float32(0), "cam_id": jnp.int32(0)}
    key = jax.random.PRNGKey(1)
    for it in range(20):
        key, sub = jax.random.split(key)
        state, _ = step_fn(state, cams[0], batch, sub)
    n_before = int(state.params.bkgd.num_valid())
    cfg2 = cfg.clone()
    cfg2.optim.densify_grad_threshold = 1e-8  # force densification
    state2, info = make_densify_step(cfg2)(state, key, 10.0)
    n_after = int(state2.params.bkgd.num_valid())
    assert n_after > n_before
    # densify stats were reset
    assert float(state2.dstate_bkgd.grad_accum.sum()) == 0.0
    # opacity reset clamps down
    state3 = reset_opacity_step(state2)
    assert float(state3.params.bkgd.get_opacity().max()) <= 0.0101
    # training continues after both
    state4, scalars = step_fn(state3, cams[0], batch, key)
    assert np.isfinite(float(scalars["loss"]))


def test_training_converges_fused_train(rng, cfg):
    """Same convergence check through the Pallas fused_train raster path
    (interpret mode on CPU) — validates the analytic backward inside the
    full train step (render + loss + per-group Adam + densify stats)."""
    cfg2 = cfg.clone()
    cfg2.render.train_method = "fused_train"
    cfg2.render.max_intersects_per_tile = 64
    true_params = make_params(rng)
    cams = make_cameras()
    targets = [np.asarray(render_gt(true_params, c)) for c in cams]

    params = make_params(rng, jitter=0.25)
    state = init_train_state(params)
    step_fn = make_train_step(cfg2, None, spatial_lr_scale=1.0)

    def batch_for(i):
        return {"gt_image": jnp.asarray(targets[i]),
                "frame_idx": jnp.int32(0), "frame": jnp.float32(0),
                "cam_id": jnp.int32(0)}

    key = jax.random.PRNGKey(0)
    psnr0 = min(float(psnr(render_gt(params, cams[i]), jnp.asarray(targets[i])))
                for i in range(3))
    for it in range(60):
        i = it % 3
        key, sub = jax.random.split(key)
        state, scalars = step_fn(state, cams[i], batch_for(i), sub)
    psnr1 = min(float(psnr(
        render_scene(state.params, None, cams[i], include_obj=False,
                     max_per_tile=64, clamp=True)["rgb"],
        jnp.asarray(targets[i]))) for i in range(3))
    assert np.isfinite(float(scalars["loss"]))
    assert psnr1 > psnr0 + 3.0, f"PSNR did not improve: {psnr0} -> {psnr1}"
    # densify stats accumulated through the Pallas backward
    assert float(state.dstate_bkgd.grad_accum.max()) > 0
    assert float(state.dstate_bkgd.grad_abs_accum.max()) > 0
