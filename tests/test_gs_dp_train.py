"""Camera-DP 3DGS training step (make_train_step(batch_size=B)): exact
equivalence with the single-camera step on a duplicated batch, doubled
densification stats, convergence with distinct cameras, and execution over
the 8-device CPU mesh. The reference's 3DGS loop is strictly single-GPU
(SURVEY §2.3); this is the TPU build's scaling extension."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.ops.ssim import psnr
from street_crafter_tpu.models.gs.renderer import render_scene
from street_crafter_tpu.parallel import make_mesh
from street_crafter_tpu.training.gs_trainer import (init_train_state,
                                                    make_train_step)
from tests.test_gs_train_e2e import (cfg, make_cameras, make_params,
                                     render_gt)


def _stack_cams(cams):
    base = cams[0]
    return dataclasses.replace(
        base,
        R=jnp.stack([c.R for c in cams]),
        T=jnp.stack([c.T for c in cams]),
        K=jnp.stack([c.K for c in cams]))


def _stack_batches(batches):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def _batch(target):
    return {"gt_image": jnp.asarray(target), "frame_idx": jnp.int32(0),
            "frame": jnp.float32(0), "cam_id": jnp.int32(0)}


def test_dp_matches_single_on_duplicated_camera(rng, cfg):
    true_params = make_params(rng)
    cams = make_cameras()
    target = np.asarray(render_gt(true_params, cams[0]))
    params = make_params(rng, jitter=0.25)

    state0 = init_train_state(params)
    single = make_train_step(cfg, None, spatial_lr_scale=1.0)
    dp = make_train_step(cfg, None, spatial_lr_scale=1.0, batch_size=2)

    key = jax.random.PRNGKey(3)
    s_single, sc_s = single(state0, cams[0], _batch(target), key)
    s_dp, sc_d = dp(state0, _stack_cams([cams[0], cams[0]]),
                    _stack_batches([_batch(target), _batch(target)]), key)

    # mean of two identical gradients == the single gradient -> identical
    # parameter update
    np.testing.assert_allclose(np.asarray(s_dp.params.bkgd.xyz),
                               np.asarray(s_single.params.bkgd.xyz),
                               atol=1e-6)
    assert float(sc_d["loss"]) == pytest.approx(float(sc_s["loss"]),
                                                rel=1e-5)
    # densify stats accumulate BOTH members (2 reference iterations' worth)
    np.testing.assert_allclose(np.asarray(s_dp.dstate_bkgd.denom),
                               2 * np.asarray(s_single.dstate_bkgd.denom),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_dp.dstate_bkgd.grad_accum),
        2 * np.asarray(s_single.dstate_bkgd.grad_accum), rtol=1e-5,
        atol=1e-8)
    # max radius is a max, not a sum
    np.testing.assert_allclose(np.asarray(s_dp.dstate_bkgd.max_radii2d),
                               np.asarray(s_single.dstate_bkgd.max_radii2d),
                               atol=1e-6)


def test_dp_converges_on_mesh(rng, cfg):
    """B=4 distinct-camera DP over a {data: 4} mesh: loss decreases and all
    views improve (collectives inserted by XLA from the shardings)."""
    true_params = make_params(rng)
    cams = make_cameras()
    # 4 views: the 3 standard cameras + a shifted duplicate
    cam4 = dataclasses.replace(cams[0], T=cams[0].T + 0.2)
    all_cams = cams + [cam4]
    targets = [np.asarray(render_gt(true_params, c)) for c in all_cams]

    params = make_params(rng, jitter=0.25)
    state = init_train_state(params)
    # 8 CPU devices: 4-way data sharding, unused frames axis absorbs the rest
    mesh = make_mesh({"data": 4, "frames": 2})
    dp = make_train_step(cfg, None, spatial_lr_scale=1.0, batch_size=4,
                         mesh=mesh)
    stacked_cams = _stack_cams(all_cams)
    stacked_batch = _stack_batches([_batch(t) for t in targets])

    psnr0 = min(float(psnr(render_gt(params, all_cams[i]),
                           jnp.asarray(targets[i]))) for i in range(4))
    key = jax.random.PRNGKey(0)
    first_loss = None
    for _ in range(60):
        key, sub = jax.random.split(key)
        state, scalars = dp(state, stacked_cams, stacked_batch, sub)
        if first_loss is None:
            first_loss = float(scalars["loss"])
    assert float(scalars["loss"]) < first_loss
    psnr1 = min(float(psnr(
        render_scene(state.params, None, all_cams[i], include_obj=False,
                     max_per_tile=32, clamp=True)["rgb"],
        jnp.asarray(targets[i]))) for i in range(4))
    assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)
