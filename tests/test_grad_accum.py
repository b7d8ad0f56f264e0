"""Gradient accumulation equals the single-batch step on the same data."""

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                  VideoDiffusionEngine)
from street_crafter_tpu.training.vdm_trainer import (init_vdm_train_state,
                                                     make_vdm_train_step)


def test_accum_matches_full_batch():
    T, H, W = 2, 16, 16
    eng = VideoDiffusionEngine(EngineConfig.tiny(num_frames=T))
    params = eng.init_params(jax.random.PRNGKey(0), H, W)
    state = init_vdm_train_state(eng, params, lr=1e-4)

    B = 4
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (B * T, H, W, 3)) * 2 - 1
    latents = eng.encode_images(params, imgs)
    cond, _ = eng.build_conditioning(params,
                                     imgs.reshape(B, T, H, W, 3)[:, 0])
    clipify = lambda x: x.reshape((B, T) + x.shape[1:])
    batch = {"latents": clipify(latents),
             "cond": jax.tree_util.tree_map(clipify, cond),
             "guidance_latents": clipify(latents)}

    step1 = make_vdm_train_step(eng, lr=1e-4, guidance_dropout=0.0)
    step2 = make_vdm_train_step(eng, lr=1e-4, guidance_dropout=0.0,
                                accum_steps=2)
    k = jax.random.PRNGKey(2)
    s1, sc1 = step1(state, batch, k)
    s2, sc2 = step2(state, batch, k)
    np.testing.assert_allclose(float(sc1["loss"]), float(sc2["loss"]),
                               rtol=1e-4)
    # resulting parameters agree (same mean gradient)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.unet_params,
        s2.unet_params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5
