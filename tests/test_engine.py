"""End-to-end tiny-engine tests (SURVEY §4c: one denoiser step with a tiny
UNet config; full conditioned sampling loop on toy shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.engine import VideoDiffusionEngine, EngineConfig
from street_crafter_tpu.models.vdm.conditioner import (
    make_vector_conditioning, concat_timestep_embed,
)
from street_crafter_tpu.models.vdm.loss import diffusion_loss


def test_vector_conditioning_dims():
    v = make_vector_conditioning(jnp.ones(2), jnp.ones(2) * 127, jnp.zeros(2),
                                 outdim=256)
    assert v.shape == (2, 768)
    e = concat_timestep_embed(jnp.array([[1.0, 2.0]]), 16)
    assert e.shape == (1, 32)


@pytest.fixture(scope="module")
def tiny_engine_with_params():
    cfg = EngineConfig.tiny(num_frames=3, num_steps=3)
    # tiny UNet adm_in_channels=24 -> vector outdim 8 per scalar
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), height=32, width=32)
    return eng, params, cfg


def test_engine_sample_shapes(tiny_engine_with_params):
    eng, params, cfg = tiny_engine_with_params
    T, H, W = cfg.num_frames, 32, 32
    guide = jnp.zeros((T, H, W, 3))
    cond = jnp.zeros((1, H, W, 3))
    out = eng.sample(params, jax.random.PRNGKey(1), guide, cond)
    assert out.shape == (T, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0


def test_engine_sds_sample(tiny_engine_with_params):
    eng, params, cfg = tiny_engine_with_params
    T, H, W = cfg.num_frames, 32, 32
    guide = jnp.zeros((T, H, W, 3))
    cond = jnp.zeros((1, H, W, 3))
    render = jnp.zeros((T, H, W, 3))
    out = eng.sample(params, jax.random.PRNGKey(2), guide, cond,
                     render_images=render, sds_scale=0.5)
    assert out.shape == (T, H, W, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_engine_training_loss(tiny_engine_with_params):
    eng, params, cfg = tiny_engine_with_params
    T, H, W = cfg.num_frames, 32, 32
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (T, H, W, 3)) * 2 - 1
    latents = eng.encode_images(params, imgs)
    cond, _ = eng.build_conditioning(params, imgs[:1])
    guidance = eng.encode_images(params, imgs)  # reuse as fake lidar latents

    def loss_fn(p):
        dfn = eng.training_denoise_fn(p, cond, guidance,
                                      jnp.ones((T,)))
        l, _ = diffusion_loss(dfn, jax.random.PRNGKey(4), latents,
                              num_frames=T)
        return l

    l, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["unet"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_sample_low_vram_bitmatch():
    """low_vram sampling (the reference's --low_vram submodule offload,
    sample_condition.py:52-77): device-dropping the non-UNet subtrees
    during the denoise loop must not change a single bit of the sample,
    and the caller's params dict must remain fully live afterwards (the
    window loop and EngineParamStore cleanup reuse it)."""
    import dataclasses

    import jax
    import numpy as np
    from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                      VideoDiffusionEngine)

    cfg = EngineConfig.tiny(num_frames=3, num_steps=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 64)
    guide = jnp.zeros((3, 32, 64, 3))
    cond = jnp.zeros((1, 32, 64, 3))
    base = eng.sample(params, jax.random.PRNGKey(1), guide, cond)

    eng_lv = VideoDiffusionEngine(dataclasses.replace(cfg, low_vram=True))
    out = eng_lv.sample(params, jax.random.PRNGKey(1), guide, cond)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    assert all(not leaf.is_deleted() for leaf in jax.tree.leaves(params))
    # a second window through the same dict must still work (in-place
    # re-push keeps the dict consistent)
    out2 = eng_lv.sample(params, jax.random.PRNGKey(2), guide, cond)
    assert np.isfinite(np.asarray(out2)).all()
