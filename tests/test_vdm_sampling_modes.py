"""Interleaved conditioning + multi-round rollout sampling (tiny engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                  VideoDiffusionEngine)


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig.tiny(num_frames=4, num_steps=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 16, 32)
    return eng, params


def test_sample_multi_cond_indices(engine):
    eng, params = engine
    key = jax.random.PRNGKey(1)
    guides = jax.random.uniform(key, (4, 16, 32, 3)) * 2 - 1
    conds = jax.random.uniform(key, (2, 16, 32, 3)) * 2 - 1
    out = eng.sample(params, key, guide_images=guides, cond_image=conds,
                     cond_indices=(0, 3))
    assert out.shape == (4, 16, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

    # latent-level cond replacement: the sampler pins frames 0 and 3 to the
    # cond latents regardless of the denoiser (sampling.py:198-214 semantics)
    from street_crafter_tpu.models.vdm.samplers import euler_edm_sample
    from street_crafter_tpu.models.vdm import diffusion as D
    z = eng.encode_images(params, conds)
    cond_frame = jnp.zeros((4,) + z.shape[1:])
    cond_frame = cond_frame.at[0].set(z[0]).at[3].set(z[1])
    cond_mask = jnp.zeros((4,)).at[0].set(1.0).at[3].set(1.0)
    sigmas = D.edm_sigmas(2, 0.002, 700.0, 7.0)
    noise = jax.random.normal(key, cond_frame.shape)
    zs = euler_edm_sample(lambda x, s: jnp.ones_like(x), noise, sigmas,
                          cond_frame=cond_frame, cond_mask=cond_mask)
    np.testing.assert_allclose(np.asarray(zs[0]), np.asarray(z[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zs[3]), np.asarray(z[1]), atol=1e-6)
    # free frames converge toward the denoiser's prediction (ones), not to
    # the (zero) cond_frame placeholder
    assert np.abs(np.asarray(zs[1]) - 1.0).mean() < 0.5


def test_sample_rollout(engine):
    from street_crafter_tpu.runner.vdm_sample import sample_rollout
    eng, params = engine
    rng = np.random.default_rng(0)
    F = 7  # needs 2 rounds at T=4 with overlap 2
    guides = rng.uniform(-1, 1, (F, 16, 32, 3)).astype(np.float32)
    cond = rng.uniform(-1, 1, (16, 32, 3)).astype(np.float32)
    out = sample_rollout(eng, params, jax.random.PRNGKey(2), guides, cond,
                         overlap=2)
    assert out.shape == (F, 16, 32, 3)
    assert np.isfinite(out).all()
