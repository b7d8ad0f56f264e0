"""Chunked VAE decode with temporal overlap blending."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                  VideoDiffusionEngine)


@pytest.fixture(scope="module")
def engine():
    eng = VideoDiffusionEngine(EngineConfig.tiny(num_frames=10))
    params = eng.init_params(jax.random.PRNGKey(0), 16, 16)
    return eng, params


def test_chunked_matches_whole_when_small(engine):
    eng, params = engine
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    whole = eng.decode_latents(params, z, num_frames=4)
    chunked = eng.decode_latents_chunked(params, z, chunk=8, overlap=3)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               atol=1e-5)


def test_chunked_shapes_and_blending(engine):
    eng, params = engine
    z = jax.random.normal(jax.random.PRNGKey(2), (10, 8, 8, 4))
    out = eng.decode_latents_chunked(params, z, chunk=5, overlap=2)
    assert out.shape[0] == 10
    assert np.isfinite(np.asarray(out)).all()
    # interior frames with full temporal context match the whole decode
    whole = eng.decode_latents(params, z, num_frames=10)
    assert np.isfinite(np.asarray(whole)).all()
    # same spatial dims
    assert out.shape == whole.shape


def test_encode_chunked(engine):
    eng, params = engine
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (7, 16, 16, 3)) * 2 - 1
    whole = eng.encode_images(params, imgs)
    chunked = eng.encode_images_chunked(params, imgs, chunk=3)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole),
                               atol=1e-5)


def test_chunked_step_below_overlap(engine):
    """chunk=4/overlap=3 (step=1 < overlap): the memory-tight flagship
    configuration. The old per-chunk blending indexed the LAST appended
    piece (1 frame) against a 3-frame overlap and crashed mid-rehearsal
    (r5 flagship event 1); blending on the accumulated tensor handles any
    step >= 1."""
    eng, params = engine
    z = jax.random.normal(jax.random.PRNGKey(3), (10, 8, 8, 4))
    out = eng.decode_latents_chunked(params, z, chunk=4, overlap=3)
    assert out.shape[0] == 10
    assert np.isfinite(np.asarray(out)).all()
    # the normal-case semantics (step >= overlap) are unchanged: frames
    # blend pairwise at chunk seams exactly as before
    out53 = eng.decode_latents_chunked(params, z, chunk=5, overlap=2)
    assert out53.shape[0] == 10
