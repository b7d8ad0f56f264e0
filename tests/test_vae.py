import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.vae import (
    VAE, VAEConfig, Encoder, Decoder, diagonal_gaussian_sample,
)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig.tiny()
    model = VAE(cfg, video_decoder=True)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, num_frames=2)
    return model, params, cfg


def test_encode_decode_shapes(tiny_vae):
    model, params, cfg = tiny_vae
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1
    z = model.apply(params, x, method=VAE.encode)
    # f = 2^(levels-1) = 2 for tiny config
    assert z.shape == (2, 8, 8, cfg.z_channels)
    y = model.apply(params, z, num_frames=2, method=VAE.decode)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_full_res_downsample_factor():
    cfg = VAEConfig(ch=16, ch_mult=(1, 1, 1, 1), num_res_blocks=1)
    enc = Encoder(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(params, x)
    assert z.shape == (1, 8, 8, 2 * cfg.z_channels)  # f8, double_z


def test_diagonal_gaussian():
    moments = jnp.concatenate([jnp.full((2, 4, 4, 4), 3.0),
                               jnp.full((2, 4, 4, 4), -30.0)], -1)
    # mode
    z = diagonal_gaussian_sample(moments)
    np.testing.assert_allclose(np.asarray(z), 3.0)
    # sample with ~zero std ≈ mean
    z = diagonal_gaussian_sample(moments, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(z), 3.0, atol=1e-3)


def test_video_decoder_uses_temporal_mixing(tiny_vae):
    model, params, cfg = tiny_vae
    # two frames with different content: temporal conv couples them, so
    # changing frame 1 must change the decode of frame 0
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, cfg.z_channels))
    y1 = model.apply(params, z, num_frames=2, method=VAE.decode)
    z2 = z.at[1].add(1.0)
    y2 = model.apply(params, z2, num_frames=2, method=VAE.decode)
    assert np.abs(np.asarray(y2[0] - y1[0])).max() > 1e-6


def test_encoder_roundtrip_improves_when_trained(tiny_vae):
    # one gradient step on reconstruction reduces loss (sanity: differentiable)
    model, params, cfg = tiny_vae
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3)) * 2 - 1

    def loss_fn(p):
        y = model.apply(p, x, num_frames=2)
        return jnp.mean((y - x) ** 2)

    l0, g = jax.value_and_grad(loss_fn)(params)
    p2 = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, params, g)
    l1 = loss_fn(p2)
    assert float(l1) < float(l0)
