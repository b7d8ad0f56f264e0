import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.models.vdm import diffusion as D
from street_crafter_tpu.models.vdm.samplers import euler_edm_sample, euler_edm_sample_sds
from street_crafter_tpu.models.vdm.loss import (
    sample_cond_mask, fourier_filter, diffusion_loss,
)


def test_edm_sigmas_schedule():
    s = np.asarray(D.edm_sigmas(50, sigma_min=0.002, sigma_max=700.0))
    assert len(s) == 51
    np.testing.assert_allclose(s[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(s[49], 0.002, rtol=1e-4)
    assert s[50] == 0.0
    assert np.all(np.diff(s) < 0)
    # rho=7 formula check at an interior index (ramp = i / 49)
    rho = 7.0
    i = 25
    ramp = i / 49
    want = (700 ** (1 / rho) + ramp * (0.002 ** (1 / rho) - 700 ** (1 / rho))) ** rho
    np.testing.assert_allclose(s[i], want, rtol=1e-4)


def test_v_scaling():
    sigma = jnp.array([0.5, 2.0])
    s = D.v_scaling_edm_cnoise(sigma)
    np.testing.assert_allclose(np.asarray(s.c_skip), 1 / (sigma ** 2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.c_out),
                               -sigma / np.sqrt(sigma ** 2 + 1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.c_noise), 0.25 * np.log(sigma), rtol=1e-6)


def test_sigma_sample_shared_per_video():
    s = D.edm_sigma_sample(jax.random.PRNGKey(0), (4 * 5,), num_frames=5)
    s = np.asarray(s).reshape(4, 5)
    assert np.all(s == s[:, :1])  # shared within video
    assert len(np.unique(s[:, 0])) > 1


def test_guiders():
    uc = jnp.zeros((4, 2))
    c = jnp.ones((4, 2))
    np.testing.assert_allclose(np.asarray(D.vanilla_cfg(uc, c, 2.5)), 2.5)
    lin = np.asarray(D.linear_cfg(uc, c, max_scale=3.0, min_scale=1.0,
                                  num_frames=4))
    np.testing.assert_allclose(lin[:, 0], [1.0, 5 / 3, 7 / 3, 3.0], rtol=1e-5)
    tri = np.asarray(D.triangle_cfg(uc, c, max_scale=3.0, min_scale=1.0,
                                    num_frames=4))
    assert tri[:, 0].max() == 3.0 and tri[0, 0] == 1.0


def test_denoiser_identity_model():
    # if network predicts v = 0, D(x) = x * c_skip
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 2))
    sigma = jnp.array([0.5, 1.0, 2.0])
    out = D.denoise(lambda xx, cn: jnp.zeros_like(xx), x, sigma)
    want = x * D.append_dims(1 / (sigma ** 2 + 1), 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5)


def test_euler_sampler_perfect_denoiser():
    # a denoiser that always returns the clean target drives x to the target
    target = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    sigmas = D.edm_sigmas(20, sigma_max=80.0)
    noise = jax.random.normal(jax.random.PRNGKey(2), target.shape)
    out = euler_edm_sample(lambda x, s: target, noise, sigmas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)


def test_sds_sampler_partial_start():
    target = jnp.zeros((2, 4, 4, 3))
    sigmas = D.edm_sigmas(10, sigma_max=80.0)
    render = jax.random.normal(jax.random.PRNGKey(3), target.shape)
    noise = jax.random.normal(jax.random.PRNGKey(4), target.shape)
    out = euler_edm_sample_sds(lambda x, s: target, noise, sigmas, render,
                               scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-3)


def test_cond_frame_replacement_in_sampler():
    cond_frame = jnp.full((4, 2, 2, 1), 7.0)
    cond_mask = jnp.array([1.0, 0, 0, 0])
    sigmas = D.edm_sigmas(5, sigma_max=10.0)
    noise = jax.random.normal(jax.random.PRNGKey(5), cond_frame.shape)
    out = euler_edm_sample(lambda x, s: jnp.zeros_like(x), noise, sigmas,
                           cond_frame=cond_frame, cond_mask=cond_mask)
    np.testing.assert_allclose(np.asarray(out[0]), 7.0, atol=1e-6)


def test_cond_mask_distribution():
    mask = sample_cond_mask(jax.random.PRNGKey(0), 64, 5)
    m = np.asarray(mask).reshape(64, 5)
    # last choice (0,1,2) has the largest weight; frame 0 conditioned most often
    assert m[:, 0].mean() > 0.5
    assert m[:, 4].sum() == 0  # frame 4 never a cond frame in default choices


def test_fourier_filter_removes_low_freq():
    x = jnp.ones((1, 16, 16, 2))  # pure DC
    hf = fourier_filter(x, scale=0.0)
    np.testing.assert_allclose(np.asarray(hf), 0.0, atol=1e-5)


def test_diffusion_loss_runs_and_differentiable():
    latents = jax.random.normal(jax.random.PRNGKey(6), (2 * 5, 4, 4, 4))

    def loss_of(w):
        def dfn(noised, sigma, cond_mask):
            return D.denoise(lambda xx, cn: xx * w, noised, sigma)
        l, _ = diffusion_loss(dfn, jax.random.PRNGKey(7), latents,
                              num_frames=5, use_additional_loss=True)
        return l

    g = jax.grad(loss_of)(jnp.float32(0.1))
    assert np.isfinite(float(g))
    l0 = float(loss_of(jnp.float32(0.0)))
    assert np.isfinite(l0) and l0 > 0
