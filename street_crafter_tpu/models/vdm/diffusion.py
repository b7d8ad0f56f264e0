"""EDM diffusion math: scalings, discretization, sigma sampling, guiders.

Pure-function analogs of vwm/modules/diffusionmodules/{denoiser.py,
denoiser_scaling.py, discretizer.py, sigma_sampling.py, loss_weighting.py,
guiders.py}. The model wrapper D(x) = net(c_in*x, c_noise)*c_out + x*c_skip
follows denoiser.py:22-35 with the Vista V-scaling + EDM c_noise
(denoiser_scaling.py:51-59).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Scaling(NamedTuple):
    c_skip: jax.Array
    c_out: jax.Array
    c_in: jax.Array
    c_noise: jax.Array


def v_scaling_edm_cnoise(sigma: jax.Array) -> Scaling:
    """VScalingWithEDMcNoise (denoiser_scaling.py:51-59)."""
    return Scaling(
        c_skip=1.0 / (sigma ** 2 + 1.0),
        c_out=-sigma / jnp.sqrt(sigma ** 2 + 1.0),
        c_in=1.0 / jnp.sqrt(sigma ** 2 + 1.0),
        c_noise=0.25 * jnp.log(sigma),
    )


def edm_scaling(sigma: jax.Array, sigma_data: float = 0.5) -> Scaling:
    return Scaling(
        c_skip=sigma_data ** 2 / (sigma ** 2 + sigma_data ** 2),
        c_out=sigma * sigma_data / jnp.sqrt(sigma ** 2 + sigma_data ** 2),
        c_in=1.0 / jnp.sqrt(sigma ** 2 + sigma_data ** 2),
        c_noise=0.25 * jnp.log(sigma),
    )


def eps_scaling(sigma: jax.Array) -> Scaling:
    return Scaling(
        c_skip=jnp.ones_like(sigma), c_out=-sigma,
        c_in=1.0 / jnp.sqrt(sigma ** 2 + 1.0), c_noise=sigma)


def edm_sigmas(n: int, sigma_min: float = 0.002, sigma_max: float = 700.0,
               rho: float = 7.0, append_zero: bool = True) -> jax.Array:
    """EDMDiscretization (discretizer.py:26-37); StreetCrafter uses
    sigma_max=700 (training config)."""
    ramp = jnp.linspace(0, 1, n)
    min_r = sigma_min ** (1 / rho)
    max_r = sigma_max ** (1 / rho)
    sigmas = (max_r + ramp * (min_r - max_r)) ** rho
    if append_zero:
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))])
    return sigmas


def edm_sigma_sample(key: jax.Array, shape, p_mean: float = 1.0,
                     p_std: float = 1.6, num_frames: int = 25) -> jax.Array:
    """EDMSampling (sigma_sampling.py:8-20): per-video lognormal sigma shared
    across the clip's frames. ``shape[0]`` must be batch*num_frames."""
    n_videos = shape[0] // num_frames
    log_sigma = p_mean + p_std * jax.random.normal(key, (n_videos,))
    sigma = jnp.exp(log_sigma)
    return jnp.repeat(sigma, num_frames)


def v_weighting(sigma: jax.Array) -> jax.Array:
    """VWeighting (loss_weighting.py): w = 1 + 1/sigma^2."""
    return 1.0 + 1.0 / sigma ** 2


def append_dims(x: jax.Array, target_ndim: int) -> jax.Array:
    return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))


def denoise(
    model_fn: Callable,          # (scaled_x, c_noise) -> model output
    x: jax.Array,                # [N, H, W, C] noisy input
    sigma: jax.Array,            # [N]
    scaling_fn: Callable = v_scaling_edm_cnoise,
) -> jax.Array:
    """EDM-preconditioned denoiser D(x) = net(c_in*x, c_noise)*c_out +
    x*c_skip (denoiser.py:22-35). cond_mask reaches the network inside
    ``model_fn`` (it switches the time embedding, not the scalings)."""
    s = scaling_fn(sigma)
    c_in = append_dims(s.c_in, x.ndim)
    c_out = append_dims(s.c_out, x.ndim)
    c_skip = append_dims(s.c_skip, x.ndim)
    out = model_fn(x * c_in, s.c_noise)
    return out * c_out + x * c_skip


# ----------------------------------------------------------------- guiders

def vanilla_cfg(uncond: jax.Array, cond: jax.Array, scale: float) -> jax.Array:
    """VanillaCFG combine (guiders.py:23-26)."""
    return uncond + scale * (cond - uncond)


def linear_cfg(uncond: jax.Array, cond: jax.Array, max_scale: float,
               min_scale: float, num_frames: int) -> jax.Array:
    """LinearPredictionGuider: per-frame scale ramp min->max (guiders.py:55-90)."""
    scale = jnp.linspace(min_scale, max_scale, num_frames)
    n = uncond.shape[0] // num_frames
    scale = jnp.tile(scale, n)
    scale = append_dims(scale, uncond.ndim)
    return uncond + scale * (cond - uncond)


def triangle_cfg(uncond: jax.Array, cond: jax.Array, max_scale: float,
                 min_scale: float, num_frames: int) -> jax.Array:
    """TrianglePredictionGuider: scale rises to max mid-clip (guiders.py:93-129)."""
    half = (num_frames + 1) // 2
    up = jnp.linspace(min_scale, max_scale, half)
    down = jnp.linspace(max_scale, min_scale, num_frames - half + 1)[1:]
    scale = jnp.concatenate([up, down])
    n = uncond.shape[0] // num_frames
    scale = jnp.tile(scale, n)
    return uncond + append_dims(scale, uncond.ndim) * (cond - uncond)
