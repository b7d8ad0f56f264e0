"""Euler EDM samplers, including the SDS partial-denoise distillation variant.

Functional analogs of vwm/modules/diffusionmodules/sampling.py:

- ``euler_edm_sample``: Euler steps over the EDM sigma schedule with
  cond-frame replacement each step (EulerEDMSampler, :94-126);
- ``euler_edm_sample_sds``: partial denoise from
  start_step = num_steps * (1 - scale), initializing x = render_latents +
  sigma_start * noise — the diffusion-distillation mechanism
  (EulerEDMSamplerSDS, :167-217).

``denoise_fn(x, sigma_vec) -> denoised`` must already include CFG combining
(guider) and conditioning; sigmas come from diffusion.edm_sigmas.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .diffusion import append_dims


def to_d(x: jax.Array, sigma: jax.Array, denoised: jax.Array) -> jax.Array:
    return (x - denoised) / append_dims(sigma, x.ndim)


def _replace_cond(x, cond_frame, cond_mask):
    if cond_mask is None or cond_frame is None:
        return x
    m = append_dims(cond_mask.astype(x.dtype), x.ndim)
    return x * (1 - m) + cond_frame * m


def euler_edm_sample(
    denoise_fn: Callable,
    x: jax.Array,                # [N, h, w, c] standard-normal noise
    sigmas: jax.Array,           # [num_steps + 1] (zero-appended)
    cond_frame: jax.Array | None = None,
    cond_mask: jax.Array | None = None,
) -> jax.Array:
    """Full Euler EDM sampling loop. x is pure noise; the reference scales it
    by sqrt(1 + sigma_0^2) before the loop (sampling.py:186-189, else branch)."""
    num_steps = sigmas.shape[0] - 1
    x = x * jnp.sqrt(1.0 + sigmas[0] ** 2)

    def step(carry, i):
        x = carry
        x = _replace_cond(x, cond_frame, cond_mask)
        sigma = sigmas[i]
        denoised = denoise_fn(x, jnp.full((x.shape[0],), sigma))
        d = to_d(x, jnp.full((x.shape[0],), sigma), denoised)
        dt = sigmas[i + 1] - sigma
        return x + d * dt, None

    x, _ = jax.lax.scan(step, x, jnp.arange(num_steps))
    return _replace_cond(x, cond_frame, cond_mask)


def euler_edm_sample_sds(
    denoise_fn: Callable,
    noise: jax.Array,            # [N, h, w, c] standard-normal noise
    sigmas: jax.Array,           # [num_steps + 1]
    render_latents: jax.Array,   # current 3DGS render, VAE-encoded
    scale: float,                # fraction of steps to run (0.3 .. 0.7)
    cond_frame: jax.Array | None = None,
    cond_mask: jax.Array | None = None,
) -> jax.Array:
    """SDS partial denoise (sampling.py:167-217): start at
    start_step = num_steps*(1-scale) from the noised render."""
    num_steps = sigmas.shape[0] - 1
    num_inference = int(num_steps * scale)
    start_step = num_steps - num_inference
    x = render_latents + noise * sigmas[start_step]

    def step(carry, i):
        x = carry
        x = _replace_cond(x, cond_frame, cond_mask)
        sigma = sigmas[i]
        denoised = denoise_fn(x, jnp.full((x.shape[0],), sigma))
        d = to_d(x, jnp.full((x.shape[0],), sigma), denoised)
        dt = sigmas[i + 1] - sigma
        return x + d * dt, None

    x, _ = jax.lax.scan(step, x, jnp.arange(start_step, num_steps))
    return _replace_cond(x, cond_frame, cond_mask)
