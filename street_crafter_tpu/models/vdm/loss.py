"""Diffusion training loss.

StandardDiffusionLoss analog (vwm/modules/diffusionmodules/loss.py:15-148):
per-video EDM sigma sampling, random cond-frame replacement (choices weighted
2^n, :73-81), offset noise (:83-88), sigma zeroed on cond frames for the
noising only, V-weighting, optional temporal-difference re-weighting and
high-frequency fourier-filtered term (:104-148, fourier_filter util.py:20-44).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .diffusion import append_dims, edm_sigma_sample, v_weighting

# reference training config (vista_condition/waymo yaml): frame-0-only
# conditioning choices with exponential weights
DEFAULT_COND_CHOICES: Sequence[Sequence[int]] = ((), (0,), (0, 1), (0, 1, 2))


def sample_cond_mask(key: jax.Array, batch_size: int, num_frames: int,
                     choices: Sequence[Sequence[int]] = DEFAULT_COND_CHOICES
                     ) -> jax.Array:
    """Random cond-frame mask per video, choices weighted 2^n (loss.py:73-81).
    Returns [batch*num_frames]. Choices must leave at least one frame
    unconditioned (reference asserts len(choices[-1]) < num_frames)."""
    choices = [c for c in choices if len(c) < num_frames
               and all(f < num_frames for f in c)]
    n = len(choices)
    weights = jnp.asarray([2.0 ** i for i in range(n)])
    probs = weights / weights.sum()
    idx = jax.random.choice(key, n, (batch_size,), p=probs)
    table = jnp.zeros((n, num_frames))
    for i, ch in enumerate(choices):
        for f in ch:
            table = table.at[i, f].set(1.0)
    return table[idx].reshape(batch_size * num_frames)


def fourier_filter(x: jax.Array, scale: float = 0.0,
                   d_s: float = 0.25) -> jax.Array:
    """High-pass filter in fourier space (util.py:20-43): on the fftshift'd
    spectrum, scales every bin whose NORMALIZED radius-squared from center,
    (2h/H-1)^2 + (2w/W-1)^2, is <= 2*d_s by ``scale``. x: [N, H, W, C].

    (Round-2 versions used a fixed 9x9 box around DC — a misreading caught
    by the real-reference oracle, tests/test_reference_parity.py.)"""
    H, W = x.shape[1], x.shape[2]
    freq = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    freq = jnp.fft.fftshift(freq, axes=(1, 2))
    yy = (2.0 * jnp.arange(H)[:, None] / H - 1.0) ** 2
    xx = (2.0 * jnp.arange(W)[None, :] / W - 1.0) ** 2
    low = (yy + xx) <= 2.0 * d_s
    mask = jnp.where(low, scale, 1.0)[None, :, :, None]
    freq = freq * mask
    freq = jnp.fft.ifftshift(freq, axes=(1, 2))
    return jnp.fft.ifftn(freq, axes=(1, 2)).real.astype(x.dtype)


def diffusion_loss(
    denoise_fn: Callable,        # (noised_x, sigma, cond_mask) -> D(x)
    key: jax.Array,
    latents: jax.Array,          # [B*T, h, w, 4] clean VAE latents
    num_frames: int = 25,
    p_mean: float = 1.0,
    p_std: float = 1.6,
    offset_noise_level: float = 0.02,
    replace_cond_frames: bool = True,
    cond_choices: Sequence[Sequence[int]] = DEFAULT_COND_CHOICES,
    use_additional_loss: bool = False,
    additional_loss_weight: float = 0.1,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    n = latents.shape[0]
    bs = n // num_frames
    k_sigma, k_mask, k_noise, k_offset = jax.random.split(key, 4)

    sigmas = edm_sigma_sample(k_sigma, (n,), p_mean, p_std, num_frames)
    if replace_cond_frames:
        cond_mask = sample_cond_mask(k_mask, bs, num_frames, cond_choices)
    else:
        cond_mask = jnp.zeros((n,))

    noise = jax.random.normal(k_noise, latents.shape)
    if offset_noise_level > 0:
        rand_init = jax.random.normal(k_offset, (n, latents.shape[-1]))
        noise = noise + offset_noise_level * rand_init[:, None, None, :]

    sigmas_bc = append_dims((1 - cond_mask) * sigmas, latents.ndim)
    noised = latents + noise * sigmas_bc

    model_out = denoise_fn(noised, sigmas, cond_mask)

    cm = append_dims(cond_mask, latents.ndim)
    predict = model_out * (1 - cm) + latents * cm  # ignore cond-frame preds

    w = append_dims(v_weighting(sigmas), latents.ndim)
    per_sample = (w * (predict - latents) ** 2).reshape(n, -1)

    if use_additional_loss:
        # temporal-difference re-weighting (loss.py:106-118)
        pr = predict.reshape(bs, num_frames, *predict.shape[1:])
        ta = latents.reshape(bs, num_frames, *latents.shape[1:])
        aux = ((ta[:, 1:] - ta[:, :-1]) - (pr[:, 1:] - pr[:, :-1])) ** 2
        flat = aux.reshape(bs, -1, aux.shape[-1])
        norm = jnp.sqrt(jnp.sum(flat ** 2, axis=(1,), keepdims=True)) + 1e-12
        aux_w = (flat / norm).reshape(aux.shape)
        aux_w = 1.0 + jnp.concatenate(
            [jnp.zeros_like(aux_w[:, :1]), aux_w], axis=1)
        aux_w = jax.lax.stop_gradient(aux_w.reshape(n, -1))
        per_sample = per_sample * aux_w
        # high-frequency loss (loss.py:119-121)
        hf = jnp.mean(
            (w * (fourier_filter(predict) - fourier_filter(latents)) ** 2)
            .reshape(n, -1), axis=1).mean()
        loss = per_sample.mean(axis=1).mean() + additional_loss_weight * hf
        return loss, {"loss": loss, "hf_loss": hf,
                      "sigma_mean": sigmas.mean()}

    loss = per_sample.mean(axis=1).mean()
    return loss, {"loss": loss, "sigma_mean": sigmas.mean()}
