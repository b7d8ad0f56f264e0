"""Image losses/metrics: SSIM (11x11 gaussian window), PSNR, masked L1/L2.

JAX analog of street_gaussian/utils/loss_utils.py:21-131 — same constants
(window 11, sigma 1.5, C1=0.01^2, C2=0.03^2) so SSIM values are comparable
with the reference's training logs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_window_np(size: int = 11, sigma: float = 1.5):
    import numpy as np
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    # cache numpy only: caching device arrays leaks tracers across jit scopes
    return jnp.asarray(_gaussian_window_np(size, sigma))


def _filter2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 2D filter on [H, W, C] with same padding."""
    C = img.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, 1))
    x = img.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return out[:, 0].transpose(1, 2, 0)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5, mask: jax.Array | None = None) -> jax.Array:
    """Mean SSIM over an [H, W, C] pair (values in [0, 1]); optional [H, W, 1]
    mask takes the masked mean of the SSIM map (loss_utils.py:95-131)."""
    w = _gaussian_window(window_size, sigma)
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, w) - mu1_sq
    s2 = _filter2d(img2 * img2, w) - mu2_sq
    s12 = _filter2d(img1 * img2, w) - mu12
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    if mask is not None:
        m = jnp.broadcast_to(mask, ssim_map.shape)
        return (ssim_map * m).sum() / jnp.maximum(m.sum(), 1.0)
    return jnp.mean(ssim_map)


def psnr(img1: jax.Array, img2: jax.Array,
         mask: jax.Array | None = None) -> jax.Array:
    if mask is not None:
        diff2 = ((img1 - img2) ** 2) * mask
        mse = diff2.sum() / jnp.maximum(mask.sum() * img1.shape[-1], 1.0)
    else:
        mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-10)))


def l1_loss(pred: jax.Array, gt: jax.Array,
            mask: jax.Array | None = None) -> jax.Array:
    d = jnp.abs(pred - gt)
    if mask is None:
        return jnp.mean(d)
    d = d * mask
    return d.sum() / jnp.maximum(mask.sum() * (pred.shape[-1] if mask.shape != d.shape else 1.0), 1.0)


def l2_loss(pred: jax.Array, gt: jax.Array,
            mask: jax.Array | None = None) -> jax.Array:
    d = (pred - gt) ** 2
    if mask is None:
        return jnp.mean(d)
    d = d * mask
    return d.sum() / jnp.maximum(mask.sum() * (pred.shape[-1] if mask.shape != d.shape else 1.0), 1.0)


def huber_loss(pred: jax.Array, gt: jax.Array, delta: float = 1.0) -> jax.Array:
    d = jnp.abs(pred - gt)
    quad = jnp.minimum(d, delta)
    return jnp.mean(0.5 * quad ** 2 + delta * (d - quad))
