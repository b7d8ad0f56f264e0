"""Distillation-loss assembly.

Mirrors the loss stack of the reference train loop (train.py:149-233):

- regular views: masked L1 + DSSIM (+ optional LPIPS), optional sky-entropy
  vs sky mask, object-acc entropy vs obj-bound mask, best-95% LiDAR depth L1,
  scale-flatten regularizer, color-correction identity regularizer;
- novel (diffusion-supervised) views: the same photometric trio restricted to
  the lower 60% of the image, scaled by lambda_novel*.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ...ops.ssim import l1_loss, ssim


class LossWeights(NamedTuple):
    lambda_l1: float = 1.0
    lambda_dssim: float = 0.2
    lambda_lpips: float = 0.0
    lambda_sky: float = 0.0
    lambda_reg: float = 0.0
    lambda_depth_lidar: float = 0.0
    lambda_scale_flatten: float = 0.0
    lambda_color_correction: float = 0.0
    lambda_novel: float = 0.1
    lambda_novel_l1: float = 0.1
    lambda_novel_dssim: float = 0.1
    lambda_novel_lpips: float = 1.0


def photometric_loss(image, gt, mask, l1_w, dssim_w, lpips_w,
                     lpips_fn: Callable | None = None):
    ll1 = l1_loss(image, gt, mask)
    ssim_v = ssim(image, gt, mask=mask)
    loss = (1.0 - dssim_w) * l1_w * ll1 + dssim_w * (1.0 - ssim_v)
    scalars = {"l1": ll1, "ssim": ssim_v}
    if lpips_fn is not None and lpips_w > 0:
        lp = lpips_fn(image * mask, gt * mask)
        loss = loss + lpips_w * lp
        scalars["lpips"] = lp
    return loss, scalars


def sky_entropy_loss(acc: jax.Array, sky_mask: jax.Array) -> jax.Array:
    """-log(1-acc) inside sky, binary entropy elsewhere (train.py:195-199)."""
    acc = jnp.clip(acc, 1e-6, 1.0 - 1e-6)
    ent = -(acc * jnp.log(acc) + (1 - acc) * jnp.log(1 - acc))
    return jnp.mean(jnp.where(sky_mask, -jnp.log(1 - acc), ent))


def obj_acc_entropy_loss(acc_obj: jax.Array, obj_bound: jax.Array) -> jax.Array:
    """Entropy inside the object bound, -log(1-acc) outside (train.py:202-208)."""
    acc = jnp.clip(acc_obj, 1e-6, 1.0 - 1e-6)
    ent = -(acc * jnp.log(acc) + (1 - acc) * jnp.log(1 - acc))
    return jnp.mean(jnp.where(obj_bound, ent, -jnp.log(1 - acc)))


def lidar_depth_loss(depth: jax.Array, lidar_depth: jax.Array,
                     mask: jax.Array) -> jax.Array:
    """L1 on the best 95% of valid LiDAR pixels (train.py:211-220) — the
    top-5% largest errors (moving objects / mismatches) are dropped via a
    quantile threshold instead of a dynamic-shape topk."""
    m = (lidar_depth > 0.0) & mask
    err = jnp.abs(depth - lidar_depth)
    err_masked = jnp.where(m, err, jnp.nan)
    q = jnp.nanquantile(err_masked, 0.95)
    keep = m & (err <= q)
    return jnp.sum(jnp.where(keep, err, 0.0)) / jnp.maximum(jnp.sum(keep), 1.0)


def scale_flatten_loss(scaling: jax.Array, valid: jax.Array) -> jax.Array:
    """Encourage disk-like gaussians (train.py:223-227): mean min-scale plus
    anisotropy of the two largest scales."""
    n = jnp.maximum(valid.sum(), 1.0)
    smin = jnp.min(scaling, axis=-1)
    top2 = jax.lax.top_k(scaling, 2)[0]
    aniso = (top2 ** 2).sum(-1) / jnp.maximum(top2.prod(-1), 1e-12) - 2.0
    return (jnp.where(valid, smin, 0.0).sum()
            + jnp.where(valid, aniso, 0.0).sum()) / n


def color_correction_reg(color_corr: jax.Array,
                         color_corr_sky: jax.Array | None = None) -> jax.Array:
    """L1 identity regularizer on the affine color matrices (incl. the sky
    set when present, color_correction.py:140-146)."""
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    reg = jnp.mean(jnp.abs(color_corr - eye))
    if color_corr_sky is not None:
        reg = reg + jnp.mean(jnp.abs(color_corr_sky - eye))
    return reg


def compute_train_loss(
    render_out: dict[str, jax.Array],
    batch: dict[str, Any],
    weights: LossWeights,
    is_novel: bool = False,
    lpips_fn: Callable | None = None,
    scene_scaling: jax.Array | None = None,
    scene_valid: jax.Array | None = None,
    color_corr: jax.Array | None = None,
    color_corr_sky: jax.Array | None = None,
    acc_obj: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    image = render_out["rgb"]
    gt = batch["gt_image"]
    mask = batch.get("mask")
    if mask is None:
        mask = jnp.ones(gt.shape[:2] + (1,), jnp.float32)

    scalars: dict[str, jax.Array] = {}
    if is_novel:
        # only the lower 60% of novel views is supervised (train.py:163-170)
        upper = int(gt.shape[0] * 0.4)
        row = jnp.arange(gt.shape[0])[:, None, None]
        mask = jnp.where(row < upper, 0.0, mask)
        img_l, gt_l, m_l = image[upper:], gt[upper:], mask[upper:]
        loss, ph = photometric_loss(
            img_l, gt_l, m_l, weights.lambda_novel_l1,
            weights.lambda_novel_dssim, weights.lambda_novel_lpips, lpips_fn)
        loss = loss * weights.lambda_novel
        scalars.update({f"novel_{k}": v for k, v in ph.items()})
        scalars["loss"] = loss
        return loss, scalars

    loss, ph = photometric_loss(
        image, gt, mask, weights.lambda_l1, weights.lambda_dssim,
        weights.lambda_lpips, lpips_fn)
    scalars.update(ph)

    if weights.lambda_sky > 0 and "sky_mask" in batch:
        sky = sky_entropy_loss(render_out["acc"], batch["sky_mask"][..., 0])
        loss = loss + weights.lambda_sky * sky
        scalars["sky_loss"] = sky

    if weights.lambda_reg > 0 and acc_obj is not None and "obj_bound" in batch:
        ol = obj_acc_entropy_loss(acc_obj, batch["obj_bound"][..., 0])
        loss = loss + weights.lambda_reg * ol
        scalars["obj_acc_loss"] = ol

    if weights.lambda_depth_lidar > 0 and "lidar_depth" in batch:
        dl = lidar_depth_loss(render_out["depth"], batch["lidar_depth"][..., 0],
                              mask[..., 0] > 0)
        loss = loss + weights.lambda_depth_lidar * dl
        scalars["lidar_depth_loss"] = dl

    if weights.lambda_scale_flatten > 0 and scene_scaling is not None:
        sl = scale_flatten_loss(scene_scaling, scene_valid)
        loss = loss + weights.lambda_scale_flatten * sl
        scalars["scale_flatten_loss"] = sl

    if weights.lambda_color_correction > 0 and color_corr is not None:
        cl = color_correction_reg(color_corr, color_corr_sky)
        loss = loss + weights.lambda_color_correction * cl
        scalars["color_correction_loss"] = cl

    scalars["loss"] = loss
    return loss, scalars
