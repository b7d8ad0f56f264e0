"""Depth-based novel-view image warping (the ``virtual_warp`` guidance
variant).

Re-implements the reference's depth-reprojection warp
(street_gaussian/utils/novel_view_utils.py:308-371
``virtual_wrap_kernel_torch``): pixels of a *target* view are back-projected
with the target depth map, transformed into the *source* camera, and the
source image is sampled bilinearly at the projected positions. A pixel is
kept only when it projects inside the source frustum AND passes a relative
depth-consistency (occlusion) test: |sampled_src_depth - reprojected_depth|
< 0.1 * reprojected_depth (:359-362).

TPU notes: the whole warp is one fused elementwise/gather pipeline over the
[B, H*W] pixel grid — per-pixel quantities are kept as flat columns (never
[N, 2..4] lanes, see ops/gs_projection.py), and the four bilinear taps are
flat gathers on the (h*w) axis which XLA lowers to dynamic-slice-free
gathers. Everything is jit- and vmap-safe; there is no data-dependent
control flow.

Coordinate conventions follow the reference exactly:
- ``c2w`` matrices are camera->world (the reference calls them "extrinsic":
  ``tar_extrinsic = ego_pose @ cam_extrinsic``, novel_view_utils.py:446);
- grid_sample(align_corners=True) semantics with the reference's own
  ``(u / W) * 2 - 1`` normalization, i.e. the source is sampled at pixel
  ``u * (W - 1) / W`` with border clamping (:343-353).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WarpResult(NamedTuple):
    rgb: jax.Array    # [B, H, W, 3] warped source rgb, 0 where invalid
    mask: jax.Array   # [B, H, W] bool validity (in-frustum & unoccluded)
    depth: jax.Array  # [B, H, W] reprojected depth in the source camera


def _bilinear_border(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample img [H, W, C] at continuous (x, y) with border padding.

    x/y are flat [P] pixel coordinates (grid_sample align_corners=True
    convention: integer coordinates hit pixel centers)."""
    H, W = img.shape[:2]
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(H * W, -1)
    g00 = flat[y0i * W + x0i]
    g01 = flat[y0i * W + x1i]
    g10 = flat[y1i * W + x0i]
    g11 = flat[y1i * W + x1i]
    top = g00 * (1.0 - fx)[:, None] + g01 * fx[:, None]
    bot = g10 * (1.0 - fx)[:, None] + g11 * fx[:, None]
    return top * (1.0 - fy)[:, None] + bot * fy[:, None]


def virtual_warp_single(
    tar_K: jax.Array,       # [3, 3]
    tar_c2w: jax.Array,     # [4, 4]
    tar_depth: jax.Array,   # [H, W]
    src_K: jax.Array,       # [3, 3]
    src_c2w: jax.Array,     # [4, 4]
    src_depth: jax.Array,   # [H, W]
    src_rgb: jax.Array,     # [H, W, 3]
    depth_thresh: float = 0.1,
) -> WarpResult:
    """Warp one source view into one target view (kernel body, unbatched)."""
    H, W = tar_depth.shape
    f32 = jnp.float32

    # pixel grid scaled by target depth (novel_view_utils.py:320-327)
    v, u = jnp.meshgrid(jnp.arange(H, dtype=f32), jnp.arange(W, dtype=f32),
                        indexing="ij")
    d = tar_depth.reshape(-1).astype(f32)
    u = u.reshape(-1) * d
    v = v.reshape(-1) * d

    # back-project to target camera, transform to source camera (:329-333).
    # rel = src_w2c @ tar_c2w maps tar-cam -> src-cam.
    from .maths import affine_inverse
    rel = affine_inverse(src_c2w) @ tar_c2w
    Kinv = jnp.linalg.inv(tar_K.astype(f32))
    # keep per-point quantities as [P] columns
    xc = Kinv[0, 0] * u + Kinv[0, 1] * v + Kinv[0, 2] * d
    yc = Kinv[1, 0] * u + Kinv[1, 1] * v + Kinv[1, 2] * d
    zc = Kinv[2, 0] * u + Kinv[2, 1] * v + Kinv[2, 2] * d
    R, t = rel[:3, :3], rel[:3, 3]
    xs = R[0, 0] * xc + R[0, 1] * yc + R[0, 2] * zc + t[0]
    ys = R[1, 0] * xc + R[1, 1] * yc + R[1, 2] * zc + t[1]
    zs = R[2, 0] * xc + R[2, 1] * yc + R[2, 2] * zc + t[2]

    # project with source intrinsics (:334-336)
    Ks = src_K.astype(f32)
    up = Ks[0, 0] * xs + Ks[0, 1] * ys + Ks[0, 2] * zs
    vp = Ks[1, 0] * xs + Ks[1, 1] * ys + Ks[1, 2] * zs
    wp = Ks[2, 0] * xs + Ks[2, 1] * ys + Ks[2, 2] * zs
    safe = jnp.where(jnp.abs(wp) > 1e-12, wp, 1e-12)
    up = up / safe
    vp = vp / safe

    in_frustum = (zs > 0) & (up >= 0) & (up < W) & (vp >= 0) & (vp < H)

    # the reference samples at grid ((u/W)*2-1) under align_corners=True,
    # i.e. at pixel u*(W-1)/W (:343-353) — reproduced bit-for-bit
    sx = up * ((W - 1.0) / W)
    sy = vp * ((H - 1.0) / H)
    info = jnp.concatenate(
        [src_rgb.astype(f32), src_depth[..., None].astype(f32)], axis=-1)
    sampled = _bilinear_border(info, sx, sy)
    wrap_rgb = sampled[:, :3]
    wrap_depth = sampled[:, 3]

    # relative depth occlusion test (:358-362)
    unoccluded = jnp.abs(wrap_depth - zs) < depth_thresh * zs
    mask = in_frustum & unoccluded

    rgb_full = jnp.where(mask[:, None], wrap_rgb, 0.0)
    return WarpResult(rgb=rgb_full.reshape(H, W, 3),
                      mask=mask.reshape(H, W),
                      depth=zs.reshape(H, W))


def virtual_warp_images(
    tar_K: jax.Array,       # [B, 3, 3]
    tar_c2w: jax.Array,     # [B, 4, 4]
    tar_depth: jax.Array,   # [B, H, W]
    src_K: jax.Array,       # [B, 3, 3]
    src_c2w: jax.Array,     # [B, 4, 4]
    src_depth: jax.Array,   # [B, H, W]
    src_rgb: jax.Array,     # [B, H, W, 3]
    depth_thresh: float = 0.1,
) -> WarpResult:
    """Batched warp (virtual_wrap_kernel_torch analog)."""
    return jax.vmap(
        lambda a, b, c, d, e, f, g: virtual_warp_single(
            a, b, c, d, e, f, g, depth_thresh=depth_thresh)
    )(tar_K, tar_c2w, tar_depth, src_K, src_c2w, src_depth, src_rgb)


def process_depth(depth: jax.Array, acc: jax.Array,
                  sky_depth: float = 900.0) -> jax.Array:
    """Fill unaccumulated (sky) pixels with a far plane
    (img_utils.py:289-294)."""
    return jnp.clip(depth, 0.0, sky_depth) + sky_depth * (1.0 - acc)
