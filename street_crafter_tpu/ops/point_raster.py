"""Point-cloud -> image z-buffered splatting.

TPU-native replacement for the ``diff_point_rasterization`` CUDA package used
by the reference to produce the LiDAR pixel condition (rgb + mask), cf.
data_processor/utils/render_utils.py:83-183 and
waymo_render_lidar_pcd.py:264 (NDC point scale 0.01, occ=1.0).

Semantics reproduced:
- each point is splatted as a screen-space disk; with ``use_ndc_scale=True``
  the disk has *constant pixel radius* ``scale * 0.5 * min(H, W)`` (the
  reference computes a world-space radius proportional to depth that cancels
  back to this constant under projection, render_utils.py:119-124);
- compositing: the reference alpha-composites up to max_hit=10 depth-sorted
  hits, but the condition path always uses occ=1.0, i.e. the nearest point
  wins. We implement exact nearest-hit z-buffering.

Design (XLA, no CUDA): two phases —
1. scatter phase: points are lex-sorted by (center pixel, depth); each pixel
   keeps its ``layers`` nearest points (the analog of the reference's
   max_hit=10 hit buffer), giving unique (layer, pixel) scatter indices —
   fully deterministic, no atomics;
2. gather phase: every pixel examines a static (2R+1)^2 neighborhood of the
   layered scatter buffer and keeps the nearest candidate whose disk covers
   it. The window loop is unrolled; every step is a full-image vectorized
   select, so the whole pass is a handful of fused elementwise ops per offset.

This is also the golden-oracle implementation for the Pallas variant.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import maths

_INF = jnp.float32(1e10)


class PointRenderOutput(NamedTuple):
    rgb: jax.Array    # [H, W, 3]
    acc: jax.Array    # [H, W] 1.0 where any point covers the pixel
    depth: jax.Array  # [H, W] camera-space depth of the winning point (0 where empty)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "max_radius_px", "layers"))
def splat_points(
    points_cam: jax.Array,   # [N, 3] camera-space points
    colors: jax.Array,       # [N, 3]
    radii_px: jax.Array,     # [N] screen-space disk radius in pixels
    K: jax.Array,            # [3, 3]
    H: int,
    W: int,
    mask: jax.Array | None = None,  # [N] validity (for padded buffers)
    znear: float = 0.2,
    max_radius_px: int = 8,
    layers: int = 4,
) -> PointRenderOutput:
    """Nearest-hit splatting of camera-space points. Static shapes throughout."""
    x, y, z = points_cam[..., 0], points_cam[..., 1], points_cam[..., 2]
    valid = z > znear
    if mask is not None:
        valid = valid & mask

    zs = jnp.maximum(z, 1e-6)
    u = K[0, 0] * x / zs + K[0, 2]
    v = K[1, 1] * y / zs + K[1, 2]

    iu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 1)
    iv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 1)
    in_frame = (u >= -max_radius_px) & (u < W + max_radius_px) & \
               (v >= -max_radius_px) & (v < H + max_radius_px)
    valid = valid & in_frame

    depth = jnp.where(valid, z, _INF)
    pix = jnp.where(valid, iv * W + iu, H * W)  # invalid -> sentinel bucket

    # phase 1: lex-sort by (pixel, depth); per-pixel rank = hit order
    order = jnp.lexsort((depth, pix))
    pix_s = pix[order]
    depth_s = depth[order]
    n = pix.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]])
    seg_first = jax.lax.cummax(jnp.where(is_start, idx, -1))
    rank = idx - seg_first
    keep = (rank < layers) & (pix_s < H * W)
    layer = jnp.where(keep, rank, layers)  # dropped hits -> overflow layer
    iv_s = pix_s // W
    iu_s = pix_s % W

    du = (u - (iu.astype(jnp.float32) + 0.5))[order]
    dv = (v - (iv.astype(jnp.float32) + 0.5))[order]
    rgb_s = colors.astype(jnp.float32)[order]
    rad_s = radii_px.astype(jnp.float32)[order]

    # unique (layer, pixel) indices -> plain deterministic scatter-set
    # (overflow layer and sentinel pixel absorb dropped/invalid points).
    # channel-packed attribute buffer: [layers, H, W, 7] =
    # (depth, radius, du, dv, rgb)
    attrs = jnp.concatenate([
        depth_s[:, None], rad_s[:, None], du[:, None], dv[:, None], rgb_s], -1)
    buf = jnp.full((layers + 1, H * W + 1, 7), 0.0, jnp.float32)
    buf = buf.at[..., 0].set(_INF)
    buf = buf.at[layer, pix_s].set(attrs)
    buf = buf[:layers, :H * W].reshape(layers, H, W, 7)

    # phase 2: windowed gather — nearest covering candidate per pixel.
    # Pad once; each window offset is one dynamic_slice inside a lax.scan,
    # so the compiled graph has a single small body.
    R = int(max_radius_px)
    pad_val = jnp.zeros((7,), jnp.float32).at[0].set(_INF)
    padded = jnp.full((layers, H + 2 * R, W + 2 * R, 7), pad_val, jnp.float32)
    padded = padded.at[:, R:R + H, R:R + W].set(buf)

    offs = jnp.stack(jnp.meshgrid(jnp.arange(-R, R + 1), jnp.arange(-R, R + 1),
                                  indexing="ij"), -1).reshape(-1, 2)

    def body(carry, off):
        best_depth, best_rgb = carry
        dy, dx = off[0], off[1]
        # candidate stored at pixel q covers pixel p = q + (dy, dx):
        # read source q = p - (dy, dx) -> slice start (R - dy, R - dx)
        cand = jax.lax.dynamic_slice(
            padded, (0, R - dy, R - dx, 0), (layers, H, W, 7))
        cand_depth, cand_rad = cand[..., 0], cand[..., 1]
        cand_du, cand_dv = cand[..., 2], cand[..., 3]
        fdx = dx.astype(jnp.float32)
        fdy = dy.astype(jnp.float32)
        dist2 = (fdx - cand_du) ** 2 + (fdy - cand_dv) ** 2
        covers = (dist2 <= cand_rad ** 2) & (cand_depth < _INF)
        depth_m = jnp.where(covers, cand_depth, _INF)       # [layers, H, W]
        l_best = jnp.argmin(depth_m, axis=0)                # [H, W]
        d_best = jnp.min(depth_m, axis=0)
        closer = d_best < best_depth
        best_depth = jnp.where(closer, d_best, best_depth)
        rgb_best = jnp.take_along_axis(
            cand[..., 4:], l_best[None, ..., None], axis=0)[0]
        best_rgb = jnp.where(closer[..., None], rgb_best, best_rgb)
        return (best_depth, best_rgb), None

    init = (jnp.full((H, W), _INF, jnp.float32), jnp.zeros((H, W, 3), jnp.float32))
    (best_depth, best_rgb), _ = jax.lax.scan(body, init, offs)

    hit = best_depth < _INF
    return PointRenderOutput(
        rgb=jnp.where(hit[..., None], best_rgb, 0.0),
        acc=hit.astype(jnp.float32),
        depth=jnp.where(hit, best_depth, 0.0),
    )


def ndc_radius_px(scale: float, H: int, W: int) -> float:
    """Constant pixel radius of the reference's use_ndc_scale mode
    (render_utils.py:119-124): scale * 0.5 * min(H, W)."""
    return scale * 0.5 * min(H, W)


def render_pointcloud(
    c2w: jax.Array,        # [4, 4]
    K: jax.Array,          # [3, 3]
    points: jax.Array,     # [N, 3] world-space
    colors: jax.Array,     # [N, 3]
    H: int,
    W: int,
    scale: float = 0.01,
    use_ndc_scale: bool = True,
    point_radii: jax.Array | None = None,  # [N] world-space radii (knn mode)
    mask: jax.Array | None = None,
    znear: float = 0.2,
) -> PointRenderOutput:
    """World-space API mirroring render_pointcloud_diff_point_rasterization
    (render_utils.py:83-183). Returns rgb/acc/depth images."""
    w2c = maths.affine_inverse(c2w)
    pts_cam = maths.transform_points(w2c, points)
    z = jnp.maximum(pts_cam[..., 2], 1e-6)
    if use_ndc_scale:
        r_px = ndc_radius_px(scale, H, W)
        radii_px = jnp.full(points.shape[:-1], r_px, jnp.float32)
        max_r = max(1, int(math.ceil(r_px)))
    else:
        world_r = point_radii if point_radii is not None else jnp.full(
            points.shape[:-1], scale, jnp.float32)
        radii_px = K[0, 0] * world_r / z
        # conservative static window: cap at 12 px (larger splats are clipped)
        max_r = 12
        radii_px = jnp.minimum(radii_px, max_r)
    return splat_points(pts_cam, colors, radii_px, K, H, W,
                        mask=mask, znear=znear, max_radius_px=max_r)


def render_pointcloud_gaussian(
    c2w: jax.Array,        # [4, 4]
    K: jax.Array,          # [3, 3]
    points: jax.Array,     # [N, 3] world-space
    colors: jax.Array,     # [N, 3]
    H: int,
    W: int,
    scale: float = 0.01,
    use_ndc_scale: bool = True,
    occ: float = 1.0,
    mask: jax.Array | None = None,
    znear: float = 0.2,
    select_method: str = "approx",
    recall_target: float = 0.95,
) -> PointRenderOutput:
    """Reference-exact condition rendering: diff_point_rasterization IS a
    Gaussian rasterizer (render_utils.py:83-183) — every point becomes an
    isotropic 2D Gaussian (alpha = occ * exp(-0.5 d^2 / sigma^2), 0.999
    clamp, 1/255 cutoff) alpha-composited in depth order, NOT a hard
    nearest-hit disk. With use_ndc_scale=True (waymo_render_lidar_pcd.py:264)
    the world sigma is scale * z / fx * 0.5 * min(H, W), i.e. a CONSTANT
    pixel sigma of scale * 0.5 * min(H, W) after projection
    (render_utils.py:119-124). Routed through ops.gs_raster so the condition
    pngs match the reference's soft splat edges; ``render_pointcloud``
    (nearest-hit z-buffer) remains the fast mask/depth variant.

    acc is the composited alpha (the reference saves it as the condition
    mask png, waymo_render_lidar_pcd.py:276-278)."""
    from .gs_raster import rasterize_pixels

    w2c = maths.affine_inverse(c2w)
    pts_cam = maths.transform_points(w2c, points)
    x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
    valid = z > znear
    if mask is not None:
        valid = valid & mask
    zs = jnp.maximum(z, 1e-6)
    u = K[0, 0] * x / zs + K[0, 2]
    v = K[1, 1] * y / zs + K[1, 2]

    if use_ndc_scale:
        sigma_px = jnp.full(z.shape, ndc_radius_px(scale, H, W), jnp.float32)
    else:
        sigma_px = K[0, 0] * scale / zs
    inv_s2 = 1.0 / jnp.maximum(sigma_px * sigma_px, 1e-12)
    radii = 3.0 * sigma_px
    n = points.shape[0]
    chan = jnp.concatenate(
        [colors.astype(jnp.float32), z[:, None]], -1)
    out = rasterize_pixels(
        u, v, inv_s2, jnp.zeros(n, jnp.float32), inv_s2, chan,
        jnp.full(n, occ, jnp.float32), z, valid, radii,
        width=W, height=H, tile_size=16,
        max_per_tile=min(n, 512), coarse_factor=8,
        max_per_coarse=min(n, 4096),
        select_method=select_method, recall_target=recall_target)
    acc = out.alpha
    depth = out.colors[..., 3] / jnp.maximum(acc, 1e-10)
    return PointRenderOutput(
        rgb=out.colors[..., :3], acc=acc,
        depth=jnp.where(acc > 0, depth, 0.0))
