"""Tile-binned differentiable Gaussian rasterization.

TPU-native replacement for gsplat's ``isect_tiles`` / ``isect_offset_encode``
/ ``rasterize_to_pixels`` CUDA kernels (street_gaussian_renderer.py:243-280)
and for the INRIA ``diff-gaussian-rasterization`` fallback path.

Formulation chosen for TPU rather than translated from CUDA:

- the CUDA rasterizer builds dynamic per-tile worklists (radix sort over
  (tile, depth) keys) and each pixel walks its list sequentially with early
  termination. Dynamic worklists and per-pixel loops map poorly onto a SIMD
  machine / XLA static shapes.
- here every tile selects its ``max_per_tile`` nearest intersecting Gaussians
  with a top-k over depth keys (fixed capacity, static shapes), then
  composites ALL of them at once: alpha weights form a [K, pixels] matrix and
  the sequential over-operator becomes an (exclusive) cumulative product of
  (1 - alpha) along K — a vectorized prefix op followed by a single matmul
  with the color matrix (MXU). Backward is XLA autodiff through the same
  graph (wrapped in jax.checkpoint by callers to avoid storing per-tile
  residuals).

Capacity overflow drops the *farthest* Gaussians of a tile — exactly the ones
a saturated transmittance would have ignored. Tests use max_per_tile >= N so
the oracle comparison is exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e10)
ALPHA_CLAMP = 0.999
ALPHA_MIN = 1.0 / 255.0


class RasterOutput(NamedTuple):
    colors: jax.Array  # [H, W, C]
    alpha: jax.Array   # [H, W]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "max_per_tile"))
def rasterize_pixels(
    means2d: jax.Array,    # [N, 2] pixel coords
    conics: jax.Array,     # [N, 3] (a, b, c) inverse covariance
    colors: jax.Array,     # [N, C]
    opacities: jax.Array,  # [N]
    depths: jax.Array,     # [N]
    valid: jax.Array,      # [N] bool
    radii: jax.Array,      # [N] pixel radius
    width: int,
    height: int,
    tile_size: int = 16,
    max_per_tile: int = 1024,
) -> RasterOutput:
    ts = tile_size
    TW = -(-width // ts)
    TH = -(-height // ts)
    n = means2d.shape[0]
    kcap = min(max_per_tile, n)
    C = colors.shape[-1]

    u = means2d[:, 0]
    v = means2d[:, 1]
    x0 = u - radii
    x1 = u + radii
    y0 = v - radii
    y1 = v + radii
    depth_key = jnp.where(valid, depths, _INF)

    # pixel center offsets within a tile, flattened [P]
    py, px = jnp.meshgrid(jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)

    def tile_row(_, ty):
        # tiles of this row: tx in [0, TW)
        tx = jnp.arange(TW, dtype=jnp.float32)
        tile_x0 = tx * ts
        tile_y0 = jnp.float32(ty) * ts
        inter = (
            (x0[None, :] < tile_x0[:, None] + ts)
            & (x1[None, :] > tile_x0[:, None])
            & (y0[None, :] < tile_y0 + ts)
            & (y1[None, :] > tile_y0)
        )  # [TW, N]
        key = jnp.where(inter, depth_key[None, :], _INF)
        neg_top, idx = jax.lax.top_k(-key, kcap)       # ascending depth
        dsel = -neg_top                                 # [TW, K]
        sel_ok = dsel < _INF

        m2 = means2d[idx]                               # [TW, K, 2]
        con = conics[idx]                               # [TW, K, 3]
        col = colors[idx]                               # [TW, K, C]
        opa = opacities[idx] * sel_ok                   # [TW, K]

        # pixel coords of this row of tiles: [TW, P]
        gx = tile_x0[:, None] + px[None, :]
        gy = tile_y0 + py[None, :]
        gy = jnp.broadcast_to(gy, gx.shape)

        dx = gx[:, None, :] - m2[..., 0:1]              # [TW, K, P]
        dy = gy[:, None, :] - m2[..., 1:2]
        sigma = (0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
                 + con[..., 1:2] * dx * dy)
        alpha = opa[..., None] * jnp.exp(-jnp.maximum(sigma, 0.0))
        alpha = jnp.minimum(alpha, ALPHA_CLAMP)
        alpha = jnp.where((alpha >= ALPHA_MIN) & (sigma >= 0.0), alpha, 0.0)

        # exclusive prefix product of (1 - alpha) along K = transmittance
        one_m = 1.0 - alpha
        trans_inc = jnp.cumprod(one_m, axis=1)          # inclusive
        # exclusive product via shift (exact, avoids divide-by-~0)
        trans_exc = jnp.concatenate(
            [jnp.ones_like(trans_inc[:, :1]), trans_inc[:, :-1]], axis=1)
        w = alpha * trans_exc                           # [TW, K, P]

        tile_color = jnp.einsum("tkp,tkc->tpc", w, col)
        tile_alpha = 1.0 - trans_inc[:, -1, :]          # [TW, P]

        # [TW, ts, ts, C] -> [ts, TW*ts, C]
        row_img = tile_color.reshape(TW, ts, ts, C).transpose(1, 0, 2, 3)
        row_img = row_img.reshape(ts, TW * ts, C)
        row_alpha = tile_alpha.reshape(TW, ts, ts).transpose(1, 0, 2)
        row_alpha = row_alpha.reshape(ts, TW * ts)
        return None, (row_img, row_alpha)

    _, (rows, alphas) = jax.lax.scan(
        jax.checkpoint(tile_row), None, jnp.arange(TH))
    img = rows.reshape(TH * ts, TW * ts, C)[:height, :width]
    acc = alphas.reshape(TH * ts, TW * ts)[:height, :width]
    return RasterOutput(colors=img, alpha=acc)
