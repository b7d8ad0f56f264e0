"""Differentiable cubemap texture sampling.

Pure-JAX replacement for nvdiffrast's ``dr.texture`` cube-mode lookup used by
the optimizable sky (street_gaussian/models/sky_cubemap.py:79-127), plus the
cubemap -> latlong export (sky_cubemap.py:192-205).

Face convention matches the standard GL cube map (and nvdiffrast):
  0:+x 1:-x 2:+y 3:-y 4:+z 5:-z
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _face_uv(dirs: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[..., 3] unit (or not) directions -> (face idx, u, v) in [0, 1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    # remaining is z major

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)))

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)

    # GL cube map face (s, t) conventions
    sc = jnp.where(
        is_x, jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(
        is_x, -y,
        jnp.where(is_y, jnp.where(y > 0, z, -z), -y))

    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, u, v


def sample_cubemap(cubemap: jax.Array, dirs: jax.Array) -> jax.Array:
    """Bilinear cubemap lookup.

    Args:
        cubemap: [6, R, R, C]
        dirs: [..., 3] view directions (need not be normalized)
    Returns:
        [..., C]
    """
    face, u, v = _face_uv(dirs)
    R = cubemap.shape[1]
    fu = u * R - 0.5
    fv = v * R - 0.5
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    wx = fu - x0
    wy = fv - y0

    def gather(ix, iy):
        ix = jnp.clip(ix.astype(jnp.int32), 0, R - 1)
        iy = jnp.clip(iy.astype(jnp.int32), 0, R - 1)
        return cubemap[face, iy, ix]

    c00 = gather(x0, y0)
    c10 = gather(x0 + 1, y0)
    c01 = gather(x0, y0 + 1)
    c11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wx) * (1 - wy) * c00 + wx * (1 - wy) * c10
            + (1 - wx) * wy * c01 + wx * wy * c11)


def latlong_from_cubemap(cubemap: jax.Array, H: int, W: int) -> jax.Array:
    """Equirectangular export (sky_cubemap.py:192-205 analog)."""
    gy, gx = jnp.meshgrid(
        (jnp.arange(H) + 0.5) / H, (jnp.arange(W) + 0.5) / W, indexing="ij")
    theta = (gy - 0.5) * jnp.pi          # [-pi/2, pi/2]
    phi = (gx - 0.5) * 2 * jnp.pi        # [-pi, pi]
    dirs = jnp.stack([
        jnp.cos(theta) * jnp.sin(phi),
        jnp.sin(theta),
        jnp.cos(theta) * jnp.cos(phi)], -1)
    return sample_cubemap(cubemap, dirs)
