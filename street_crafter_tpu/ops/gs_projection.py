"""3D Gaussian -> 2D screen-space projection (EWA splatting math).

TPU-native analog of gsplat's ``fully_fused_projection`` as used by the
reference renderer (street_gaussian_renderer.py:219-241): quaternion+scale ->
world covariance, camera transform, perspective Jacobian with frustum-clamped
linearization (the 1.3x tan-FoV guard of the INRIA rasterizer), 2D covariance
with 0.3-pixel low-pass blur, optional antialiasing compensation
(sqrt(det_orig / det_blurred), multiplied into opacity downstream), conic,
radius, and validity culling.

Everything is smooth vectorized XLA math — differentiable by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import quaternion as Q

EPS2D = 0.3  # screen-space low-pass filter (same constant as INRIA/gsplat)


class Projection(NamedTuple):
    means2d: jax.Array        # [N, 2] pixel coords
    depths: jax.Array         # [N] camera-space z
    conics: jax.Array         # [N, 3] upper-tri inverse 2D covariance (a, b, c)
    radii: jax.Array          # [N] screen-space extent in pixels (0 = culled)
    compensations: jax.Array  # [N] antialiasing opacity compensation
    valid: jax.Array          # [N] bool


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """[N,4] wxyz + [N,3] scales -> [N,3,3] world covariance R S S^T R^T."""
    R = Q.to_matrix(quats)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means: jax.Array,       # [N, 3] world
    quats: jax.Array,       # [N, 4] wxyz
    scales: jax.Array,      # [N, 3] (post-activation, i.e. exp(log_scale))
    w2c: jax.Array,         # [4, 4]
    K: jax.Array,           # [3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    antialiasing: bool = True,
    mask: jax.Array | None = None,
    radius_clip: float = 0.0,
) -> Projection:
    f32 = jnp.float32
    means = means.astype(f32)
    Rcw = w2c[:3, :3].astype(f32)
    tcw = w2c[:3, 3].astype(f32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # camera-space means
    p = means @ Rcw.T + tcw
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)

    # world covariance -> camera covariance
    covar = quat_scale_to_covar(quats.astype(f32), scales.astype(f32))
    covar_c = jnp.einsum("ij,njk,lk->nil", Rcw, covar, Rcw)

    # frustum-clamped perspective Jacobian (INRIA: clamp x/z to 1.3*tan_fov)
    tan_fovx = 0.5 * width / fx
    tan_fovy = 0.5 * height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tx = jnp.clip(x / zs, -lim_x, lim_x) * zs
    ty = jnp.clip(y / zs, -lim_y, lim_y) * zs
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # J = [[fx/z, 0, -fx*tx/z^2], [0, fy/z, -fy*ty/z^2]]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    c00, c01, c02 = covar_c[..., 0, 0], covar_c[..., 0, 1], covar_c[..., 0, 2]
    c11, c12, c22 = covar_c[..., 1, 1], covar_c[..., 1, 2], covar_c[..., 2, 2]
    # cov2d = J Sigma_c J^T (2x2 symmetric)
    sxx = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22)
    sxy = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    syy = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22)

    det_orig = sxx * syy - sxy * sxy
    bxx = sxx + EPS2D
    byy = syy + EPS2D
    det = bxx * byy - sxy * sxy
    det_safe = jnp.where(det == 0.0, 1e-10, det)

    if antialiasing:
        compensations = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))
    else:
        compensations = jnp.ones_like(det)

    inv_det = 1.0 / det_safe
    conics = jnp.stack([byy * inv_det, -sxy * inv_det, bxx * inv_det], -1)

    # screen extent: 3 sigma of the larger eigenvalue
    b = 0.5 * (bxx + byy)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    means2d = jnp.stack([u, v], -1)

    valid = (z > near_plane) & (z < far_plane) & (det > 0.0)
    valid &= (radius > radius_clip)
    # cull gaussians whose extent misses the image entirely
    valid &= (u + radius > 0) & (u - radius < width)
    valid &= (v + radius > 0) & (v - radius < height)
    if mask is not None:
        valid &= mask

    radii = jnp.where(valid, radius, 0.0)
    return Projection(
        means2d=means2d,
        depths=z,
        conics=conics,
        radii=radii,
        compensations=jnp.where(valid, compensations, 0.0),
        valid=valid,
    )
