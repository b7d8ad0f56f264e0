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
    """Column (structure-of-arrays) layout: every field is [N]. Narrow
    [N, 2..4] arrays waste 125/128 TPU vector lanes per op, so the hot path
    never materializes them; ``means2d`` / ``conics`` properties stack on
    demand for tests/debugging."""
    u: jax.Array              # [N] pixel x
    v: jax.Array              # [N] pixel y
    depths: jax.Array         # [N] camera-space z
    conic_a: jax.Array        # [N] inverse 2D covariance (a, b, c)
    conic_b: jax.Array
    conic_c: jax.Array
    radii: jax.Array          # [N] screen-space extent in pixels (0 = culled)
    compensations: jax.Array  # [N] antialiasing opacity compensation
    valid: jax.Array          # [N] bool

    @property
    def means2d(self) -> jax.Array:
        return jnp.stack([self.u, self.v], -1)

    @property
    def conics(self) -> jax.Array:
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], -1)


def quat_scale_to_covar(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """[N,4] wxyz + [N,3] scales -> [N,3,3] world covariance R S S^T R^T."""
    R = Q.to_matrix(quats)
    M = R * scales[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def _covar_cam_scalar(quats: jax.Array, scales: jax.Array, Rcw: jax.Array):
    """Camera-frame covariance entries as six [N] columns.

    TPU-layout note: batched [N,3,3] matmuls waste 125/128 vector lanes and
    hit the MXU with pathological padding; expanding the 3x3 algebra into
    scalar x [N]-column FMAs keeps every op fully lane-parallel (this is the
    projection hot path: ~10ms -> <1ms at N=200k).
    """
    q = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation matrix entries (wxyz convention), each [N]
    r = [
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ]
    s2 = [scales[..., 0] ** 2, scales[..., 1] ** 2, scales[..., 2] ** 2]

    # world covariance S[i][k] = sum_j R[i,j] R[k,j] s_j^2 (6 unique entries)
    def S(i, k):
        return (r[3 * i] * r[3 * k] * s2[0]
                + r[3 * i + 1] * r[3 * k + 1] * s2[1]
                + r[3 * i + 2] * r[3 * k + 2] * s2[2])

    Sw = [[S(0, 0), S(0, 1), S(0, 2)],
          [None, S(1, 1), S(1, 2)],
          [None, None, S(2, 2)]]

    def Sij(i, j):
        return Sw[i][j] if j >= i else Sw[j][i]

    # camera covariance C[a][b] = sum_ij Rcw[a,i] Rcw[b,j] S[i,j]
    def C(a, b):
        acc = 0.0
        for i in range(3):
            for j in range(3):
                acc = acc + Rcw[a, i] * Rcw[b, j] * Sij(i, j)
        return acc

    return C(0, 0), C(0, 1), C(0, 2), C(1, 1), C(1, 2), C(2, 2)


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

    # camera-space means (scalar-expanded: [N,3]@[3,3] would MXU-pad 3->128)
    mx, my, mz = means[..., 0], means[..., 1], means[..., 2]
    x = Rcw[0, 0] * mx + Rcw[0, 1] * my + Rcw[0, 2] * mz + tcw[0]
    y = Rcw[1, 0] * mx + Rcw[1, 1] * my + Rcw[1, 2] * mz + tcw[1]
    z = Rcw[2, 0] * mx + Rcw[2, 1] * my + Rcw[2, 2] * mz + tcw[2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)

    # world covariance -> camera covariance (scalar-expanded, lane-parallel)
    c00, c01, c02, c11, c12, c22 = _covar_cam_scalar(
        quats.astype(f32), scales.astype(f32), Rcw)

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

    # screen extent: 3 sigma of the larger eigenvalue
    b = 0.5 * (bxx + byy)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det, 0.01))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy

    valid = (z > near_plane) & (z < far_plane) & (det > 0.0)
    valid &= (radius > radius_clip)
    # cull gaussians whose extent misses the image entirely
    valid &= (u + radius > 0) & (u - radius < width)
    valid &= (v + radius > 0) & (v - radius < height)
    if mask is not None:
        valid &= mask

    radii = jnp.where(valid, radius, 0.0)
    return Projection(
        u=u, v=v,
        depths=z,
        conic_a=byy * inv_det,
        conic_b=-sxy * inv_det,
        conic_c=bxx * inv_det,
        radii=radii,
        compensations=jnp.where(valid, compensations, 0.0),
        valid=valid,
    )
