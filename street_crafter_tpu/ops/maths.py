"""Transform / camera math helpers.

Counterparts of street_gaussian/utils/graphics_utils.py (world-view and
OpenGL-style projection matrices built from intrinsics K) and the small
geometry helpers used across the pipeline (rays, sphere intersection,
numpy-side projections).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: jax.Array, T: jax.Array) -> jax.Array:
    """4x4 world->camera. R is w2c rotation (row-major), T is w2c translation
    — the 3DGS convention: x_cam = R @ x_world + T (graphics_utils.py:56-66
    stores the transpose for torch's row-vector convention; we keep column
    convention and transpose at the boundary if needed)."""
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(R)
    m = m.at[:3, 3].set(T)
    return m


def projection_from_K(K: jax.Array, H: int, W: int,
                      znear: float = 0.01, zfar: float = 100.0) -> jax.Array:
    """OpenGL-style (z in [0,1]) projection from pixel intrinsics.

    Mirrors getProjectionMatrixK (graphics_utils.py:78-101): NDC x,y in
    [-1,1] with the principal-point offset, z mapped via (f+n)/(f-n)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(2 * fx / W)
    P = P.at[0, 1].set(2 * s / W)
    P = P.at[0, 2].set(-1 + 2 * (cx / W))
    P = P.at[1, 1].set(2 * fy / H)
    P = P.at[1, 2].set(-1 + 2 * (cy / H))
    P = P.at[2, 2].set((zfar + znear) / (zfar - znear))
    P = P.at[2, 3].set(-2 * zfar * znear / (zfar - znear))
    P = P.at[3, 2].set(1.0)
    return P


def fov_from_K(K: np.ndarray, H: int, W: int) -> tuple[float, float]:
    """(FoVx, FoVy) from pixel intrinsics."""
    fovx = 2 * np.arctan(W / (2 * K[0, 0]))
    fovy = 2 * np.arctan(H / (2 * K[1, 1]))
    return float(fovx), float(fovy)


def affine_inverse(m: jax.Array) -> jax.Array:
    """Invert a [...,4,4] rigid/affine transform with orthonormal rotation."""
    R = m[..., :3, :3]
    t = m[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], m.dtype), m.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply [4,4] (or batched) transform to [..., 3] points."""
    return pts @ jnp.swapaxes(m[..., :3, :3], -1, -2) + m[..., :3, 3]


def project_points(K: jax.Array, w2c: jax.Array, pts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """World points -> (pixel uv [...,2], camera-space depth [...])."""
    cam = transform_points(w2c, pts)
    depth = cam[..., 2]
    uv = cam[..., :2] / jnp.maximum(jnp.abs(depth[..., None]), 1e-8) * jnp.sign(depth[..., None])
    u = K[0, 0] * uv[..., 0] + K[0, 1] * uv[..., 1] + K[0, 2]
    v = K[1, 1] * uv[..., 1] + K[1, 2]
    return jnp.stack([u, v], -1), depth


def get_rays(K: jax.Array, c2w: jax.Array, H: int, W: int) -> tuple[jax.Array, jax.Array]:
    """Per-pixel world-space rays: returns (origins [H,W,3], dirs [H,W,3])."""
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    x = (i + 0.5 - K[0, 2]) / K[0, 0]
    y = (j + 0.5 - K[1, 2]) / K[1, 1]
    dirs_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
    dirs = dirs_cam @ c2w[:3, :3].T
    origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins, dirs


def ray_sphere_intersection(origins: jax.Array, dirs: jax.Array,
                            center: jax.Array, radius: float) -> jax.Array:
    """Far intersection distance t of rays with a sphere (assumes origins
    inside the sphere, as in the sky-point sampling use,
    waymo_processor.py:126-176)."""
    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    oc = origins - center
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


def expon_lr(step: jax.Array, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1000000) -> jax.Array:
    """Log-linear LR interpolation with optional delayed warmup — the 3DGS
    position LR schedule (general_utils.py:51-85)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init <= 0.0 and lr_final <= 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(max(lr_init, 1e-12)) * (1 - t)
                       + jnp.log(max(lr_final, 1e-12)) * t)
    return delay_rate * log_lerp
