"""Quaternion algebra (wxyz convention, real part first).

Pure-JAX counterparts of the reference's torch quaternion utilities
(street_gaussian/utils/general_utils.py:103-331) — batched, jit/vmap
friendly, differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] wxyz -> [..., 3, 3] rotation matrix (normalizes first)."""
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def from_matrix(m: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] wxyz. Branch-free (jit-safe) Shepperd method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrtp(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack([
        _sqrtp(1.0 + m00 + m11 + m22),
        _sqrtp(1.0 + m00 - m11 - m22),
        _sqrtp(1.0 - m00 + m11 - m22),
        _sqrtp(1.0 - m00 - m11 + m22),
    ], -1)

    # candidate quaternions from each diagonal branch
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1)
    cands = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], -2)  # [...,4,4]
    denom = 2.0 * jnp.maximum(q_abs, 0.1 * jnp.finfo(m.dtype).eps)
    cands = cands / denom[..., None]

    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return normalize(q)


def multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both [..., 4] wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


def invert(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array | float) -> jax.Array:
    """Spherical linear interpolation (general_utils.py:306-331 analog)."""
    q0 = normalize(q0)
    q1 = normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t)
    # fall back to lerp near theta=0 for stability
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    return normalize(w0 * q0 + w1 * q1)


def from_axis_angle(axis_angle: jax.Array) -> jax.Array:
    """SO(3) exp map: [..., 3] rotation vector -> [..., 4] wxyz."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-stable sin(half)/angle
    small = angle < 1e-6
    factor = jnp.where(small, 0.5 + angle ** 2 / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-12))
    return jnp.concatenate([jnp.cos(half), axis_angle * factor], axis=-1)


def to_axis_angle(q: jax.Array) -> jax.Array:
    """SO(3) log map: [..., 4] wxyz -> [..., 3] rotation vector."""
    q = normalize(q)
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norms, q[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < 1e-6
    factor = jnp.where(small, 2.0 + angle ** 2 / 12.0, angle / jnp.maximum(norms, 1e-12))
    return q[..., 1:] * factor
