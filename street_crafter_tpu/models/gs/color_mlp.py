"""Pose-conditioned color-correction MLP (the reference's ``use_mlp`` mode).

street_gaussian/models/color_correction.py:30-58,117-127: a 4-layer MLP
(6 -> 64 -> 64 -> 64 -> 12, last layer zero-init) maps the camera extrinsic
— rotation as axis-angle [3] plus translation [3] — to a residual 3x4
affine added to identity. A second MLP serves the sky set.

Params are a flat name->array dict so the scene trainer's per-name Adam
(models/gs/optim.py) and misc-lr table apply directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import quaternion as Q

_DIMS = (6, 64, 64, 64, 12)


def init_color_mlp(key: jax.Array) -> dict[str, jax.Array]:
    params = {}
    for i in range(len(_DIMS) - 1):
        fan_in, fan_out = _DIMS[i], _DIMS[i + 1]
        key, sub = jax.random.split(key)
        if i == len(_DIMS) - 2:   # zero-init output (reference :41-42)
            w = jnp.zeros((fan_in, fan_out), jnp.float32)
        else:
            bound = (6.0 / (fan_in + fan_out)) ** 0.5
            w = jax.random.uniform(sub, (fan_in, fan_out), jnp.float32,
                                   -bound, bound)
        params[f"w{i}"] = w
        params[f"b{i}"] = jnp.zeros((fan_out,), jnp.float32)
    return params


def apply_color_mlp(params: dict[str, jax.Array], w2c: jax.Array
                    ) -> jax.Array:
    """w2c [4,4] -> affine [3, 4] (identity + MLP residual)."""
    aa = Q.to_axis_angle(Q.from_matrix(w2c[:3, :3]))
    x = jnp.concatenate([aa, w2c[:3, 3]])
    n = len(_DIMS) - 1
    for i in range(n):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n - 1:
            x = jax.nn.relu(x)
    eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    return x.reshape(3, 4) + eye
