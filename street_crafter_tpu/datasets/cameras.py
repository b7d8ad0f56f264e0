"""Camera model.

Jit-friendly analog of street_gaussian/utils/camera_utils.py:20-171: a camera
is a frozen pytree of arrays (R, T, K) plus static ints (H, W); derived
transforms are computed functionally instead of cached mutable attributes.

Conventions (matching the reference / 3DGS family):
- ``R``: camera-to-world rotation as stored by the readers (the reference
  stores R already transposed so that w2c = [R^T | T]);
- ``T``: world-to-camera translation;
- ``K``: 3x3 pixel intrinsics;
- world_view_transform here is the column-vector w2c matrix (the reference
  keeps the row-vector transpose for torch's ``@`` convention).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import maths


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    R: jax.Array          # [3,3] cam->world rotation
    T: jax.Array          # [3]   w2c translation
    K: jax.Array          # [3,3] intrinsics
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=1000.0, metadata=dict(static=True))
    # identity / bookkeeping (static, host-side)
    id: int = dataclasses.field(default=-1, metadata=dict(static=True))
    frame: int = dataclasses.field(default=-1, metadata=dict(static=True))
    cam: int = dataclasses.field(default=0, metadata=dict(static=True))
    timestamp: float = dataclasses.field(default=0.0, metadata=dict(static=True))
    image_name: str = dataclasses.field(default="", metadata=dict(static=True))

    # -- derived transforms (column-vector convention) -----------------------
    @property
    def w2c(self) -> jax.Array:
        return maths.world_to_view(jnp.transpose(self.R), self.T)

    @property
    def c2w(self) -> jax.Array:
        return maths.affine_inverse(self.w2c)

    @property
    def camera_center(self) -> jax.Array:
        return self.c2w[:3, 3]

    @property
    def projection_matrix(self) -> jax.Array:
        return maths.projection_from_K(self.K, self.height, self.width,
                                       self.znear, self.zfar)

    @property
    def full_proj_transform(self) -> jax.Array:
        return self.projection_matrix @ self.w2c

    @property
    def fov(self) -> tuple[float, float]:
        K = np.asarray(self.K)
        return maths.fov_from_K(K, self.height, self.width)

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_extrinsic(cls, ext_w2c: np.ndarray, K: np.ndarray,
                       width: int, height: int, **kw: Any) -> "Camera":
        """Build from a 4x4 world->camera matrix (set_extrinsic analog,
        camera_utils.py:68-80)."""
        ext_w2c = np.asarray(ext_w2c, np.float32)
        return cls(
            R=jnp.asarray(ext_w2c[:3, :3].T),
            T=jnp.asarray(ext_w2c[:3, 3]),
            K=jnp.asarray(np.asarray(K, np.float32)),
            width=int(width), height=int(height), **kw)

    @classmethod
    def from_c2w(cls, c2w: np.ndarray, K: np.ndarray,
                 width: int, height: int, **kw: Any) -> "Camera":
        c2w = np.asarray(c2w, np.float64)
        w2c = np.linalg.inv(c2w)
        return cls.from_extrinsic(w2c.astype(np.float32), K, width, height, **kw)

    def get_extrinsic(self) -> np.ndarray:
        return np.asarray(self.w2c)

    def rescale(self, scale: float) -> "Camera":
        """Resolution change: scales K and image dims (loadCam analog)."""
        K = np.asarray(self.K).copy()
        K[:2] *= scale
        return dataclasses.replace(
            self, K=jnp.asarray(K),
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)))
