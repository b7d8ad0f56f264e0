"""Gaussian parameter pools.

The reference holds each sub-model's Gaussians in resizable torch Parameters
with optimizer-state surgery on every densify/prune
(gaussian_model.py:344-551). XLA wants static shapes, so a pool here is a
*fixed-capacity structure-of-arrays with a validity mask*: densify writes
children into free slots, prune clears the mask, and nothing ever changes
shape (no re-JIT). Capacity growth is a host-side re-allocation (rare).

Raw (pre-activation) parameterization matches the reference:
  scaling = log(sigma), opacity = logit(alpha), rotation = unnormalized wxyz,
  features split into DC (possibly Fourier-time-varying, [cap, F, 3]) and
  rest ([cap, K-1, 3]) SH coefficients.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import sh as SH
from ...ops.knn import mean_dist2_knn3


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianPool:
    xyz: jax.Array           # [cap, 3]
    features_dc: jax.Array   # [cap, F, 3] Fourier DC coefficients (F=1: plain DC)
    features_rest: jax.Array  # [cap, K-1, 3]
    scaling: jax.Array       # [cap, 3] log-scale
    rotation: jax.Array      # [cap, 4] unnormalized wxyz
    opacity: jax.Array       # [cap, 1] logit
    valid: jax.Array         # [cap] bool — NOT a trainable leaf; masked in use

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_sh_rest(self) -> int:
        return self.features_rest.shape[1]

    @property
    def fourier_dim(self) -> int:
        return self.features_dc.shape[1]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.valid)

    # activations (gaussian_model.py:208-223)
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jax.Array:
        return self.rotation / jnp.maximum(
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True), 1e-12)

    def get_features_dc(self, time: jax.Array | float = 0.0) -> jax.Array:
        """[cap, 1, 3]; Fourier IDFT combination when F > 1
        (gaussian_model_actor.py:67-76)."""
        F = self.fourier_dim
        if F == 1:
            return self.features_dc
        basis = SH.idft_basis(jnp.asarray(time, jnp.float32), F)  # [F]
        basis = basis.reshape(-1)
        return jnp.einsum("nfc,f->nc", self.features_dc, basis)[:, None, :]

    def get_features(self, time: jax.Array | float = 0.0) -> jax.Array:
        """[cap, K, 3] full SH coefficient stack."""
        return jnp.concatenate([self.get_features_dc(time), self.features_rest], axis=1)

    def trainable_dict(self) -> dict[str, jax.Array]:
        return {
            "xyz": self.xyz, "f_dc": self.features_dc,
            "f_rest": self.features_rest, "scaling": self.scaling,
            "rotation": self.rotation, "opacity": self.opacity,
        }

    def replace(self, **kw) -> "GaussianPool":
        return dataclasses.replace(self, **kw)


def empty_pool(capacity: int, sh_degree: int = 3, fourier_dim: int = 1) -> GaussianPool:
    k = (sh_degree + 1) ** 2
    return GaussianPool(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, fourier_dim, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
        rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
        valid=jnp.zeros((capacity,), bool),
    )


def init_pool_from_points(
    points: np.ndarray,            # [N, 3]
    colors: np.ndarray,            # [N, 3] in [0, 1]
    capacity: int,
    sh_degree: int = 3,
    fourier_dim: int = 1,
    init_opacity: float = 0.1,
    fixed_scale: float | None = None,
) -> GaussianPool:
    """create_from_pcd analog (gaussian_model.py:55-80): KNN-based initial
    scales (log sqrt mean dist^2 to 3 NN), identity rotations, 0.1 opacity,
    DC features from RGB2SH."""
    n = min(len(points), capacity)
    if len(points) > capacity:
        sel = np.random.default_rng(0).choice(len(points), capacity, replace=False)
        points = points[sel]
        colors = colors[sel]
    pool = empty_pool(capacity, sh_degree, fourier_dim)

    pts = jnp.asarray(np.asarray(points[:n], np.float32))
    if fixed_scale is not None:
        scales = jnp.full((n, 3), float(np.log(fixed_scale)), jnp.float32)
    else:
        d2 = mean_dist2_knn3(pts)
        scales = jnp.broadcast_to(jnp.log(jnp.sqrt(d2))[:, None], (n, 3))

    dc = SH.rgb_to_sh(jnp.asarray(np.asarray(colors[:n, :3], np.float32)))
    f_dc = jnp.zeros((n, fourier_dim, 3), jnp.float32)
    f_dc = f_dc.at[:, 0, :].set(dc)  # higher Fourier terms start at zero

    return pool.replace(
        xyz=pool.xyz.at[:n].set(pts),
        features_dc=pool.features_dc.at[:n].set(f_dc),
        scaling=pool.scaling.at[:n].set(scales),
        opacity=pool.opacity.at[:n].set(
            float(np.log(init_opacity / (1 - init_opacity)))),
        valid=pool.valid.at[:n].set(True),
    )
