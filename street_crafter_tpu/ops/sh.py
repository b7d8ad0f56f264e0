"""Spherical harmonics evaluation (degrees 0..4) + RGB<->SH + IDFT.

JAX analog of street_gaussian/utils/sh_utils.py:58-130 (same hardcoded real
SH basis used by the 3DGS family). The per-Gaussian color path
``eval_sh(deg, shs[..., C, K], dirs)`` is a small einsum-friendly contraction
that XLA fuses into the projection pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis(deg: int, dirs: jax.Array) -> jax.Array:
    """Real SH basis values at unit directions: [..., 3] -> [..., (deg+1)^2]."""
    return jnp.stack(_sh_basis_cols(deg, dirs), axis=-1)


def _sh_basis_cols(deg: int, dirs: jax.Array) -> list:
    """Basis values as a list of (deg+1)^2 [...]-shaped columns (the
    lane-parallel form; ``sh_basis`` stacks them)."""
    if not 0 <= deg <= 4:
        raise ValueError(f"sh degree {deg} unsupported (0..4)")
    one = jnp.ones_like(dirs[..., 0])
    out = [C0 * one]
    if deg > 0:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        out += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            out += [
                C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy),
            ]
            if deg > 2:
                out += [
                    C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy), C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    out += [
                        C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return out


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH colors.

    Args:
        deg: active degree (0..4); trailing coefficients beyond (deg+1)^2 are
          ignored (reference semantics, sh_utils.py:70-73).
        sh: [..., C, K] coefficients with K >= (deg+1)^2.
        dirs: [..., 3] unit directions.
    Returns:
        [..., C]
    """
    k = (deg + 1) ** 2
    basis = sh_basis(deg, dirs)  # [..., k]
    return jnp.einsum("...ck,...k->...c", sh[..., :k], basis)


def eval_sh_columns(deg: int, sh_nkc: jax.Array, dirs: jax.Array) -> jax.Array:
    """Column-layout SH evaluation ([N, K, C] coefficients, no transpose).

    Measured SLOWER than ``eval_sh`` on v5e at the render hot-path shape
    (4.20 vs 3.22 ms at N=600k, deg 3): the (deg+1)^2 * C strided [N]
    coefficient slices cost more than the einsum's narrow-lane contraction,
    which XLA vectorizes well despite the [N, C, K] layout. Kept as the
    measured negative result (scripts/bench_render_tuning.py) — do not
    re-apply to the renderer. Identical math to ``eval_sh`` with
    ``sh = swapaxes(sh_nkc, -1, -2)``.

    Args:
        sh_nkc: [N, K, C] coefficients (the GaussianPool feature layout).
        dirs: [N, 3] unit directions.
    Returns:
        [N, C]
    """
    k = (deg + 1) ** 2
    basis = _sh_basis_cols(deg, dirs)  # k columns of [N]
    C = sh_nkc.shape[-1]
    cols = [
        sum(basis[j] * sh_nkc[:, j, c] for j in range(k))
        for c in range(C)
    ]
    return jnp.stack(cols, axis=-1)


def rgb_to_sh(rgb: jax.Array) -> jax.Array:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jax.Array) -> jax.Array:
    return sh * C0 + 0.5


def idft_basis(time: jax.Array, dim: int) -> jax.Array:
    """Inverse-DFT time basis for Fourier-varying features.

    Matches sh_utils.py:121-130: even slots cos(pi*t*i), odd slots
    sin(pi*t*(i+1)). time: [...,] -> [..., dim].
    """
    t = jnp.asarray(time, jnp.float32)[..., None]
    idx = jnp.arange(dim)
    even = (idx % 2) == 0
    cos_part = jnp.cos(jnp.pi * t * idx)
    sin_part = jnp.sin(jnp.pi * t * (idx + 1))
    return jnp.where(even, cos_part, sin_part)
