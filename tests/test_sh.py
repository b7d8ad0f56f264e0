import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops import sh as SH


def _ref_eval_sh(deg, sh, dirs):
    """Direct transcription of the polynomial form for oracle checking."""
    result = SH.C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        x, y, z = x[..., 0], y[..., 0], z[..., 0]
        result = result - SH.C1 * y * sh[..., 1] + SH.C1 * z * sh[..., 2] - SH.C1 * x * sh[..., 3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + SH.C2[0] * xy * sh[..., 4] + SH.C2[1] * yz * sh[..., 5]
                      + SH.C2[2] * (2 * zz - xx - yy) * sh[..., 6]
                      + SH.C2[3] * xz * sh[..., 7] + SH.C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result + SH.C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + SH.C3[1] * xy * z * sh[..., 10]
                          + SH.C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + SH.C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + SH.C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + SH.C3[5] * z * (xx - yy) * sh[..., 14]
                          + SH.C3[6] * x * (xx - 3 * yy) * sh[..., 15])
    return result


def test_eval_sh_matches_polynomial(rng):
    for deg in range(4):
        k = (deg + 1) ** 2
        shc = rng.normal(size=(100, 3, 16)).astype(np.float32)
        dirs = rng.normal(size=(100, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = np.asarray(SH.eval_sh(deg, jnp.asarray(shc), jnp.asarray(dirs)))
        # oracle operates per-channel
        want = np.stack([_ref_eval_sh(deg, shc[:, c, :k], dirs) for c in range(3)], -1)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_eval_sh_columns_matches_einsum(rng):
    # the render hot path's lane-parallel formulation (eval_sh_columns on
    # [N, K, C]) must be bit-close to the einsum form
    for deg in range(5):
        shs = rng.normal(size=(64, 25, 3)).astype(np.float32)
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        a = np.asarray(SH.eval_sh(
            deg, jnp.swapaxes(jnp.asarray(shs), -1, -2), jnp.asarray(dirs)))
        b = np.asarray(SH.eval_sh_columns(deg, jnp.asarray(shs),
                                          jnp.asarray(dirs)))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_deg0_is_dc_only(rng):
    shc = rng.normal(size=(10, 3, 16)).astype(np.float32)
    dirs = np.tile(np.array([0, 0, 1.0], np.float32), (10, 1))
    got = np.asarray(SH.eval_sh(0, jnp.asarray(shc), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, SH.C0 * shc[..., 0], atol=1e-6)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(size=(32, 3)).astype(np.float32)
    back = np.asarray(SH.sh_to_rgb(SH.rgb_to_sh(jnp.asarray(rgb))))
    np.testing.assert_allclose(rgb, back, atol=1e-6)


def test_idft_basis():
    # matches sh_utils.py:121-130 semantics
    t = np.array([0.0, 0.25, 0.5], np.float32)
    basis = np.asarray(SH.idft_basis(jnp.asarray(t), 4))
    for ti, row in zip(t, basis):
        expect = np.array([
            np.cos(np.pi * ti * 0), np.sin(np.pi * ti * 2),
            np.cos(np.pi * ti * 2), np.sin(np.pi * ti * 4),
        ], np.float32)
        np.testing.assert_allclose(row, expect, atol=1e-6)


def test_integral_orthonormality(rng):
    # Monte-Carlo check: the basis is orthonormal over the sphere.
    n = 200000
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    b = np.asarray(SH.sh_basis(2, jnp.asarray(v)))  # [n, 9]
    gram = (b.T @ b) / n * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.08)
