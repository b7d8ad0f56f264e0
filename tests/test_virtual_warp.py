"""Depth-reprojection warp (ops/warp.py) vs closed-form expectations.

The reference kernel (novel_view_utils.py:308-371) has no test of its own;
these pin the semantics analytically: identity warp, pure lateral
translation over a constant-depth plane (exact for a linear texture), the
relative depth occlusion test, and frustum masking.
"""

import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.warp import (process_depth, virtual_warp_images,
                                         virtual_warp_single)

H, W = 32, 48
K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)


def _ramp_texture():
    """Texture linear in x so bilinear sampling is exact."""
    x = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    rgb = np.stack([x / W, 0.5 * x / W, 1 - x / W], -1)
    return jnp.asarray(rgb)


def test_identity_warp():
    rgb = _ramp_texture()
    depth = jnp.full((H, W), 5.0)
    eye = jnp.eye(4)
    res = virtual_warp_single(K, eye, depth, K, eye, depth, rgb)
    assert bool(res.mask.all())
    # reference normalization samples at u*(W-1)/W: a known sub-pixel
    # shrink; for the x-linear ramp the expected value is the ramp at
    # u*(W-1)/W exactly
    u = jnp.arange(W, dtype=jnp.float32) * (W - 1.0) / W
    expected_r = jnp.broadcast_to(u / W, (H, W))
    np.testing.assert_allclose(res.rgb[..., 0], expected_r, atol=1e-5)
    np.testing.assert_allclose(res.depth, depth, atol=1e-5)


def test_lateral_translation_plane():
    """Camera translated +x by t over a z=z0 plane: src pixel = tar pixel +
    fx*t/z0. Exact for the linear ramp; border columns fall off-frustum."""
    rgb = _ramp_texture()
    z0, t = 5.0, 0.5
    depth = jnp.full((H, W), z0)
    src_c2w = jnp.eye(4)
    tar_c2w = jnp.eye(4).at[0, 3].set(t)
    res = virtual_warp_single(K, tar_c2w, depth, K, src_c2w, depth, rgb)
    du = K[0, 0] * t / z0  # 4 px
    u = np.arange(W, dtype=np.float32)
    u_src = u + du
    valid_cols = u_src < W
    expected = (u_src * (W - 1.0) / W) / W
    got = np.asarray(res.rgb[..., 0])
    mask = np.asarray(res.mask)
    assert mask[:, valid_cols].all()
    assert not mask[:, ~valid_cols].any()
    np.testing.assert_allclose(
        got[:, valid_cols],
        np.broadcast_to(expected[valid_cols], (H, valid_cols.sum())),
        atol=1e-5)
    # invalid pixels are zeroed (reference :364-366)
    assert (got[:, ~valid_cols] == 0).all()


def test_occlusion_mask():
    """Source depth much closer than the reprojected depth -> occluded."""
    rgb = _ramp_texture()
    z0 = 5.0
    tar_depth = jnp.full((H, W), z0)
    src_depth = jnp.full((H, W), z0 / 2)  # |z0/2 - z0| > 0.1*z0
    eye = jnp.eye(4)
    res = virtual_warp_single(K, eye, tar_depth, K, eye, src_depth, rgb)
    assert not bool(res.mask.any())
    assert bool((res.rgb == 0).all())


def test_batched_matches_single():
    rgb = _ramp_texture()
    depth = jnp.full((H, W), 5.0)
    eye = jnp.eye(4)
    tar = jnp.stack([eye, jnp.eye(4).at[0, 3].set(0.3)])
    res_b = virtual_warp_images(
        jnp.broadcast_to(K, (2, 3, 3)), tar,
        jnp.broadcast_to(depth, (2, H, W)),
        jnp.broadcast_to(K, (2, 3, 3)), jnp.broadcast_to(eye, (2, 4, 4)),
        jnp.broadcast_to(depth, (2, H, W)),
        jnp.broadcast_to(rgb, (2, H, W, 3)))
    res_1 = virtual_warp_single(K, tar[1], depth, K, eye, depth, rgb)
    np.testing.assert_allclose(res_b.rgb[1], res_1.rgb, atol=1e-6)
    np.testing.assert_array_equal(res_b.mask[1], res_1.mask)


def test_process_depth():
    depth = jnp.array([[1.0, 2000.0], [3.0, 0.5]])
    acc = jnp.array([[1.0, 1.0], [0.0, 0.5]])
    out = process_depth(depth, acc)
    np.testing.assert_allclose(
        np.asarray(out), [[1.0, 900.0], [903.0, 450.5]])
