import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.point_raster import (
    render_pointcloud, splat_points, ndc_radius_px,
)


def brute_force_splat(points_cam, colors, radii_px, K, H, W, znear=0.2):
    """O(N*H*W) oracle: nearest covering point per pixel."""
    rgb = np.zeros((H, W, 3), np.float32)
    depth = np.full((H, W), np.inf, np.float32)
    for p, c, r in zip(points_cam, colors, radii_px):
        if p[2] <= znear:
            continue
        u = K[0, 0] * p[0] / p[2] + K[0, 2]
        v = K[1, 1] * p[1] / p[2] + K[1, 2]
        for iy in range(H):
            for ix in range(W):
                d2 = (ix + 0.5 - u) ** 2 + (iy + 0.5 - v) ** 2
                if d2 <= r * r and p[2] < depth[iy, ix]:
                    depth[iy, ix] = p[2]
                    rgb[iy, ix] = c
    acc = (depth < np.inf).astype(np.float32)
    depth[depth == np.inf] = 0.0
    return rgb, acc, depth


def test_matches_bruteforce_small_scene(rng):
    H, W = 24, 32
    K = np.array([[20.0, 0, 16], [0, 20.0, 12], [0, 0, 1]], np.float32)
    n = 40
    pts = np.stack([
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.8, 0.8, n),
        rng.uniform(0.5, 5.0, n)], -1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    radii = rng.uniform(0.5, 3.0, n).astype(np.float32)

    out = splat_points(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(radii),
                       jnp.asarray(K), H, W, max_radius_px=4)
    rgb_ref, acc_ref, depth_ref = brute_force_splat(pts, cols, radii, K, H, W)

    np.testing.assert_allclose(np.asarray(out.acc), acc_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=1e-5)


def test_nearest_wins():
    H, W = 16, 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    # two points projecting to the same pixel, different depth
    pts = np.array([[0, 0, 2.0], [0, 0, 1.0]], np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    radii = np.array([2.0, 2.0], np.float32)
    out = splat_points(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(radii),
                       jnp.asarray(K), H, W, max_radius_px=3)
    center = np.asarray(out.rgb)[8, 8]
    np.testing.assert_allclose(center, [0, 1, 0], atol=1e-6)
    assert float(out.depth[8, 8]) == 1.0


def test_mask_excludes_points():
    H, W = 8, 8
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, 1.0]], np.float32)
    cols = np.ones((1, 3), np.float32)
    radii = np.array([1.5], np.float32)
    out = splat_points(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(radii),
                       jnp.asarray(K), H, W,
                       mask=jnp.zeros(1, bool), max_radius_px=2)
    assert float(out.acc.sum()) == 0.0


def test_behind_camera_culled():
    H, W = 8, 8
    K = np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]], np.float32)
    pts = np.array([[0, 0, -1.0]], np.float32)
    out = splat_points(jnp.asarray(pts), jnp.ones((1, 3)), jnp.array([2.0]),
                       jnp.asarray(K), H, W, max_radius_px=2)
    assert float(out.acc.sum()) == 0.0


def test_world_space_api_ndc_scale():
    H, W = 32, 48
    K = np.array([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    pts = np.array([[0.0, 0.0, 3.0]], np.float32)
    cols = np.array([[0.2, 0.4, 0.6]], np.float32)
    out = render_pointcloud(jnp.asarray(c2w), jnp.asarray(K), jnp.asarray(pts),
                            jnp.asarray(cols), H, W, scale=0.1,
                            use_ndc_scale=True)
    # radius = 0.1 * 0.5 * 32 = 1.6 px around pixel (24, 16)
    r = ndc_radius_px(0.1, H, W)
    assert abs(r - 1.6) < 1e-6
    acc = np.asarray(out.acc)
    area = acc.sum()
    assert 4 <= area <= 13  # disk of radius 1.6 px
    np.testing.assert_allclose(np.asarray(out.rgb)[16, 24], [0.2, 0.4, 0.6],
                               atol=1e-6)
    # depth equals camera-space z
    assert abs(float(out.depth[16, 24]) - 3.0) < 1e-5


def test_camera_transform_applied():
    H, W = 16, 16
    K = np.array([[16.0, 0, 8], [0, 16.0, 8], [0, 0, 1]], np.float32)
    # camera at (0,0,-2) looking +z: point at origin is 2m ahead
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -2.0
    out = render_pointcloud(jnp.asarray(c2w), jnp.asarray(K),
                            jnp.zeros((1, 3)), jnp.ones((1, 3)), H, W,
                            scale=0.2, use_ndc_scale=True)
    assert abs(float(out.depth[8, 8]) - 2.0) < 1e-5
