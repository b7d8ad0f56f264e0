import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops import maths as M
from street_crafter_tpu.ops import quaternion as Q


def test_affine_inverse(rng):
    q = rng.normal(size=(4,)).astype(np.float32)
    R = np.asarray(Q.to_matrix(jnp.asarray(q[None])))[0]
    t = rng.normal(size=(3,)).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R
    m[:3, 3] = t
    inv = np.asarray(M.affine_inverse(jnp.asarray(m)))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-5)


def test_projection_matrix_maps_corners():
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    H, W = 480, 640
    P = M.projection_from_K(K, H, W, znear=0.1, zfar=100.0)
    # a point along the principal axis projects to NDC (cx-ish, cy-ish)
    pt = jnp.array([0.0, 0.0, 10.0, 1.0])
    ndc = P @ pt
    ndc = ndc / ndc[3]
    np.testing.assert_allclose(ndc[0], -1 + 2 * 320 / 640, atol=1e-5)
    np.testing.assert_allclose(ndc[1], -1 + 2 * 240 / 480, atol=1e-5)
    # point at image corner: x_cam = (0 - cx)/fx * z
    z = 5.0
    pt = jnp.array([(0 - 320) / 500 * z, (0 - 240) / 500 * z, z, 1.0])
    ndc = P @ pt
    ndc = ndc / ndc[3]
    np.testing.assert_allclose(ndc[:2], [-1.0, -1.0], atol=1e-5)


def test_project_points_pixel_center():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    w2c = jnp.eye(4)
    uv, depth = M.project_points(K, w2c, jnp.array([[0.0, 0.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(uv), [[50.0, 40.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), [2.0], atol=1e-6)


def test_get_rays_center_pixel():
    K = jnp.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    c2w = jnp.eye(4)
    origins, dirs = M.get_rays(K, c2w, 80, 100)
    # pixel at the principal point looks straight down +z
    d = np.asarray(dirs[39, 49])  # pixel centers offset by 0.5
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(d, [0.0, 0.0, 1.0], atol=1e-2)
    np.testing.assert_allclose(np.asarray(origins[0, 0]), [0, 0, 0], atol=1e-6)


def test_ray_sphere_intersection():
    origins = jnp.zeros((5, 3))
    dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
    t = M.ray_sphere_intersection(origins, dirs, jnp.zeros(3), 3.0)
    np.testing.assert_allclose(np.asarray(t), 3.0, atol=1e-5)


def test_expon_lr_schedule():
    lr0 = float(M.expon_lr(0, 1e-3, 1e-5, max_steps=1000))
    lr_end = float(M.expon_lr(1000, 1e-3, 1e-5, max_steps=1000))
    lr_mid = float(M.expon_lr(500, 1e-3, 1e-5, max_steps=1000))
    np.testing.assert_allclose(lr0, 1e-3, rtol=1e-4)
    np.testing.assert_allclose(lr_end, 1e-5, rtol=1e-4)
    np.testing.assert_allclose(lr_mid, 1e-4, rtol=1e-4)  # geometric midpoint
