import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.datasets import Camera


def make_camera():
    # camera 2m behind origin looking +z, slight rotation about y
    theta = 0.1
    Rc2w = np.array([
        [np.cos(theta), 0, np.sin(theta)],
        [0, 1, 0],
        [-np.sin(theta), 0, np.cos(theta)]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = Rc2w
    c2w[:3, 3] = [0.5, -0.2, -2.0]
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32)
    return Camera.from_c2w(c2w, K, 128, 96), c2w, K


def test_extrinsic_roundtrip():
    cam, c2w, _ = make_camera()
    np.testing.assert_allclose(np.asarray(cam.c2w), c2w, atol=1e-5)
    np.testing.assert_allclose(cam.get_extrinsic() @ c2w, np.eye(4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.camera_center), c2w[:3, 3], atol=1e-5)


def test_full_proj_maps_world_point():
    cam, c2w, K = make_camera()
    # a point 3m in front of the camera along its optical axis
    p_cam = np.array([0.3, 0.1, 3.0, 1.0], np.float32)
    p_world = c2w @ p_cam
    ndc = np.asarray(cam.full_proj_transform @ jnp.asarray(p_world))
    ndc = ndc / ndc[3]
    # expected pixel from intrinsics
    u = K[0, 0] * p_cam[0] / p_cam[2] + K[0, 2]
    v = K[1, 1] * p_cam[1] / p_cam[2] + K[1, 2]
    np.testing.assert_allclose(ndc[0], 2 * u / 128 - 1, atol=1e-4)
    np.testing.assert_allclose(ndc[1], 2 * v / 96 - 1, atol=1e-4)


def test_camera_is_pytree():
    cam, _, _ = make_camera()
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) == 3  # R, T, K

    @jax.jit
    def center(c: Camera):
        return c.camera_center

    np.testing.assert_allclose(np.asarray(center(cam)),
                               np.asarray(cam.camera_center), atol=1e-6)


def test_rescale():
    cam, _, K = make_camera()
    half = cam.rescale(0.5)
    assert half.width == 64 and half.height == 48
    np.testing.assert_allclose(np.asarray(half.K)[0, 0], 50.0, atol=1e-5)
