"""Range-image math golden tests (roundtrips + closed-form checks)."""

import numpy as np

from street_crafter_tpu.data_processor.range_images import (
    cartesian_to_range_image, colorize_points, points_in_box,
    range_image_to_cartesian, scatter_min_depth)


def _extrinsic(yaw=0.3, t=(1.0, 0.5, 2.0)):
    c, s = np.cos(yaw), np.sin(yaw)
    e = np.eye(4)
    e[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    e[:3, 3] = t
    return e


def test_range_image_roundtrip(rng):
    H, W = 32, 256
    inclinations = np.linspace(0.3, -0.3, H)
    ext = _extrinsic()
    # synthesize points exactly on the polar grid
    rows = rng.integers(0, H, 500)
    cols = rng.integers(0, W, 500)
    r = rng.uniform(2.0, 60.0, 500)
    img = np.full((H, W), -1.0)
    img[rows, cols] = r

    pts = range_image_to_cartesian(img, inclinations, ext)
    valid = img > 0
    pts_v = pts[valid]
    # invert back (sensor frame)
    img2 = cartesian_to_range_image(pts_v, inclinations, W, extrinsic=ext)
    got = img2[valid]
    np.testing.assert_allclose(np.sort(got), np.sort(img[valid]), rtol=1e-6)
    # ranges preserved: |p - sensor origin| == r
    origin = ext[:3, 3]
    np.testing.assert_allclose(np.linalg.norm(pts_v - origin, axis=-1),
                               img[valid], rtol=1e-9)


def test_pixel_pose_identity_noop(rng):
    H, W = 8, 64
    incl = np.linspace(0.2, -0.2, H)
    ext = _extrinsic(0.0, (0, 0, 0))
    img = rng.uniform(2, 50, (H, W))
    eye = np.broadcast_to(np.eye(4), (H, W, 4, 4)).copy()
    a = range_image_to_cartesian(img, incl, ext)
    b = range_image_to_cartesian(img, incl, ext, pixel_pose=eye,
                                 frame_pose_inv=np.eye(4))
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_colorize_and_depth():
    K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]])
    cam2vehicle = np.array([  # opencv cam: z forward = vehicle +x
        [0.0, 0.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0, 0, 0, 1.0]])
    img = np.zeros((48, 64, 3), np.float32)
    img[:, :, 0] = 1.0  # red
    pts = np.array([[10.0, 0.0, 0.0],   # straight ahead
                    [5.0, 0.0, 0.0],
                    [-5.0, 0.0, 0.0]])  # behind
    rgb, mask = colorize_points(pts, {0: img}, {0: K}, {0: cam2vehicle})
    assert mask.tolist() == [True, True, False]
    np.testing.assert_allclose(rgb[0], [1, 0, 0])

    value, m = scatter_min_depth(pts, K, cam2vehicle, 48, 64)
    # both visible points land on the same center pixel; min depth wins
    assert m.sum() == 1
    np.testing.assert_allclose(value, [5.0])


def test_points_in_box():
    pts = np.array([[1.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.0, 0.9, 0.0]])
    center = np.zeros(3)
    # box 4 long (x), 1 wide (y), 2 high, yawed 90deg -> length along y
    inside = points_in_box(pts, center, np.pi / 2, np.array([4.0, 1.0, 2.0]))
    assert inside.tolist() == [False, False, True]
