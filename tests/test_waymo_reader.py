"""Data-layer tests: PLY io, synthetic scene fixture, Waymo reader."""

import numpy as np
import pytest

from street_crafter_tpu.datasets.readers import get_val_frames
from street_crafter_tpu.datasets.waymo import (
    read_waymo_scene, rotmat_to_quat_np, png_size)
from street_crafter_tpu.utils.ply import (
    read_ply, write_ply, voxel_downsample, remove_radius_outliers)
from tests.synthetic_scene import make_scene, IMG_W, IMG_H


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    mask = rng.uniform(size=100) > 0.5
    path = tmp_path / "x.ply"
    write_ply(path, pts, cols, mask)
    out = read_ply(path)
    np.testing.assert_allclose(out.points, pts, atol=1e-6)
    np.testing.assert_allclose(out.colors, cols, atol=1 / 255.0)
    np.testing.assert_array_equal(out.mask, mask)


def test_voxel_downsample():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]],
                   np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    out_pts, out_cols = voxel_downsample(pts, cols, 1.0)
    assert out_pts.shape[0] == 2
    merged = out_pts[np.argmin(out_pts[:, 0])]
    np.testing.assert_allclose(merged, [0.15, 0.15, 0.15], atol=1e-6)


def test_remove_radius_outliers():
    cluster = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cluster *= 0.1
    outlier = np.array([[100.0, 100.0, 100.0]], np.float32)
    pts = np.concatenate([cluster, outlier])
    keep = remove_radius_outliers(pts, nb_points=5, radius=0.5)
    assert keep[:50].all()
    assert not keep[50]


def test_get_val_frames_matches_reference():
    # test_every path (split_test=2, the common config)
    train, val = get_val_frames(10, test_every=2, train_every=None)
    assert val == [2, 4, 6, 8]
    assert train == [0, 1, 3, 5, 7, 9]
    # train_every path
    train, val = get_val_frames(10, test_every=None, train_every=4)
    assert train == [0, 4, 8]
    assert val == [1, 2, 3, 5, 6, 7, 9]
    # no split: everything trains
    train, val = get_val_frames(5, None, None)
    assert train == [0, 1, 2, 3, 4] and val == []


def test_rotmat_to_quat_roundtrip(rng):
    from street_crafter_tpu.ops import quaternion as Q
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m = np.asarray(Q.to_matrix(q.astype(np.float32)))
    q2 = rotmat_to_quat_np(m)
    # same rotation up to sign
    dot = np.abs((q * q2).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return make_scene(str(tmp_path_factory.mktemp("scenes")), num_frames=4)


def test_png_size(scene_dir):
    import os
    assert png_size(os.path.join(scene_dir, "images", "000000_0.png")) == \
        (IMG_W, IMG_H)


def test_read_waymo_scene(scene_dir):
    info = read_waymo_scene(scene_dir, cameras=[0, 1, 2], split_test=2)
    md = info.metadata
    assert md["num_frames"] == 4
    # 3 cams x 4 frames, every-2nd frame is val
    assert len(info.train_cameras) + len(info.test_cameras) == 12
    assert {c.metadata["frame_idx"] for c in info.test_cameras} == {2}
    # one moving actor only (the sign is stationary)
    assert len(md["obj_meta"]) == 1
    assert md["obj_meta"][0].klass == "vehicle"
    tr = md["camera_tracklets"]
    assert tr.shape == (5, 4, 1, 8)
    # actor visible at every (cam<=2, frame)
    assert (tr[:3, :, 0, 7] == 1).all()
    # world position of the actor at frame 0 ~ vehicle-frame pos + ego offset
    # (ego poses are centered: ego x positions are 0,2,4,6 -> center 3)
    np.testing.assert_allclose(tr[0, 0, 0, :3], [10.0 - 3.0, 0.0, 1.0],
                               atol=0.2)
    # quaternion normalized
    np.testing.assert_allclose(np.linalg.norm(tr[0, 0, 0, 3:7]), 1.0,
                               atol=1e-6)
    # camera geometry: c2w = ego_cam_pose @ cam2ego
    cam0 = info.train_cameras[0]
    c2w = cam0.c2w
    # camera forward (z in cam frame) should map to world +x
    np.testing.assert_allclose(c2w[:3, :3] @ [0, 0, 1], [1, 0, 0], atol=1e-6)
    assert cam0.width == IMG_W and cam0.height == IMG_H
    # guidance entries present for train cameras
    assert "lidar_depth_path" in cam0.guidance
    assert "sky_mask_path" in cam0.guidance
    # scene radius floored at 10
    assert md["scene_radius"] >= 10.0


def test_novel_view_cameras(scene_dir):
    info = read_waymo_scene(scene_dir, cameras=[0, 1, 2], split_test=2,
                            novel_view_shifts=[2.0, 3.0])
    novel = info.novel_view_cameras
    # front cam only: 4 frames x 2 shifts
    assert len(novel) == 8
    assert all(c.metadata["is_novel_view"] for c in novel)
    assert all(c.metadata["cam"] == 0 for c in novel)
    # lateral offset: ego moves +x so lane shift is +-y; scene "016" has
    # default sign -1 and direction (dy, -dx, 0) = (0, -1, 0) -> +y shift
    base = [c for c in info.train_cameras + info.test_cameras
            if c.metadata["cam"] == 0 and c.metadata["frame"] == 1][0]
    nv = [c for c in novel if c.metadata["frame"] == 1
          and c.metadata["novel_view_id"] == 2.0][0]
    delta = nv.c2w[:3, 3] - base.c2w[:3, 3]
    np.testing.assert_allclose(np.abs(delta[1]), 2.0, atol=1e-6)
    np.testing.assert_allclose(delta[[0, 2]], 0.0, atol=1e-6)
    assert "skip_camera" in nv.metadata
