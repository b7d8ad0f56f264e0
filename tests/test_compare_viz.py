"""Comparison-visualization + generic COLMAP converter (VERDICT r2 #7).

Covers visualizers/compare.py (tile layouts, bbox overlay, id colors,
depth colormap, labeled compare strip — visualization_utils.py analog) and
data_processor/colmap_convert.py (script/convert.py analog, injectable
runner so no COLMAP binary is needed).
"""

import numpy as np
import pytest

from street_crafter_tpu.visualizers import compare as C


def test_tile_cameras_waymo():
    front = np.full((16, 24, 3), 0.5, np.float32)
    side = np.full((12, 24, 3), 0.25, np.float32)   # shorter side cams
    tiled = C.tile_cameras(
        [side, front, side],
        ["left_camera", "front_camera", "right_camera"], "waymo")
    # left(0) front(2) right(4) -> cropped to 5 columns span (cols 0..4)
    assert tiled.shape == (16, 24 * 5, 3)
    # side cams bottom-anchored: their top 4 rows stay black
    assert tiled[:4, :24].max() == 0.0
    assert tiled[4:, :24].min() == 0.25
    np.testing.assert_allclose(tiled[:, 48:72], 0.5)


def test_tile_cameras_nuscenes_and_errors():
    img = np.ones((8, 8, 3), np.float32)
    tiled = C.tile_cameras([img, img], ["CAM_FRONT", "CAM_BACK"], "nuscenes")
    assert tiled.shape == (16, 8, 3)   # two rows, one filled column
    with pytest.raises(ValueError):
        C.tile_cameras([img], ["x"], "nope")


def test_draw_bbox3d_and_colors():
    img = np.zeros((32, 32, 3), np.uint8)
    corners = np.array([[[4, 4], [20, 4], [20, 20], [4, 20],
                         [8, 8], [24, 8], [24, 24], [8, 24]]])
    out = C.draw_bbox3d(img, corners, colors=(255, 0, 0), thickness=1)
    assert out[4, 10, 0] == 255 and out.sum() > 0
    c1 = C.color_for_id("track_001")
    c2 = C.color_for_id("track_002")
    assert c1 != c2 and all(0 <= v < 256 for v in c1)
    assert C.color_for_id("track_001") == c1  # stable


def test_visualize_depth_and_matte():
    rng = np.random.default_rng(0)
    depth = rng.uniform(4.0, 80.0, size=(16, 16)).astype(np.float32)
    acc = np.ones((16, 16), np.float32)
    rgb = C.visualize_depth(depth, acc, lo=4.0, hi=120.0)
    assert rgb.shape == (16, 16, 3) and rgb.min() >= 0 and rgb.max() <= 1
    # near pixels hotter than far under -log curve: distinct colors
    near = C.visualize_depth(np.full((4, 4), 5.0), None, lo=4.0, hi=120.0)
    far = C.visualize_depth(np.full((4, 4), 100.0), None, lo=4.0, hi=120.0)
    assert np.abs(near - far).max() > 0.2

    m = C.checker_matte(np.ones((16, 16, 3)), np.zeros((16, 16)))
    assert set(np.unique(m.round(2))) == {0.8, 1.0}


def test_weighted_percentile():
    x = np.arange(100, dtype=np.float32)
    lo, hi = C.weighted_percentile(x, None, [10, 90])
    assert 5 < lo < 15 and 85 < hi < 95
    # weights skew the percentile
    w = np.zeros(100)
    w[:10] = 1.0
    lo_w, = C.weighted_percentile(x, w, [90])
    assert lo_w < 10


def test_compare_strip():
    gt = np.full((16, 16, 3), 0.5, np.float32)
    render = np.full((16, 16, 3), 0.2, np.float32)
    strip = C.compare_strip({"gt": gt, "render": render, "diffusion": gt})
    assert strip.shape[1] == 48 and strip.shape[0] > 16
    assert strip.dtype == np.float32


def test_colmap_convert_commands(tmp_path):
    from street_crafter_tpu.data_processor.colmap_convert import (
        convert_colmap_scene)

    sp = tmp_path / "scene"
    (sp / "input").mkdir(parents=True)
    calls = []

    def fake_runner(args):
        calls.append(list(args))
        if args[0] == "image_undistorter":
            # colmap writes images/ + sparse/{cameras,images,points3D}.bin
            (sp / "images").mkdir(exist_ok=True)
            (sp / "sparse").mkdir(exist_ok=True)
            for f in ("cameras.bin", "images.bin", "points3D.bin"):
                (sp / "sparse" / f).write_bytes(b"x")

    convert_colmap_scene(str(sp), runner=fake_runner)
    names = [c[0] for c in calls]
    assert names == ["feature_extractor", "exhaustive_matcher", "mapper",
                     "image_undistorter"]
    # sparse files moved into sparse/0 (script/convert.py:81-89)
    assert sorted(p.name for p in (sp / "sparse" / "0").iterdir()) == [
        "cameras.bin", "images.bin", "points3D.bin"]
    # skip_matching path runs only the undistorter
    calls.clear()
    convert_colmap_scene(str(sp), skip_matching=True, runner=fake_runner)
    assert [c[0] for c in calls] == ["image_undistorter"]


def test_colmap_convert_resize(tmp_path):
    from PIL import Image

    from street_crafter_tpu.data_processor.colmap_convert import (
        convert_colmap_scene)

    sp = tmp_path / "scene"
    (sp / "input").mkdir(parents=True)

    def fake_runner(args):
        if args[0] == "image_undistorter":
            (sp / "images").mkdir(exist_ok=True)
            (sp / "sparse").mkdir(exist_ok=True)
            Image.fromarray(
                np.zeros((32, 64, 3), np.uint8)).save(sp / "images" / "a.png")

    convert_colmap_scene(str(sp), skip_matching=True, resize=True,
                         runner=fake_runner)
    for factor in (2, 4, 8):
        with Image.open(sp / f"images_{factor}" / "a.png") as im:
            assert im.size == (64 // factor, 32 // factor)
