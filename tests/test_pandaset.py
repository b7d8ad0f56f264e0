"""PandaSet offline pipeline: layout loaders, condition render, meta prep."""

import json
import os

import numpy as np
import pytest

from street_crafter_tpu.data_processor.pandaset import (
    prepare_meta, render_scene_conditions)
from street_crafter_tpu.datasets import pandaset_layout as layout
from tests.synthetic_scene import make_pandaset_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = make_pandaset_scene(str(tmp_path_factory.mktemp("panda")),
                            num_frames=4, num_cams=2)
    render_scene_conditions(d, cams=[0], shifts=[0.0, 2.0])
    return d


def test_layout_loaders(scene_dir):
    poses, intr = layout.load_camera_info(scene_dir, num_frames=4,
                                          num_cams=2)
    assert poses.shape == (4, 2, 4, 4)
    assert len(intr) == 2
    frame_instances, instances_info = layout.load_track(scene_dir)
    assert "0" in instances_info

    ts = layout.load_timestamps(scene_dir)
    obj = layout.get_obj_info(
        instances_info["0"]["frame_annotations"],
        ts["front_camera"], timestamp=0.15)
    assert obj is not None
    # y position interpolated halfway between frames 1 (0.5) and 2 (1.0)
    np.testing.assert_allclose(obj["pose"][1, 3], 0.75, atol=1e-5)
    # outside lifetime
    assert layout.get_obj_info(
        instances_info["0"]["frame_annotations"], ts["front_camera"],
        timestamp=9.0) is None

    d = layout.get_lane_shift_direction(poses, 0, 1)
    np.testing.assert_allclose(np.abs(d[1]), 1.0, atol=1e-6)


def test_condition_render(scene_dir):
    import imageio.v2 as imageio
    base = os.path.join(scene_dir, "lidar_forward", "color_render")
    shifted = os.path.join(scene_dir, "lidar_forward",
                           "color_render_shift_2.00")
    for d in (base, shifted):
        for f in range(4):
            assert os.path.exists(os.path.join(d, f"{f:03d}_0.png"))
    m = np.asarray(imageio.imread(os.path.join(base, "001_0_mask.png")))
    assert (m > 0).mean() > 0.03
    a = np.asarray(imageio.imread(os.path.join(base, "001_0.png")), float)
    b = np.asarray(imageio.imread(os.path.join(shifted, "001_0.png")), float)
    assert np.abs(a - b).mean() > 0.5


def test_meta_prep(scene_dir):
    root = os.path.dirname(scene_dir)
    path = prepare_meta(root, [os.path.basename(scene_dir)], num_frames=3,
                        stride=1, shifts=[2.0])
    metas = json.load(open(path))
    assert len(metas) == 2  # 1 window x 2 render dirs
    # loads through the shared ClipDataset (same contract as Waymo)
    from street_crafter_tpu.datasets.vdm_data import ClipDataset
    ds = ClipDataset(root, anno_file=path, target_height=24,
                     target_width=48, num_frames=3)
    item = ds[0]
    assert item["img_seq"].shape == (3, 24, 48, 3)
