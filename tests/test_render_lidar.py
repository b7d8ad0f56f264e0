"""Offline LiDAR condition rendering (lane shifts, previews, meta prep)."""

import os

import numpy as np
import pytest

from street_crafter_tpu.data_processor.render_lidar import (
    render_scene_conditions)
from tests.synthetic_scene import make_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = make_scene(str(tmp_path_factory.mktemp("offline")), num_frames=4)
    render_scene_conditions(d, cams=[0], shifts=[0.0, 2.0],
                            delta_frames=10)
    return d


def test_outputs_exist(scene_dir):
    import imageio.v2 as imageio
    base = os.path.join(scene_dir, "lidar", "color_render")
    shifted = os.path.join(scene_dir, "lidar", "color_render_shift_2.00")
    for d in (base, shifted):
        for f in range(4):
            assert os.path.exists(os.path.join(d, f"{f:06d}_0.png")), (d, f)
            assert os.path.exists(os.path.join(d, f"{f:06d}_0_mask.png"))
    # preview videos
    assert any(n.startswith("render_rgb_0") for n in os.listdir(base))
    # shifted view differs from the base view
    a = np.asarray(imageio.imread(os.path.join(base, "000001_0.png")), float)
    b = np.asarray(imageio.imread(os.path.join(shifted, "000001_0.png")),
                   float)
    assert np.abs(a - b).mean() > 0.5
    # masks have sensible coverage
    m = np.asarray(imageio.imread(os.path.join(base, "000001_0_mask.png")))
    assert 0.03 < (m > 0).mean() < 0.9


def test_meta_prep_with_shifts(scene_dir):
    from street_crafter_tpu.datasets.vdm_data import prepare_meta
    root = os.path.dirname(scene_dir)
    path = prepare_meta(root, [os.path.basename(scene_dir)],
                        num_frames=3, stride=1, shifts=[2.0])
    import json
    metas = json.load(open(path))
    # 1 start (end<total: start 0) x 2 render dirs (base + shift)
    assert len(metas) == 2
    dirs = {os.path.dirname(m["guidances"][0]) for m in metas}
    assert len(dirs) == 2
