"""Runtime pointcloud processor: scene-init plys + condition rendering."""

import os

import numpy as np
import pytest

from street_crafter_tpu.data_processor import get_pointcloud_processor
from street_crafter_tpu.datasets.waymo import read_waymo_scene
from street_crafter_tpu.utils.ply import read_ply
from tests.synthetic_scene import make_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scenes"))
    d = make_scene(root, num_frames=4)
    info = read_waymo_scene(d, cameras=[0], split_test=2,
                            novel_view_shifts=[2.0])
    proc = get_pointcloud_processor(
        "waymo", d, cameras=[0], selected_frames=(0, 3), delta_frames=10)
    return d, info, proc


def test_read_lidar_ply(scene):
    d, info, proc = scene
    assert set(proc.ply_dict["background"].keys()) == {0, 1, 2, 3}
    # background transformed to world: z stays ~0 for the ground plane
    bkgd = proc.ply_dict["background"][0]
    assert np.abs(bkgd[:400, 2]).max() < 1e-3
    # rigid actor symmetry-flip densification: more points than on disk
    assert "actor_moving" in proc.ply_dict
    assert proc.ply_dict["actor_moving"][0].shape[0] > 100


def test_initialize_ply(scene, tmp_path):
    d, info, proc = scene
    model_dir = str(tmp_path / "model")
    paths = proc.initialize_ply(model_dir, info.metadata["obj_meta"])
    for key in ("lidar", "bkgd", "sky"):
        assert key in paths and os.path.exists(paths[key]), key
    bkgd = read_ply(paths["bkgd"])
    assert bkgd.points.shape[0] > 100
    assert bkgd.colors is not None
    # sky points pushed out to the enlarged scene sphere
    sky = read_ply(paths["sky"])
    r = np.linalg.norm(sky.points - proc.sphere_center, axis=-1)
    np.testing.assert_allclose(r, proc.sphere_radius * 2.5, rtol=1e-3)
    # actor ply in canonical frame, within its box
    obj = info.metadata["obj_meta"][0]
    actor = read_ply(paths[f"obj_{obj.object_id:03d}"])
    assert np.abs(actor.points[:, 0]).max() <= obj.length


def test_render_condition(scene):
    d, info, proc = scene
    cam = info.train_cameras[0]
    proc.render_condition(cam, info.metadata["obj_meta"], force=True)
    import imageio.v2 as imageio
    rgb = imageio.imread(cam.metadata["guidance_rgb_path"])
    mask = imageio.imread(cam.metadata["guidance_mask_path"])
    assert rgb.shape[:2] == (cam.height, cam.width)
    # the ground plane ahead must hit a decent fraction of the image
    frac = (np.asarray(mask) > 0).mean()
    assert 0.05 < frac <= 1.0
    # covered pixels carry color
    assert np.asarray(rgb)[np.asarray(mask) > 0].max() > 0

    # novel-view condition renders too (lane-shifted ego pose)
    nv = info.novel_view_cameras[0]
    proc.render_condition(nv, info.metadata["obj_meta"], force=True)
    assert os.path.exists(nv.metadata["guidance_rgb_path"])
