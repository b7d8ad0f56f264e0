"""Scene-loader parity vs the reference's ACTUAL waymo_utils dataparser.

VERDICT r2 #1(d): run the reference's generate_dataparser_outputs
(/root/reference/street_gaussian/utils/waymo_utils.py:107-263) on the same
synthetic processed-Waymo scene directory our tests use, and compare every
output against street_crafter_tpu.datasets.waymo.read_waymo_scene —
calibration, centered ego poses, c2w chains, per-camera shutter timestamps,
visible-actor selection, and the timestamp-interpolated world-frame actor
tracklets (position + quaternion).  The scene has per-camera timestamp
offsets (tests/synthetic_scene.py:77) so the two-nearest-tracklet
interpolation branch (waymo_utils.py:215-231) is genuinely exercised for
cams 1-2 while cam 0 hits the exact-match path.
"""

import os
import types

import numpy as np
import pytest

import tests.torch_ref.reference_loader as refload

CAMERAS = [0, 1, 2]


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from tests.synthetic_scene import make_scene
    root = tmp_path_factory.mktemp("waymo_parity")
    return make_scene(str(root), num_frames=4)


def _reference_outputs(scene_dir, tmp_path_factory):
    model_path = str(tmp_path_factory.mktemp("ref_model"))
    # pre-create the sentinel so the reference skips its COLMAP run
    os.makedirs(os.path.join(model_path, "colmap/triangulated/sparse/model"),
                exist_ok=True)
    cfg_obj = types.SimpleNamespace(data={"box_scale": 1.0},
                                    model_path=model_path)
    wu = refload.load_waymo_utils(cfg_obj)
    # the reference keeps a debugger hook on an unreachable branch
    # (waymo_utils.py:225); make breakpoint() a no-op in case it fires
    os.environ["PYTHONBREAKPOINT"] = "0"
    return wu.generate_dataparser_outputs(
        scene_dir, selected_frames=[0, 3], cameras=CAMERAS)


@pytest.fixture(scope="module")
def parity(scene_dir, tmp_path_factory):
    ref = _reference_outputs(scene_dir, tmp_path_factory)
    from street_crafter_tpu.datasets.waymo import read_waymo_scene
    mine = read_waymo_scene(scene_dir, cameras=CAMERAS,
                            selected_frames=(0, 3), split_test=-1,
                            use_novel_view_cameras=False)
    return ref, mine


def _my_cam_infos(mine):
    return mine.train_cameras + mine.test_cameras


def test_image_ordering_and_indexing(parity):
    ref, mine = parity
    infos = _my_cam_infos(mine)
    assert [os.path.basename(p) for p in ref["image_filenames"]] == \
        [os.path.basename(c.image_path) for c in infos]
    assert ref["frames"] == [c.metadata["frame"] for c in infos]
    assert ref["cams"] == [c.metadata["cam"] for c in infos]
    assert ref["frames_idx"] == [c.metadata["frame_idx"] for c in infos]
    assert ref["num_frames"] == mine.metadata["num_frames"]


def test_calibration_and_poses(parity):
    ref, mine = parity
    infos = _my_cam_infos(mine)
    np.testing.assert_allclose(
        ref["ixts"], np.stack([c.K for c in infos]), atol=1e-12)
    np.testing.assert_allclose(
        ref["exts"], np.stack([c.metadata["extrinsic"] for c in infos]),
        atol=1e-12)
    np.testing.assert_allclose(
        ref["ego_cam_poses"],
        np.stack([c.metadata["ego_pose"] for c in infos]), atol=1e-12)
    np.testing.assert_allclose(
        ref["ego_frame_poses"], mine.metadata["ego_frame_poses"], atol=1e-12)
    # c2w = (centered ego cam pose) @ cam2ego; ours is stored inverted as
    # (R, T) w2c components (readers.py CameraInfo contract)
    for rc2w, info in zip(ref["c2ws"], infos):
        w2c = np.eye(4)
        w2c[:3, :3] = info.R.T
        w2c[:3, 3] = info.T
        np.testing.assert_allclose(np.linalg.inv(w2c), rc2w, atol=1e-9)


def test_shutter_timestamps(parity):
    ref, mine = parity
    infos = _my_cam_infos(mine)
    np.testing.assert_allclose(
        ref["cams_timestamps"],
        np.array([c.metadata["timestamp"] for c in infos]), atol=1e-12)


def test_object_info_selection(parity):
    ref, mine = parity
    my_objs = mine.metadata["obj_meta"]
    assert len(ref["obj_info"]) == len(my_objs)  # stationary sign excluded
    for mo in my_objs:
        ro = ref["obj_info"][mo.object_id]
        assert ro["id"] == mo.id
        assert ro["track_id"] == mo.track_id
        assert ro["class"] == mo.klass
        assert ro["class_label"] == mo.class_label
        for k, v in (("height", mo.height), ("width", mo.width),
                     ("length", mo.length)):
            assert ro[k] == pytest.approx(v)
        assert ro["start_frame"] == mo.start_frame
        assert ro["end_frame"] == mo.end_frame
        assert ro["deformable"] == mo.deformable


def test_camera_tracklets_interpolation(parity):
    """World-frame actor poses per camera: timestamp interpolation between
    the two nearest tracklet samples, ego composition, and the wxyz
    quaternion convention (make_obj_pose, waymo_utils.py:21-45)."""
    ref, mine = parity
    rt = ref["cams_tracklets"]                        # [3, F, A, 8]
    mt = mine.metadata["camera_tracklets"][:len(CAMERAS)]
    assert rt.shape == mt.shape
    # reference quats come from torch float32 matrix_to_quaternion
    np.testing.assert_allclose(mt, rt, atol=1e-6)
    # sanity: the interpolation branch actually ran (cams 1-2 shutter times
    # sit strictly between tracklet samples, so their positions differ from
    # cam 0's at the same frame)
    valid = rt[0, :, :, 7] == 1
    assert valid.any()
    assert not np.allclose(rt[0, :, :, :3][valid[:, :]],
                           rt[1, :, :, :3][valid[:, :]])
