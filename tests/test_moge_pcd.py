"""MoGe predicted-pcd orchestration (data_processor/moge_pcd.py) with an
injected geometry predictor: metric alignment recovers the affine depth
transform, points land in the right actor/background plys in the right
frames (waymo_get_moge_pcd.py semantics)."""

import os

import numpy as np
import pytest

from street_crafter_tpu.data_processor.moge_pcd import (
    check_existing, recover_metric_depth, save_moge_pcd)
from street_crafter_tpu.datasets import waymo_layout
from street_crafter_tpu.utils.ply import read_ply
from tests.synthetic_scene import IMG_H, IMG_W, make_scene

A0, B0 = 2.0, 1.0  # the affine depth transform the predictor "loses"


def test_recover_metric_depth_affine():
    rng = np.random.default_rng(0)
    pred = rng.uniform(1.0, 20.0, (40, 60)).astype(np.float32)
    gt = np.zeros_like(pred)
    m = rng.random(pred.shape) < 0.3
    gt[m] = A0 * pred[m] + B0
    aligned, a, b = recover_metric_depth(pred, gt, None)
    assert abs(a - A0) < 1e-4 and abs(b - B0) < 1e-3
    np.testing.assert_allclose(aligned, A0 * pred + B0, rtol=1e-4)


def test_recover_metric_depth_fallback():
    """Non-positive slope falls back to mean-ratio scaling (:34-40)."""
    pred = np.array([[1.0, 2.0, 3.0]])
    gt = np.array([[6.0, 4.0, 2.0]])  # anti-correlated -> a < 0
    aligned, a, b = recover_metric_depth(pred, gt, None)
    assert b == 0.0 and a == pytest.approx(np.mean(gt) / np.mean(pred))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("moge"))
    d = make_scene(root, num_frames=2)
    # replace the random lidar depth with a smooth ramp so the affine fit
    # is exact through the (identity-size) resize
    for f in range(2):
        mask = np.zeros((IMG_H, IMG_W), bool)
        mask[IMG_H // 2:, :] = True
        ramp = 10.0 + 20.0 * (np.arange(IMG_W, dtype=np.float32) / IMG_W)
        gt = np.broadcast_to(ramp, (IMG_H, IMG_W))
        np.savez_compressed(
            os.path.join(d, "lidar", "depth", f"{f:06d}_0.npz"),
            mask=mask, value=gt[mask].astype(np.float32))
    return d


def _make_predictor(scene_dir):
    """Predictor consistent with the scene's lidar depth up to (A0, B0),
    whose points hit the moving actor's frame-0 bbox + the background."""
    _, _, trajectory = waymo_layout.load_track(scene_dir)
    _, extrinsics, _, _ = waymo_layout.load_camera_info(scene_dir)
    cam2ego = np.asarray(extrinsics[0])
    ego2cam = np.linalg.inv(cam2ego)
    traj = trajectory["actor_moving"]
    pose0 = np.asarray(traj["poses_vehicle"][0], np.float64)

    # 20 metric targets inside the actor box (canonical frame), 50 outside
    rng = np.random.default_rng(1)
    canon = rng.uniform(-0.4, 0.4, (20, 3)) * np.array(
        [traj["length"], traj["width"], traj["height"]])
    actor_vehicle = canon @ pose0[:3, :3].T + pose0[:3, 3]
    bkgd_vehicle = rng.uniform(30.0, 60.0, (50, 3))  # far from the box
    targets = np.concatenate([actor_vehicle, bkgd_vehicle])
    cam_pts = targets @ ego2cam[:3, :3].T + ego2cam[:3, 3]
    pred_pts = (cam_pts - B0) / A0  # what the "model" would output

    calls = []

    def predict(image, fov_x):
        h, w = image.shape[:2]
        assert (h, w) == (IMG_H, IMG_W)  # identity-size resize in the test
        calls.append(fov_x)
        ramp = 10.0 + 20.0 * (np.arange(w, dtype=np.float32) / w)
        depth = np.broadcast_to(ramp, (h, w)).copy()
        pts = np.zeros((h, w, 3), np.float32)
        mask = np.zeros((h, w), bool)
        flatp = pts.reshape(-1, 3)
        flatm = mask.reshape(-1)
        flatp[: len(pred_pts)] = pred_pts
        flatm[: len(pred_pts)] = True
        return {"points": pts, "depth": (depth - B0) / A0, "mask": mask}

    return predict, canon, actor_vehicle, bkgd_vehicle


def test_save_moge_pcd(scene_dir):
    predict, canon, actor_vehicle, bkgd_vehicle = _make_predictor(scene_dir)
    assert not check_existing(scene_dir)
    save_moge_pcd(scene_dir, predict, expected_area=IMG_H * IMG_W)
    assert check_existing(scene_dir)

    # background ply: recovered metric points match the vehicle-frame
    # targets (affine alignment + cam->vehicle transform round-trip)
    bk = read_ply(os.path.join(scene_dir, "moge", "background",
                               "000000.ply"))
    assert len(bk.points) == len(bkgd_vehicle)
    np.testing.assert_allclose(
        np.sort(bk.points, axis=0), np.sort(bkgd_vehicle, axis=0),
        atol=1e-2)

    # actor ply: canonical-frame points inside the bbox
    ap = os.path.join(scene_dir, "moge", "actor", "actor_moving",
                      "000000.ply")
    a = read_ply(ap)
    assert len(a.points) == len(canon)
    np.testing.assert_allclose(np.sort(a.points, axis=0),
                               np.sort(canon, axis=0), atol=1e-2)
    # accumulated full.ply exists (both frames contributed)
    full = read_ply(os.path.join(scene_dir, "moge", "actor", "actor_moving",
                                 "full.ply"))
    assert len(full.points) >= len(canon)

    # the static sign actor gets no moge points dir content
    assert not os.path.exists(os.path.join(scene_dir, "moge", "actor",
                                           "actor_static", "000000.ply"))
