"""COLMAP model io roundtrips (binary points3D reader, text model writer)."""

import os
import struct

import numpy as np

from street_crafter_tpu.utils.colmap_io import (
    read_cameras_binary, read_images_binary, read_points3D_binary,
    read_points3D_text, write_text_model)


def _write_points3D_binary(path, xyz, rgb, err):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz[i],
                                *rgb[i].astype(np.uint8), err[i]))
            track = [(1, 0), (2, 5)]
            f.write(struct.pack("<Q", len(track)))
            for img_id, p2d in track:
                f.write(struct.pack("<ii", img_id, p2d))


def test_points3D_binary_roundtrip(tmp_path, rng):
    xyz = rng.uniform(-10, 10, (20, 3))
    rgb = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    err = rng.uniform(0, 2, 20)
    p = str(tmp_path / "points3D.bin")
    _write_points3D_binary(p, xyz, rgb, err)
    x2, c2, e2 = read_points3D_binary(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)
    np.testing.assert_allclose(e2, err)


def test_text_model_write_parse(tmp_path):
    cameras = {0: {"model": "SIMPLE_PINHOLE", "width": 64, "height": 48,
                   "params": [40.0, 32.0, 24.0]}}
    w2c = np.eye(4)
    w2c[:3, 3] = [1.0, 2.0, 3.0]
    images = {1: {"name": "cam_0/000000_0.png", "camera_id": 0, "w2c": w2c}}
    model_dir = str(tmp_path / "model")
    write_text_model(model_dir, cameras, images)
    for name in ("cameras.txt", "images.txt", "points3D.txt"):
        assert os.path.exists(os.path.join(model_dir, name))
    lines = open(os.path.join(model_dir, "images.txt")).read().split("\n")
    vals = lines[0].split()
    assert vals[0] == "1"
    # identity rotation -> qw=1; translation 1 2 3
    np.testing.assert_allclose([float(v) for v in vals[1:5]], [1, 0, 0, 0],
                               atol=1e-12)
    np.testing.assert_allclose([float(v) for v in vals[5:8]], [1, 2, 3])
    assert vals[8] == "0" and vals[9] == "cam_0/000000_0.png"
    # empty points3D parses to empty arrays
    xyz, rgb, err = read_points3D_text(
        os.path.join(model_dir, "points3D.txt"))
    assert xyz.shape == (0, 3)
