"""COLMAP sparse-model io (binary + text).

Replaces street_gaussian/utils/colmap_utils.py:104-252 and
data_processor/utils/read_write_model.py: read points3D / images / cameras
from COLMAP binary models (used to merge triangulated background points into
the LiDAR init, base_processor.py:96-114) and write the fixed known-pose
text model the triangulation driver feeds to COLMAP.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def _read(fid, fmt: str):
    size = struct.calcsize("<" + fmt)
    return struct.unpack("<" + fmt, fid.read(size))


def read_points3D_binary(path: str):
    """Returns (xyz [N,3] f64, rgb [N,3] u8, error [N])."""
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        xyz = np.empty((n, 3))
        rgb = np.empty((n, 3), np.uint8)
        err = np.empty(n)
        for i in range(n):
            data = _read(f, "QdddBBBd")
            xyz[i] = data[1:4]
            rgb[i] = data[4:7]
            err[i] = data[7]
            (track_len,) = _read(f, "Q")
            f.seek(8 * track_len, 1)  # skip track (image_id, point2D_idx)
    return xyz, rgb, err


def read_points3D_text(path: str):
    xyz, rgb, err = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            xyz.append([float(v) for v in vals[1:4]])
            rgb.append([int(v) for v in vals[4:7]])
            err.append(float(vals[7]))
    return (np.array(xyz).reshape(-1, 3), np.array(rgb, np.uint8).reshape(-1, 3),
            np.array(err))


def read_cameras_binary(path: str) -> dict:
    """camera_id -> dict(model_id, width, height, params)."""
    # params count per model id (COLMAP convention)
    n_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4,
                9: 5, 10: 12}
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(f, "iiQQ")
            params = np.array(_read(f, "d" * n_params[model_id]))
            out[cam_id] = {"model_id": model_id, "width": w, "height": h,
                           "params": params}
    return out


def read_images_binary(path: str) -> dict:
    """image_id -> dict(qvec wxyz, tvec, camera_id, name)."""
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "Q")
        for _ in range(n):
            (image_id,) = _read(f, "I")
            qvec = np.array(_read(f, "dddd"))
            tvec = np.array(_read(f, "ddd"))
            (camera_id,) = _read(f, "I")
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "Q")
            f.seek(24 * n_pts, 1)  # skip 2D points (x, y, point3D_id)
            out[image_id] = {"qvec": qvec, "tvec": tvec,
                             "camera_id": camera_id,
                             "name": name.decode("utf-8")}
    return out


def rotmat_to_qvec(m: np.ndarray) -> np.ndarray:
    """COLMAP wxyz quaternion from a rotation matrix."""
    from ..datasets.waymo import rotmat_to_quat_np
    return rotmat_to_quat_np(m)


def write_text_model(model_dir: str,
                     cameras: dict,
                     images: dict) -> None:
    """Write the fixed known-pose model (cameras.txt / images.txt /
    empty points3D.txt) for colmap point_triangulator
    (colmap_waymo_full.py:160-230).

    cameras: cam_id -> dict(model='SIMPLE_PINHOLE'|'PINHOLE', width, height,
    params list). images: image_id -> dict(name, camera_id, w2c [4,4]).
    """
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "cameras.txt"), "w") as f:
        for cam_id, c in sorted(cameras.items()):
            params = " ".join(str(float(p)) for p in c["params"])
            f.write(f"{cam_id} {c.get('model', 'SIMPLE_PINHOLE')} "
                    f"{c['width']} {c['height']} {params}\n")
    with open(os.path.join(model_dir, "images.txt"), "w") as f:
        for image_id, im in sorted(images.items()):
            w2c = np.asarray(im["w2c"])
            q = rotmat_to_qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            vals = " ".join(str(float(v)) for v in (*q, *t))
            f.write(f"{image_id} {vals} {im['camera_id']} {im['name']}\n\n")
    open(os.path.join(model_dir, "points3D.txt"), "w").close()


def read_model_points(model_dir: str):
    """Load points3D from a triangulated model dir (bin preferred)."""
    b = os.path.join(model_dir, "points3D.bin")
    if os.path.exists(b):
        return read_points3D_binary(b)
    t = os.path.join(model_dir, "points3D.txt")
    if os.path.exists(t):
        return read_points3D_text(t)
    raise FileNotFoundError(f"no points3D model under {model_dir}")
