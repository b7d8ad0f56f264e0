"""Waymo range-image math (pure numpy, dependency-free).

The algorithmic core of data_processor/waymo_processor/waymo_get_lidar_pcd.py
(:44-360) re-implemented without the waymo-open-dataset/TF/dask stack:
polar range images -> cartesian vehicle-frame points, per-camera
colorization, scatter-min sparse depth, in-box actor segmentation. The
tfrecord/parquet drivers (waymo_converter.py analog) call these and are
import-gated on the waymo packages.
"""

from __future__ import annotations

import numpy as np

DUMMY_DISTANCE_VALUE = 2e3  # marker for missing returns (reference :41)


def range_image_to_cartesian(range_image: np.ndarray,
                             inclinations: np.ndarray,
                             extrinsic: np.ndarray,
                             pixel_pose: np.ndarray | None = None,
                             frame_pose_inv: np.ndarray | None = None
                             ) -> np.ndarray:
    """Polar -> cartesian (WOD convention).

    range_image: [H, W] ranges; inclinations: [H] beam angles (top row
    first); extrinsic: [4, 4] sensor->vehicle. pixel_pose: optional
    [H, W, 4, 4] world_from_vehicle per pixel (top LiDAR rolling shutter);
    frame_pose_inv: [4, 4] vehicle_from_world of the frame. Returns
    [H, W, 3] vehicle-frame points.
    """
    H, W = range_image.shape
    # azimuth spans [pi, -pi) across columns, corrected by the sensor yaw
    az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    ratios = (np.arange(W, dtype=np.float64) + 0.5) / W
    azimuth = (1.0 - 2.0 * ratios) * np.pi - az_correction

    cos_az = np.cos(azimuth)[None, :]
    sin_az = np.sin(azimuth)[None, :]
    cos_incl = np.cos(inclinations)[:, None]
    sin_incl = np.sin(inclinations)[:, None]

    x = cos_az * cos_incl * range_image
    y = sin_az * cos_incl * range_image
    z = sin_incl * range_image
    pts_sensor = np.stack([x, y, z], -1)  # [H, W, 3]

    pts_vehicle = pts_sensor @ extrinsic[:3, :3].T + extrinsic[:3, 3]

    if pixel_pose is not None:
        assert frame_pose_inv is not None
        # to world via per-pixel pose, back to the frame's vehicle frame
        pw = np.einsum("hwij,hwj->hwi", pixel_pose[..., :3, :3],
                       pts_vehicle) + pixel_pose[..., :3, 3]
        pts_vehicle = pw @ frame_pose_inv[:3, :3].T + frame_pose_inv[:3, 3]
    return pts_vehicle


def cartesian_to_range_image(points_sensor: np.ndarray,
                             inclinations: np.ndarray, width: int,
                             extrinsic: np.ndarray | None = None
                             ) -> np.ndarray:
    """Inverse mapping (test utility): sensor/vehicle points -> [H, W]
    range image (nearest-cell assignment)."""
    if extrinsic is not None:
        inv = np.linalg.inv(extrinsic)
        points_sensor = points_sensor @ inv[:3, :3].T + inv[:3, 3]
        az_correction = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    else:
        az_correction = 0.0
    r = np.linalg.norm(points_sensor, axis=-1)
    azimuth = np.arctan2(points_sensor[:, 1], points_sensor[:, 0])
    incl = np.arcsin(points_sensor[:, 2] / np.maximum(r, 1e-9))
    cols = np.round(
        (1.0 - (azimuth + az_correction) / np.pi) * width / 2.0 - 0.5
    ).astype(int) % width
    rows = np.argmin(np.abs(incl[:, None] - inclinations[None]), axis=1)
    img = np.full((len(inclinations), width), -1.0)
    img[rows, cols] = r
    return img


def project_points_to_camera(points_vehicle: np.ndarray, K: np.ndarray,
                             cam2vehicle: np.ndarray, H: int, W: int):
    """(uv [N,2], depth [N], valid [N]) of vehicle-frame points in a camera
    (colorization / depth, reference :230-300)."""
    w2c = np.linalg.inv(cam2vehicle)
    cam = points_vehicle @ w2c[:3, :3].T + w2c[:3, 3]
    z = cam[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K[0, 0] * cam[:, 0] / z + K[0, 2]
        v = K[1, 1] * cam[:, 1] / z + K[1, 2]
    valid = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    return np.stack([u, v], -1), z, valid


def colorize_points(points_vehicle: np.ndarray,
                    images: dict[int, np.ndarray],
                    intrinsics: dict[int, np.ndarray],
                    cam2vehicles: dict[int, np.ndarray]
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-point rgb from the first camera covering it (cameras tried in
    dict order, i.e. FRONT first like the reference). Returns (rgb [N,3]
    in [0,1], mask [N] colorized)."""
    n = len(points_vehicle)
    rgb = np.zeros((n, 3), np.float32)
    done = np.zeros(n, bool)
    for cam, img in images.items():
        H, W = img.shape[:2]
        uv, _, valid = project_points_to_camera(
            points_vehicle, intrinsics[cam], cam2vehicles[cam], H, W)
        take = valid & ~done
        ui = np.clip(uv[take, 0].astype(int), 0, W - 1)
        vi = np.clip(uv[take, 1].astype(int), 0, H - 1)
        rgb[take] = img[vi, ui][..., :3]
        done |= take
    return rgb, done


def scatter_min_depth(points_vehicle: np.ndarray, K: np.ndarray,
                      cam2vehicle: np.ndarray, H: int, W: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Sparse z-buffer depth map: (value [M], mask [H, W]) in the
    compressed npz layout the readers consume (lidar/depth/*.npz,
    waymo_readers.py:127-134)."""
    uv, z, valid = project_points_to_camera(points_vehicle, K, cam2vehicle,
                                            H, W)
    depth = np.full((H, W), np.inf, np.float32)
    ui = uv[valid, 0].astype(int)
    vi = uv[valid, 1].astype(int)
    np.minimum.at(depth, (vi, ui), z[valid].astype(np.float32))
    mask = np.isfinite(depth)
    return depth[mask], mask


def points_in_box(points: np.ndarray, center: np.ndarray, heading: float,
                  lwh: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """In-box mask in the vehicle frame (box_utils analog): box is centered
    at `center`, yawed by `heading`, dims (length, width, height)."""
    c, s = np.cos(-heading), np.sin(-heading)
    local = (points - center) @ np.array([[c, -s, 0], [s, c, 0],
                                          [0, 0, 1.0]]).T
    half = np.asarray(lwh) * scale / 2.0
    return (np.abs(local) <= half).all(axis=-1)
