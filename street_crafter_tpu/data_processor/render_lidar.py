"""Offline LiDAR condition rendering (incl. lane shifts).

The waymo_render_lidar_pcd.py analog (:164-304): for every (camera, shift,
frame), aggregate the colorized LiDAR cloud over ±delta frames, pose actors
with the per-frame box (camera-synced box at shift 0 to align with training
images, lidar box otherwise), laterally shift the per-camera ego pose, and
z-buffer-splat into the camera — writing rgb+mask condition pngs to
``lidar/color_render[_shift_{s:.2f}]`` plus a preview video per (cam, shift).

The splat runs the XLA point kernel with power-of-two padding (one compile
per camera resolution). Scenes fan out over a process pool
(multiprocess_utils.track_parallel_progress analog).

CLI: python -m street_crafter_tpu.data_processor.render_lidar \
    --root DATA_ROOT --scenes 016 049 [--cams 0] [--shifts 0 2 3]
"""

from __future__ import annotations

import os
import types

import numpy as np

from ..datasets import waymo_layout as layout
from .pointcloud import WaymoPointCloudProcessor


def _box_pose(box: dict) -> np.ndarray:
    c, s = np.cos(box["heading"]), np.sin(box["heading"])
    pose = np.eye(4)
    pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    pose[:3, 3] = [box["center_x"], box["center_y"], box["center_z"]]
    return pose


def render_scene_conditions(datadir: str,
                            cams: list[int] = (0,),
                            shifts: list[float] = (0.0, 2.0, 3.0),
                            delta_frames: int = 10,
                            scale: float = 0.01,
                            skip_existing: bool = True,
                            save_video_preview: bool = True) -> None:
    """Render all condition images for one scene (render_one,
    waymo_render_lidar_pcd.py:164-282)."""
    proc = WaymoPointCloudProcessor(datadir, cameras=list(cams),
                                    delta_frames=delta_frames)
    num_frames = len(proc.ego_frame_poses)
    scene_idx = os.path.basename(os.path.normpath(datadir))
    sign = layout.LANE_SHIFT_SIGN[scene_idx]

    for cam in cams:
        H, W = proc._image_size(cam)
        K = proc.intrinsics[cam]
        for shift in sorted(set(float(s) for s in shifts)):
            tag = "color_render" if shift == 0 else \
                f"color_render_shift_{shift:.2f}"
            save_dir = os.path.join(datadir, "lidar", tag)
            os.makedirs(save_dir, exist_ok=True)
            preview = []
            for frame in range(num_frames):
                rgb_path = os.path.join(save_dir, f"{frame:06d}_{cam}.png")
                mask_path = os.path.join(save_dir,
                                         f"{frame:06d}_{cam}_mask.png")
                if skip_existing and os.path.exists(rgb_path) \
                        and os.path.exists(mask_path):
                    continue

                start = max(0, frame - delta_frames)
                end = min(num_frames - 1, frame + delta_frames)
                track_info_frame = proc.track_info[f"{frame:06d}"]
                agg = proc.make_lidar_ply(start, end,
                                          list(track_info_frame.keys()))
                parts = [agg.pop("background")]
                ego_pose = proc.ego_cam_poses[cam, frame]
                for track_id, ply in agg.items():
                    boxes = track_info_frame[track_id]
                    # camera-synced box at shift 0 aligns actors with the
                    # training images (:211-217); lidar box for novel shifts
                    box = (boxes.get("camera_box") or boxes["lidar_box"]) \
                        if shift == 0 else boxes["lidar_box"]
                    parts.append(proc.transform_lidar_ply(
                        ply, ego_pose @ _box_pose(box)))
                ply = np.concatenate(parts)

                ego_shift = ego_pose.copy()
                direction = layout.get_lane_shift_direction(
                    proc.ego_frame_poses, frame)
                ego_shift[:3, 3] += sign * direction * shift
                c2w = ego_shift @ proc.extrinsics[cam]

                camera = types.SimpleNamespace(c2w=c2w, K=K, height=H,
                                               width=W)
                rgb, acc = proc._splat(ply, camera, scale,
                                       use_ndc_scale=True)

                import imageio.v2 as imageio
                imageio.imwrite(rgb_path, (rgb * 255).astype(np.uint8))
                imageio.imwrite(mask_path, (acc * 255).astype(np.uint8))
                preview.append((rgb * 255).astype(np.uint8))

            if save_video_preview and preview:
                from ..visualizers import save_video
                save_video(os.path.join(save_dir, f"render_rgb_{cam}.mp4"),
                           preview)


def render_many(root: str, scenes: list[str], num_workers: int = 1,
                **kw) -> None:
    """Fan scenes out over processes (waymo_render_lidar_pcd.py:145-156)."""
    dirs = [os.path.join(root, s) for s in scenes]
    if num_workers <= 1:
        for d in dirs:
            print(f"rendering conditions: {d}")
            render_scene_conditions(d, **kw)
        return
    import multiprocessing as mp
    with mp.get_context("spawn").Pool(num_workers) as pool:
        pool.starmap(_render_one_kw, [(d, kw) for d in dirs])


def _render_one_kw(datadir: str, kw: dict) -> None:
    render_scene_conditions(datadir, **kw)


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="offline LiDAR condition render")
    p.add_argument("--root", required=True)
    p.add_argument("--scenes", nargs="+", required=True)
    p.add_argument("--cams", nargs="+", type=int, default=[0])
    p.add_argument("--shifts", nargs="+", type=float, default=[0.0, 2.0, 3.0])
    p.add_argument("--delta-frames", type=int, default=10)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--force", action="store_true")
    args = p.parse_args(argv)
    render_many(args.root, args.scenes, num_workers=args.workers,
                cams=args.cams, shifts=args.shifts,
                delta_frames=args.delta_frames,
                skip_existing=not args.force)


if __name__ == "__main__":
    main()
