"""PandaSet offline LiDAR condition rendering (incl. lane shifts).

The pandaset_render_lidar_pcd.py analog (:30-240): aggregate per-frame
world-frame background clouds + canonical actor clouds over ±delta frames,
pose actors by timestamp-interpolated instance poses (in-box filter in the
canonical frame), laterally shift the camera c2w, z-buffer-splat, and write
``lidar_forward/color_render[_shift_{s:.2f}]/{frame:03d}_{cam}.png`` (+mask)
plus a preview video.

CLI: python -m street_crafter_tpu.data_processor.pandaset \
    --root DATA_ROOT --scenes 001 011 [--cams 0] [--shifts 0 2 3]
"""

from __future__ import annotations

import os
import types

import numpy as np

from ..datasets import pandaset_layout as layout
from ..utils.ply import read_ply
from .range_images import points_in_box


def read_lidar_ply(lidar_dir: str) -> dict:
    """Per-frame world-frame background + canonical actor clouds
    (pandaset_render_lidar_pcd.py:32-71)."""
    out: dict = {"background": {}}
    bkgd_dir = os.path.join(lidar_dir, "background")
    for name in sorted(os.listdir(bkgd_dir)):
        if not name.endswith(".ply"):
            continue
        frame = layout.image_filename_to_frame(name)
        pc = read_ply(os.path.join(bkgd_dir, name))
        m = pc.mask if pc.mask is not None else np.ones(len(pc.points), bool)
        rgb = pc.colors[m] if pc.colors is not None else \
            np.full((int(m.sum()), 3), 0.5, np.float32)
        out["background"][frame] = np.concatenate([pc.points[m], rgb], -1)

    actor_dir = os.path.join(lidar_dir, "actor")
    if os.path.isdir(actor_dir):
        for tid in os.listdir(actor_dir):
            per = {}
            tdir = os.path.join(actor_dir, tid)
            for name in sorted(os.listdir(tdir)):
                if not name.endswith(".ply") or name == "full.ply":
                    continue
                frame = layout.image_filename_to_frame(name)
                pc = read_ply(os.path.join(tdir, name))
                m = pc.mask if pc.mask is not None else \
                    np.ones(len(pc.points), bool)
                if m.sum() == 0:
                    continue
                rgb = pc.colors[m] if pc.colors is not None else \
                    np.full((int(m.sum()), 3), 0.5, np.float32)
                per[frame] = np.concatenate([pc.points[m], rgb], -1)
            out[tid] = per
    return out


def make_lidar_ply(ply_dict: dict, start: int, end: int) -> dict:
    out = {}
    bkgd = [ply_dict["background"][f] for f in range(start, end + 1)
            if f in ply_dict["background"]]
    out["background"] = np.concatenate(bkgd)
    for tid, per in ply_dict.items():
        if tid == "background":
            continue
        plys = [per[f] for f in range(start, end + 1) if f in per]
        if plys:
            out[tid] = np.concatenate(plys)
    return out


def pose_actor_ply(ply: np.ndarray, obj_info: dict) -> np.ndarray:
    """In-box filter (canonical frame) then transform to world
    (pandaset_render_lidar_pcd.py:107-124)."""
    pose, box = obj_info["pose"], obj_info["box"]
    xyz, rgb = ply[:, :3], ply[:, 3:]
    # box_size order is (length, width, height) in the canonical frame
    inside = points_in_box(xyz, np.zeros(3), 0.0, np.asarray(box))
    xyz, rgb = xyz[inside], rgb[inside]
    xyz = xyz @ pose[:3, :3].T + pose[:3, 3]
    return np.concatenate([xyz, rgb], -1)


def render_scene_conditions(datadir: str,
                            cams: list[int] = (0,),
                            shifts: list[float] = (0.0, 2.0, 3.0),
                            delta_frames: int = 10,
                            scale: float = 0.01,
                            skip_existing: bool = True,
                            save_video_preview: bool = True) -> None:
    from .pointcloud import PointCloudProcessor
    timestamps = layout.load_timestamps(datadir)
    cam_poses, intrinsics = layout.load_camera_info(datadir)
    frame_instances, instances_info = layout.load_track(datadir)
    lidar_dir = os.path.join(datadir, "lidar_forward")
    ply_dict = read_lidar_ply(lidar_dir)
    num_frames = cam_poses.shape[0]
    scene_idx = os.path.basename(os.path.normpath(datadir))
    sign = layout.LANE_SHIFT_SIGN[scene_idx]
    box_timestamps = timestamps[layout.CAM2NAME[0]]

    splatter = PointCloudProcessor.__new__(PointCloudProcessor)  # only _splat

    import imageio.v2 as imageio
    from ..datasets.waymo import png_size
    for cam in cams:
        cam_ts = timestamps[layout.CAM2NAME[cam]]
        K = intrinsics[cam]
        img0 = os.path.join(datadir, "images", f"{0:03d}_{cam}.png")
        if os.path.exists(img0):
            img_w, img_h = png_size(img0)
        else:
            img_h, img_w = layout.IMAGE_HEIGHT, layout.IMAGE_WIDTH
        for shift in sorted(set(float(s) for s in shifts)):
            tag = "color_render" if shift == 0 else \
                f"color_render_shift_{shift:.2f}"
            save_dir = os.path.join(lidar_dir, tag)
            os.makedirs(save_dir, exist_ok=True)
            preview = []
            for frame in range(num_frames):
                rgb_path = os.path.join(save_dir, f"{frame:03d}_{cam}.png")
                mask_path = os.path.join(save_dir,
                                         f"{frame:03d}_{cam}_mask.png")
                if skip_existing and os.path.exists(rgb_path) \
                        and os.path.exists(mask_path):
                    continue
                start = max(0, frame - delta_frames)
                end = min(num_frames - 1, frame + delta_frames)
                agg = make_lidar_ply(ply_dict, start, end)
                parts = [agg.pop("background")]
                for tid, ply in agg.items():
                    info = instances_info[str(tid)]["frame_annotations"]
                    obj = layout.get_obj_info(info, box_timestamps,
                                              cam_ts[frame])
                    if obj is None:
                        continue
                    parts.append(pose_actor_ply(ply, obj))
                ply = np.concatenate(parts)

                c2w = cam_poses[frame, cam].copy()
                direction = layout.get_lane_shift_direction(
                    cam_poses, cam, frame)
                c2w[:2, 3] += sign * shift * direction[:2]

                camera = types.SimpleNamespace(
                    c2w=c2w, K=K, height=img_h, width=img_w)
                rgb, acc = splatter._splat(ply, camera, scale,
                                           use_ndc_scale=True)
                imageio.imwrite(rgb_path, (rgb * 255).astype(np.uint8))
                imageio.imwrite(mask_path, (acc * 255).astype(np.uint8))
                preview.append((rgb * 255).astype(np.uint8))
            if save_video_preview and preview:
                from ..visualizers import save_video
                save_video(os.path.join(save_dir, f"render_rgb_{cam}.mp4"),
                           preview)


def prepare_meta(root_dir: str, scene_names: list[str],
                 save_name: str = "meta_info_train.json",
                 num_frames: int = 25, stride: int = 5,
                 cam: int = 0, shifts: list[float] | None = None) -> str:
    """pandaset_prepare_meta.py analog: 25-frame windows over
    lidar_forward/color_render*."""
    import json
    metas = []
    for scene in scene_names:
        scene_dir = os.path.join(root_dir, scene)
        image_dir = os.path.join(scene_dir, "images")
        total = len([f for f in os.listdir(image_dir)
                     if f.endswith(f"_{cam}.png")])
        render_dirs = ["color_render"]
        if shifts:
            render_dirs += [f"color_render_shift_{s:.2f}" for s in shifts]
        for rd in render_dirs:
            lidar_dir = os.path.join(scene_dir, "lidar_forward", rd)
            if not os.path.isdir(lidar_dir):
                continue
            for start in range(0, total, stride):
                end = start + num_frames
                if end >= total:
                    continue
                sample = {"frames": [], "guidances": [], "guidances_mask": []}
                ok = True
                for f in range(start, end):
                    img = os.path.join(image_dir, f"{f:03d}_{cam}.png")
                    gd = os.path.join(lidar_dir, f"{f:03d}_{cam}.png")
                    gm = os.path.join(lidar_dir, f"{f:03d}_{cam}_mask.png")
                    if not all(map(os.path.exists, (img, gd, gm))):
                        ok = False
                        break
                    sample["frames"].append(os.path.relpath(img, root_dir))
                    sample["guidances"].append(os.path.relpath(gd, root_dir))
                    sample["guidances_mask"].append(
                        os.path.relpath(gm, root_dir))
                if ok:
                    metas.append(sample)
    out = os.path.join(root_dir, save_name)
    with open(out, "w") as f:
        json.dump(metas, f, indent=1)
    return out


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="pandaset condition render")
    p.add_argument("--root", required=True)
    p.add_argument("--scenes", nargs="+", required=True)
    p.add_argument("--cams", nargs="+", type=int, default=[0])
    p.add_argument("--shifts", nargs="+", type=float, default=[0.0, 2.0, 3.0])
    p.add_argument("--delta-frames", type=int, default=10)
    p.add_argument("--force", action="store_true")
    args = p.parse_args(argv)
    for scene in args.scenes:
        render_scene_conditions(
            os.path.join(args.root, scene), cams=args.cams,
            shifts=args.shifts, delta_frames=args.delta_frames,
            skip_existing=not args.force)


if __name__ == "__main__":
    main()
