"""Predicted-pointcloud extraction from a monocular geometry model.

waymo_get_moge_pcd.py analog (data_processor/waymo_processor/
waymo_get_moge_pcd.py:19-204): run a MoGe-style monocular geometry predictor
on the front-camera images, align the predicted affine-invariant depth to
the sparse LiDAR depth with a weighted linear fit, transform the aligned
points to the vehicle frame, split in-bbox points into per-actor canonical
plys, and write the rest as per-frame ``moge/background/{frame:06d}.ply``.

The predictor itself is injectable (the SAM/GroundingDINO pattern of
data_processor/sky_mask.py): pass any callable
``predict(image_f32[H,W,3], fov_x_deg) -> {"points": [h,w,3] cam-frame,
"depth": [h,w], "mask": [h,w] bool}`` — the real MoGe backend
(``moge_predictor()``) is import-gated since neither torch weights nor the
``moge`` package ship in this image. The alignment / bbox-splitting math is
native and fixture-tested.

CLI: python -m street_crafter_tpu.data_processor.moge_pcd \
    --data_dir DIR [--skip_existing]
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from ..datasets import waymo_layout
from ..utils.ply import write_ply

Predictor = Callable[[np.ndarray, float], dict]


def recover_metric_depth(pred: np.ndarray, gt: np.ndarray,
                         valid: np.ndarray | None) -> tuple[np.ndarray, float, float]:
    """Affine-align predicted depth to sparse metric gt: weighted (1/gt)
    linear fit gt ≈ a*pred + b (waymo_get_moge_pcd.py:19-41). Falls back to
    mean-ratio scaling when the fitted slope is non-positive."""
    mask = gt > 1e-8
    if valid is not None and valid.sum() > 0:
        mask = mask & (valid > 0)
    gt_m = gt[mask]
    pred_m = pred[mask]
    if gt_m.size < 2:
        return pred, 1.0, 0.0
    try:
        a, b = np.polyfit(x=pred_m, y=gt_m, w=1.0 / gt_m, deg=1)
    except Exception:
        a, b = 1.0, 0.0
    if a > 0:
        return a * pred + b, float(a), float(b)
    scale = float(np.mean(gt_m) / max(np.mean(pred_m), 1e-12))
    return pred * scale, scale, 0.0


def _area_resize(img: np.ndarray, expected_area: int = 700 * 700) -> np.ndarray:
    """Resize so h*w ≈ expected_area, preserving aspect (the reference's
    bicubic resize, :89-94). Uses PIL (ships with imageio)."""
    from PIL import Image
    h, w = img.shape[:2]
    s = (expected_area / (h * w)) ** 0.5
    nh, nw = int(h * s), int(w * s)
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    out = np.asarray(pil.resize((nw, nh), Image.BICUBIC), np.float32) / 255.0
    return np.clip(out, 0.0, 1.0)


def _bilinear_resize_depth(depth: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Bilinear depth upsample back to the original resolution (:100-101)."""
    from PIL import Image
    pil = Image.fromarray(depth.astype(np.float32), mode="F")
    return np.asarray(pil.resize((shape[1], shape[0]), Image.BILINEAR),
                      np.float32)


def _in_canonical_bbox(pts: np.ndarray, length: float, width: float,
                       height: float) -> np.ndarray:
    """Axis-aligned box test in the actor canonical frame (box_utils
    bbox_to_corner3d + inbbox_points reduce to this for axis-aligned
    boxes)."""
    half = np.array([length, width, height]) * 0.5
    return np.all(np.abs(pts) <= half, axis=-1)


def moge_predictor(device: str = "cuda") -> Predictor:
    """The real MoGe backend (import-gated; reference :15-16,97-98)."""
    try:
        import torch
        from moge.model import MoGeModel
    except ImportError as e:  # pragma: no cover - not shipped in this image
        raise ImportError(
            "MoGe backend needs the `moge` package + weights "
            "(Ruicheng/moge-vitl); install on the preprocessing host or "
            "inject a predictor callable") from e
    model = MoGeModel.from_pretrained("Ruicheng/moge-vitl").to(device)

    def predict(image: np.ndarray, fov_x: float) -> dict:
        t = torch.tensor(image).float().to(device).permute(2, 0, 1)[None]
        out = model.infer(t, fov_x=fov_x)
        return {"points": out["points"][0].cpu().numpy(),
                "depth": out["depth"][0].cpu().numpy(),
                "mask": out["mask"][0].cpu().numpy().astype(bool)}

    return predict


def save_moge_pcd(scene_dir: str, predictor: Predictor,
                  expected_area: int = 700 * 700) -> None:
    """Process one scene directory (waymo_get_moge_pcd.py:43-177)."""
    track_info, _, trajectory = waymo_layout.load_track(scene_dir)
    intrinsics, extrinsics, _, _ = waymo_layout.load_camera_info(scene_dir)
    image_dir = os.path.join(scene_dir, "images")
    depth_dir = os.path.join(scene_dir, "lidar", "depth")
    lidar_actor_dir = os.path.join(scene_dir, "lidar", "actor")
    num_frames = len([x for x in os.listdir(image_dir)
                      if x.endswith(".png")]) // 5

    moge_dir = os.path.join(scene_dir, "moge")
    bkgd_dir = os.path.join(moge_dir, "background")
    actor_dir = os.path.join(moge_dir, "actor")
    os.makedirs(bkgd_dir, exist_ok=True)

    # dynamic non-sign actors only (:66-73)
    acc: dict[str, dict[str, list]] = {}
    for tid, traj in trajectory.items():
        if not traj["stationary"] and traj["label"] != "sign":
            os.makedirs(os.path.join(actor_dir, tid), exist_ok=True)
            acc[tid] = {"xyz": [], "rgb": [], "mask": []}

    K = np.asarray(intrinsics[0])
    cam2ego = np.asarray(extrinsics[0])
    import imageio.v2 as imageio
    for frame in range(num_frames):
        img = np.asarray(imageio.imread(
            os.path.join(image_dir, f"{frame:06d}_0.png")),
            np.float32)[..., :3] / 255.0
        orig_h, orig_w = img.shape[:2]
        ld = np.load(os.path.join(depth_dir, f"{frame:06d}_0.npz"))
        gt_depth = np.zeros((orig_h, orig_w), np.float32)
        gt_depth[ld["mask"].astype(bool)] = ld["value"].astype(np.float32)

        small = _area_resize(img, expected_area)
        fov_x = float(2 * np.arctan(0.5 * orig_w / K[0, 0]) / np.pi * 180)
        out = predictor(small, fov_x)

        pred_depth = _bilinear_resize_depth(np.asarray(out["depth"]),
                                            (orig_h, orig_w))
        valid = ~(np.isnan(pred_depth) | np.isinf(pred_depth))
        _, a, b = recover_metric_depth(pred_depth, gt_depth, valid)

        pts = np.asarray(out["points"], np.float32).reshape(-1, 3) * a + b
        rgbs = small.reshape(-1, 3)
        keep = np.asarray(out["mask"]).reshape(-1)
        pts, rgbs = pts[keep], rgbs[keep]
        # camera -> vehicle frame (:113)
        pts = pts @ cam2ego[:3, :3].T + cam2ego[:3, 3]

        actor_mask = np.zeros(len(pts), bool)
        for tid, info in track_info[f"{frame:06d}"].items():
            if tid not in acc or not os.path.exists(
                    os.path.join(lidar_actor_dir, tid, f"{frame:06d}.ply")):
                continue
            box = info["lidar_box"]
            pose_idx = trajectory[tid]["frames"].index(frame)
            pose_vehicle = trajectory[tid]["poses_vehicle"][pose_idx]
            inv = np.linalg.inv(pose_vehicle)
            canon = pts @ inv[:3, :3].T + inv[:3, 3]
            inb = _in_canonical_bbox(canon, box["length"], box["width"],
                                     box["height"])
            actor_mask |= inb
            if inb.sum() > 10:
                xyz_c, rgb_c = canon[inb], rgbs[inb]
                acc[tid]["xyz"].append(xyz_c)
                acc[tid]["rgb"].append(rgb_c)
                acc[tid]["mask"].append(np.ones(len(xyz_c), bool))
                write_ply(os.path.join(actor_dir, tid, f"{frame:06d}.ply"),
                          xyz_c, rgb_c, np.ones(len(xyz_c), bool))

        write_ply(os.path.join(bkgd_dir, f"{frame:06d}.ply"),
                  pts[~actor_mask], rgbs[~actor_mask],
                  np.ones((~actor_mask).sum(), bool))

    for tid, pc in acc.items():
        if pc["xyz"]:
            write_ply(os.path.join(actor_dir, tid, "full.ply"),
                      np.concatenate(pc["xyz"]), np.concatenate(pc["rgb"]),
                      np.concatenate(pc["mask"]))


def check_existing(scene_dir: str) -> bool:
    """Skip scenes whose moge/background is complete (:181-189)."""
    image_dir = os.path.join(scene_dir, "images")
    bkgd = os.path.join(scene_dir, "moge", "background")
    if not os.path.isdir(bkgd):
        return False
    return len(os.listdir(image_dir)) // 5 == len(os.listdir(bkgd))


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="MoGe predicted pcd extraction")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--skip_existing", action="store_true")
    args = p.parse_args(argv)
    predictor = moge_predictor()
    for sid in sorted(os.listdir(args.data_dir)):
        scene = os.path.join(args.data_dir, sid)
        if args.skip_existing and check_existing(scene):
            print(f"moge pcd exists for {sid}, skipping")
            continue
        print(f"processing {sid}")
        save_moge_pcd(scene, predictor)


if __name__ == "__main__":
    main()
