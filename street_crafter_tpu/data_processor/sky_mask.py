"""Sky-mask generation.

The generate_sky_mask.py analog (data_processor/waymo_processor/
generate_sky_mask.py:34-150: GroundingDINO boxes + SAM segmentation on the
prompt "sky"). Two backends:

- ``sam``: GroundingDINO + segment-anything, exactly like the reference —
  import-gated (neither ships in this image; install on the preprocessing
  host).
- ``heuristic``: dependency-free fallback — flood-fill connected bright,
  low-texture regions from the top image border. Coarser than SAM but lets
  the full pipeline (sky gaussian init + sky losses) run end to end.

CLI: python -m street_crafter_tpu.data_processor.sky_mask \
    --scene SCENE_DIR [--method heuristic] [--cams 0 1 2]
"""

from __future__ import annotations

import os

import numpy as np


def heuristic_sky_mask(img: np.ndarray, brightness_thresh: float = 0.45,
                       grad_thresh: float = 0.06) -> np.ndarray:
    """[H, W, 3] float in [0,1] -> bool mask. Sky = bright, low-gradient
    pixels connected to the top border (BFS flood fill on a candidate
    grid)."""
    gray = img.mean(-1)
    gy = np.abs(np.diff(gray, axis=0, prepend=gray[:1]))
    gx = np.abs(np.diff(gray, axis=1, prepend=gray[:, :1]))
    smooth = (gx + gy) < grad_thresh
    bright = gray > brightness_thresh
    cand = smooth & bright

    H, W = cand.shape
    mask = np.zeros_like(cand)
    # iterative row-sweep flood fill from the top border (no scipy needed)
    frontier = cand[0].copy()
    mask[0] = frontier
    for _ in range(2):  # down sweep + one up-down pass for concave regions
        for y in range(1, H):
            grow = cand[y] & (mask[y - 1] | np.roll(mask[y - 1], 1)
                              | np.roll(mask[y - 1], -1) | mask[y])
            # horizontal propagation within the row
            prev = np.zeros(W, bool)
            while not np.array_equal(prev, grow):
                prev = grow
                grow = cand[y] & (grow | np.roll(grow, 1)
                                  | np.roll(grow, -1) | mask[y - 1])
            mask[y] |= grow
        for y in range(H - 2, -1, -1):
            grow = cand[y] & (mask[y + 1] | mask[y])
            mask[y] |= grow
    return mask


def sam_sky_mask(img: np.ndarray, detect_fn, segment_fn,
                 box_threshold: float = 0.3, text_threshold: float = 0.25,
                 top_edge_px: int = 100) -> np.ndarray:
    """GroundingDINO "sky" boxes -> SAM masks, the reference orchestration
    (generate_sky_mask.py:105-152):

    - ``detect_fn(img_u8, caption, box_threshold, text_threshold)`` returns
      normalized cxcywh boxes [N, 4] (GroundingDINO predict contract);
    - boxes are converted to pixel xyxy and filtered to those whose TOP edge
      is within ``top_edge_px`` of the image top (the reference's sky-box
      prior, :126-128);
    - ``segment_fn(img_u8, boxes_xyxy_px)`` returns [N, H, W] masks (SAM
      predict_torch contract) which are OR-merged; no boxes -> all-zero.

    The callables are injected so the pipeline is testable with fixture
    predictors; ``build_sam_backend`` constructs the real (import-gated)
    pair.
    """
    H, W = img.shape[:2]
    boxes = np.asarray(detect_fn(img, "sky", box_threshold, text_threshold),
                       np.float32).reshape(-1, 4)
    if boxes.shape[0]:
        cx, cy, bw, bh = boxes.T
        xyxy = np.stack([cx - bw / 2, cy - bh / 2,
                         cx + bw / 2, cy + bh / 2], -1)
        xyxy = xyxy * np.array([W, H, W, H], np.float32)
        xyxy = xyxy[xyxy[:, 1] < top_edge_px]
    else:
        xyxy = np.zeros((0, 4), np.float32)
    if xyxy.shape[0] == 0:
        return np.zeros((H, W), bool)
    masks = np.asarray(segment_fn(img, xyxy))
    mask = np.zeros((H, W), bool)
    for m in masks.reshape(-1, H, W):
        mask |= m.astype(bool)
    return mask


def build_sam_backend(sam_checkpoint: str,
                      dino_repo: str = "ShilongLiu/GroundingDINO",
                      dino_ckpt: str = "groundingdino_swinb_cogcoor.pth",
                      dino_cfg: str = "GroundingDINO_SwinB.cfg.py",
                      device: str = "cpu"):
    """Real (detect_fn, segment_fn) pair — import-gated: groundingdino and
    segment-anything do not ship in this image; install them on the
    preprocessing host (generate_sky_mask.py:34-66)."""
    try:
        import torch
        from groundingdino.models import build_model
        from groundingdino.util.inference import load_image, predict
        from groundingdino.util.slconfig import SLConfig
        from groundingdino.util.utils import clean_state_dict
        from huggingface_hub import hf_hub_download
        from segment_anything import SamPredictor, build_sam
    except ImportError as e:
        raise ImportError(
            "the SAM sky-mask backend needs groundingdino + "
            f"segment-anything; missing: {e.name}. Use --method heuristic "
            "or install them on the preprocessing host.") from e

    cfg_file = hf_hub_download(repo_id=dino_repo, filename=dino_cfg)
    model = build_model(SLConfig.fromfile(cfg_file))
    ckpt = torch.load(hf_hub_download(repo_id=dino_repo, filename=dino_ckpt),
                      map_location="cpu")
    model.load_state_dict(clean_state_dict(ckpt["model"]), strict=False)
    model.eval()
    sam = build_sam(checkpoint=sam_checkpoint).to(device)
    predictor = SamPredictor(sam)

    def detect_fn(img_u8, caption, box_threshold, text_threshold):
        import groundingdino.datasets.transforms as T
        from PIL import Image
        tf = T.Compose([T.RandomResize([800], max_size=1333), T.ToTensor(),
                        T.Normalize([0.485, 0.456, 0.406],
                                    [0.229, 0.224, 0.225])])
        timg, _ = tf(Image.fromarray(img_u8), None)
        boxes, _, _ = predict(model=model, image=timg, caption=caption,
                              box_threshold=box_threshold,
                              text_threshold=text_threshold, device=device)
        return boxes.cpu().numpy()

    def segment_fn(img_u8, boxes_xyxy):
        predictor.set_image(img_u8)
        tb = predictor.transform.apply_boxes_torch(
            torch.as_tensor(boxes_xyxy), img_u8.shape[:2]).to(device)
        masks, _, _ = predictor.predict_torch(
            point_coords=None, point_labels=None, boxes=tb,
            multimask_output=False)
        return masks[:, 0].cpu().numpy()

    return detect_fn, segment_fn


def generate_scene_sky_masks(scene_dir: str, cams=(0, 1, 2),
                             method: str = "heuristic",
                             skip_existing: bool = True,
                             sam_backend=None,
                             box_thresholds=None, **kw) -> int:
    """``box_thresholds``: per-cam box threshold list (the reference CLI's
    --box_threshold, one value or one per camera). ``sam_backend``: a
    (detect_fn, segment_fn) pair — from build_sam_backend or a test
    fixture."""
    import imageio.v2 as imageio
    from ..datasets.waymo_layout import image_filename_to_cam
    img_dir = os.path.join(scene_dir, "images")
    out_dir = os.path.join(scene_dir, "sky_mask")
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(img_dir)):
        if not name.endswith(".png") or image_filename_to_cam(name) not in cams:
            continue
        out = os.path.join(out_dir, name)
        if skip_existing and os.path.exists(out):
            continue
        raw = np.asarray(imageio.imread(os.path.join(img_dir, name)))[..., :3]
        if method == "heuristic":
            mask = heuristic_sky_mask(raw.astype(np.float32) / 255.0, **kw)
        else:
            cam = image_filename_to_cam(name)
            bt = 0.3
            if box_thresholds:
                bt = (box_thresholds[cam] if len(box_thresholds) > cam
                      else box_thresholds[0])
            mask = sam_sky_mask(raw.astype(np.uint8), *sam_backend,
                                box_threshold=bt, **kw)
        imageio.imwrite(out, (mask * 255).astype(np.uint8))
        count += 1
    return count


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="sky mask generation")
    p.add_argument("--scene", required=True)
    p.add_argument("--cams", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--method", choices=["heuristic", "sam"],
                   default="heuristic")
    p.add_argument("--force", action="store_true")
    p.add_argument("--sam_checkpoint", default="")
    p.add_argument("--box_threshold", nargs="+", type=float, default=[0.3])
    args = p.parse_args(argv)
    backend = None
    if args.method == "sam":
        backend = build_sam_backend(args.sam_checkpoint)
    n = generate_scene_sky_masks(args.scene, cams=args.cams,
                                 method=args.method, sam_backend=backend,
                                 box_thresholds=args.box_threshold,
                                 skip_existing=not args.force)
    print(f"wrote {n} masks")


if __name__ == "__main__":
    main()
