"""Heuristic sky-mask backend."""

import numpy as np

from street_crafter_tpu.data_processor.sky_mask import (
    generate_scene_sky_masks, heuristic_sky_mask)


def _synthetic_street_image(H=60, W=80):
    img = np.zeros((H, W, 3), np.float32)
    img[: H // 3] = [0.7, 0.8, 0.95]          # bright smooth sky
    img[H // 3:] = 0.3                          # dark road
    rng = np.random.default_rng(0)
    img[H // 3:] += rng.uniform(-0.15, 0.15, (H - H // 3, W, 3))  # texture
    # a bright but textured building that must NOT be sky
    img[H // 2: H // 2 + 10, 10:25] = rng.uniform(0.5, 1.0, (10, 15, 3))
    return np.clip(img, 0, 1)


def test_heuristic_sky_mask():
    img = _synthetic_street_image()
    mask = heuristic_sky_mask(img)
    H = img.shape[0]
    assert mask[: H // 3 - 1].mean() > 0.9      # sky found
    assert mask[H // 2:].mean() < 0.05          # road/building excluded


def test_generate_scene(tmp_path):
    import imageio.v2 as imageio
    import os
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    img = (_synthetic_street_image() * 255).astype(np.uint8)
    imageio.imwrite(str(img_dir / "000000_0.png"), img)
    imageio.imwrite(str(img_dir / "000000_3.png"), img)  # cam 3 skipped
    n = generate_scene_sky_masks(str(tmp_path), cams=[0])
    assert n == 1
    out = np.asarray(imageio.imread(str(tmp_path / "sky_mask" /
                                        "000000_0.png")))
    assert (out > 0).mean() > 0.2


def test_sam_orchestration_with_fixture_predictors(tmp_path):
    """The SAM backend wiring (generate_sky_mask.py:105-152) tested with
    fixture detect/segment callables: top-edge box filter, cxcywh->xyxy
    pixel conversion, mask union, empty-box zero mask."""
    import numpy as np
    from street_crafter_tpu.data_processor.sky_mask import sam_sky_mask

    H, W = 64, 96
    img = np.zeros((H, W, 3), np.uint8)
    calls = {}

    def detect_fn(image, caption, box_th, text_th):
        calls["caption"] = caption
        calls["box_th"] = box_th
        # two boxes near the top (kept) + one mid-image (filtered: its top
        # edge is below the 100px... use a smaller top_edge for the test)
        return np.array([
            [0.25, 0.10, 0.5, 0.2],    # top-left region
            [0.75, 0.10, 0.5, 0.2],    # top-right region
            [0.5, 0.80, 0.4, 0.2],     # bottom: must be filtered
        ], np.float32)

    def segment_fn(image, boxes_xyxy):
        calls["n_boxes"] = len(boxes_xyxy)
        masks = np.zeros((len(boxes_xyxy), H, W), bool)
        for i, (x0, y0, x1, y1) in enumerate(boxes_xyxy.astype(int)):
            masks[i, max(y0, 0):y1, max(x0, 0):x1] = True
        return masks

    mask = sam_sky_mask(img, detect_fn, segment_fn, box_threshold=0.35,
                        top_edge_px=20)
    assert calls["caption"] == "sky"
    assert calls["box_th"] == 0.35
    assert calls["n_boxes"] == 2          # bottom box filtered out
    assert mask[5, W // 4] and mask[5, 3 * W // 4]
    assert not mask[int(0.8 * H), W // 2]  # bottom region untouched

    # no detections -> zero mask, segment_fn never called
    mask0 = sam_sky_mask(img, lambda *a: np.zeros((0, 4)), segment_fn)
    assert not mask0.any()


def test_scene_sky_masks_sam_backend(tmp_path):
    import imageio.v2 as imageio
    import numpy as np
    from street_crafter_tpu.data_processor.sky_mask import (
        generate_scene_sky_masks)

    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    img = (np.random.default_rng(0).random((32, 48, 3)) * 255).astype(
        np.uint8)
    imageio.imwrite(scene / "images" / "000000_0.png", img)
    imageio.imwrite(scene / "images" / "000000_1.png", img)

    seen_thresholds = []

    def detect_fn(image, caption, box_th, text_th):
        seen_thresholds.append(box_th)
        return np.array([[0.5, 0.1, 1.0, 0.2]], np.float32)

    def segment_fn(image, boxes):
        m = np.zeros((1, 32, 48), bool)
        m[0, :8] = True
        return m

    n = generate_scene_sky_masks(
        str(scene), cams=(0, 1), method="sam",
        sam_backend=(detect_fn, segment_fn),
        box_thresholds=[0.4, 0.25])
    assert n == 2
    assert sorted(seen_thresholds) == [0.25, 0.4]  # per-cam thresholds
    m = imageio.imread(scene / "sky_mask" / "000000_0.png")
    assert (m[:8] == 255).all() and (m[8:] == 0).all()
