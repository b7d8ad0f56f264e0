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
