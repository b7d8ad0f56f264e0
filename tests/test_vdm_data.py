"""VDM data pipeline: meta prep, clip dataset, multi-source sampler, and a
short fine-tune through the driver on the 8-device CPU mesh."""

import json
import os

import numpy as np
import pytest

from street_crafter_tpu.config import default_config
from street_crafter_tpu.datasets.vdm_data import (
    ClipDataset, MultiSourceSampler, prepare_meta)
from tests.synthetic_scene import make_scene


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vdm_data"))
    scene_dir = make_scene(root, num_frames=8, scene_name="016")
    # render LiDAR conditions for cam 0 (what prepare_meta indexes)
    from street_crafter_tpu.data_processor import get_pointcloud_processor
    from street_crafter_tpu.datasets.waymo import read_waymo_scene
    info = read_waymo_scene(scene_dir, cameras=[0], use_novel_view_cameras=False)
    proc = get_pointcloud_processor("waymo", scene_dir, cameras=[0],
                                    selected_frames=(0, 7))
    proc.render_conditions(info.train_cameras, info.metadata["obj_meta"])
    return root


def test_prepare_meta_and_dataset(data_root):
    path = prepare_meta(data_root, ["016"], num_frames=4, stride=2)
    metas = json.load(open(path))
    # frames 0..7, windows of 4 at stride 2 with end < total: starts 0,2
    assert len(metas) == 2
    assert len(metas[0]["frames"]) == 4
    assert all(os.path.exists(os.path.join(data_root, p))
               for p in metas[0]["frames"] + metas[0]["guidances"]
               + metas[0]["guidances_mask"])

    ds = ClipDataset(data_root, split="train", target_height=24,
                     target_width=48, num_frames=4)
    item = ds[0]
    assert item["img_seq"].shape == (4, 24, 48, 3)
    assert item["guide_seq"].shape == (4, 24, 48, 3)
    assert -1.0 <= item["img_seq"].min() and item["img_seq"].max() <= 1.0
    np.testing.assert_allclose(item["cond_frames_without_noise"],
                               item["img_seq"][0])

    sampler = MultiSourceSampler([ds], batch_size=2, samples_per_epoch=3)
    batches = list(sampler)
    assert len(batches) == 3
    assert batches[0]["img_seq"].shape == (2, 4, 24, 48, 3)
    # process-pool decode (num_workers, the DataLoader-workers analog)
    # yields the SAME batch sequence: sampling stays in the parent rng
    workers = MultiSourceSampler([ds], batch_size=2, samples_per_epoch=3,
                                 num_workers=2)
    wbatches = list(workers)
    assert len(wbatches) == 3
    for a, b in zip(batches, wbatches):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_vdm_finetune_driver(data_root, tmp_path):
    prepare_meta(data_root, ["016"], num_frames=4, stride=2)
    cfg = default_config()
    cfg.model_path = str(tmp_path / "vdm_model")
    cfg.diffusion.tiny = True
    cfg.diffusion.num_steps = 2
    cfg.vdm_train.merge({
        "data_root": data_root, "subsets": ["waymo"], "probs": [1.0],
        "batch_size": 8, "samples_per_epoch": 2, "epochs": 1,
        "height": 16, "width": 32, "num_frames": 4,
        "ckpt_every": 2, "log_every": 1,
        "log_images_every": 2, "log_images_steps": 2})
    from street_crafter_tpu.runner.vdm_train import finetune
    finetune(cfg)
    assert os.path.isdir(os.path.join(cfg.model_path, "checkpoints",
                                      "iteration_2"))
    assert os.path.isdir(os.path.join(cfg.model_path, "ema_params"))
    # ImageLogger analog dumped inputs/targets/samples videos at step 2
    log_dir = os.path.join(cfg.model_path, "image_log", "step_00000002")
    names = os.listdir(log_dir)
    for stem in ("inputs", "targets", "samples"):
        assert any(n.startswith(stem) for n in names), (stem, names)


def test_vista_legacy_subsets(tmp_path):
    """YouTube + nuScenes anno-file subsets (vwm/data/subsets/{youtube,
    nuscenes}.py): frame indexing, center crop, action-mod rotation,
    balance/resample duplication."""
    import imageio.v2 as imageio
    from street_crafter_tpu.datasets.vdm_data import (
        NuScenesClipDataset, YouTubeClipDataset, balance_with_actions,
        resample_complete_samples)

    root = tmp_path / "vista"
    (root / "clip0").mkdir(parents=True)
    T = 3
    for i in range(T):
        img = np.full((40, 60, 3), 40 * (i + 1), np.uint8)
        imageio.imwrite(root / "clip0" / f"{i:04d}.png", img)
        imageio.imwrite(root / f"nu_{i}.png", img)

    yt_anno = root / "yt.json"
    yt_anno.write_text(json.dumps(
        [{"folder_name": "clip0", "first_frame": "0000.png"}]))
    ds = YouTubeClipDataset(str(root), str(yt_anno), target_height=32,
                            target_width=64, num_frames=T)
    item = ds[0]
    assert item["img_seq"].shape == (T, 32, 64, 3)
    # frame 0 gray level 40 -> [-1,1]: 2*40/255-1
    np.testing.assert_allclose(item["img_seq"][0].mean(),
                               2 * 40 / 255 - 1, atol=1e-2)
    assert "guide_seq" not in item

    nu_sample = {"frames": [f"nu_{i}.png" for i in range(T)],
                 "cmd": 0, "traj": [0.0] * 10,
                 "speed": [1.0] * T, "angle": [78.0] * T,
                 "z": 1.0, "goal": [800.0, 450.0]}
    nu_anno = root / "nu.json"
    nu_anno.write_text(json.dumps([nu_sample]))
    ds = NuScenesClipDataset(str(root), str(nu_anno), target_height=32,
                             target_width=64, num_frames=T,
                             balance_factor=2, resample_factor=2)
    # 1 sample -> balance x2 (cmd 0 not in exceptions) -> resample x2 = 4
    assert len(ds) == 4
    mods = set()
    for i in range(4):
        item = ds[i]
        for k in ("trajectory", "command", "speed", "goal"):
            if k in item:
                mods.add(k)
    assert mods  # at least one action mode attached
    it0 = ds[0]
    assert it0["img_seq"].shape == (T, 32, 64, 3)

    # helper semantics match the reference exactly
    s = [{"cmd": 2}, {"cmd": 0}]
    assert len(balance_with_actions(s, increase_factor=3)) == 4
    s2 = [dict(nu_sample), {**nu_sample, "z": -1.0}]
    assert len(resample_complete_samples(s2, increase_factor=2)) == 3
