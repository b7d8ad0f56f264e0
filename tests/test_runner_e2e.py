"""End-to-end: scene dir -> Scene -> short training run -> checkpoint ->
render_trajectory. The full-stack integration slice (SURVEY §7 milestone B)."""

import os

import numpy as np
import pytest

from street_crafter_tpu.config import default_config
from tests.synthetic_scene import make_scene


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    scene_dir = make_scene(root, num_frames=3)
    c = default_config()
    c.source_path = scene_dir
    c.model_path = os.path.join(root, "model")
    c.data.cameras = [0]
    c.data.split_test = 2
    c.train.iterations = 30
    c.train.test_iterations = [30]
    c.train.checkpoint_iterations = [30]
    c.train.save_iterations = [30]
    c.train.novel_view_prob = 0.0
    c.train.log_interval = 1000
    c.optim.capacity_bkgd = 4096
    c.optim.capacity_obj = 512
    c.optim.capacity_sky = 1024
    c.optim.densify_from_iter = 10
    c.optim.densification_interval = 10
    c.optim.densify_until_iter = 25
    c.optim.opacity_reset_interval = 100000
    c.optim.lambda_depth_lidar = 0.0
    c.render.novel_view.shift = [2.0]
    c.render.max_intersects_per_tile = 64
    c.model.gaussian.sh_degree = 1
    c.optim.allow_missing_lpips = True
    return c


def test_scene_build(cfg):
    from street_crafter_tpu.runner import create_scene
    scene = create_scene(cfg)
    assert scene.params.bkgd is not None
    assert int(scene.params.bkgd.num_valid()) > 100
    assert scene.params.actors is not None
    A, cap = scene.params.actors.xyz.shape[:2]
    assert A == 1 and cap == 512
    assert scene.params.sky is not None
    assert scene.meta.track_valid.shape[0] == 5  # all 5 cams in tracklets
    assert len(scene.train_cameras) == 2
    assert len(scene.test_cameras) == 1
    # camera batches carry supervision
    b = scene.batch_for(scene.info.train_cameras[0])
    assert b["gt_image"].shape == (48, 64, 3)
    assert "sky_mask" in b and "lidar_depth" in b


def test_obj_acc_regularizer(cfg):
    """lambda_reg engages the objects-only acc entropy pass after
    densify_until_iter (train.py:202-208 schedule)."""
    from street_crafter_tpu.runner import create_scene
    from street_crafter_tpu.runner.train import GSTrainer
    c = cfg.clone()
    c.model_path = cfg.model_path + "_objacc"
    c.train.iterations = 28
    c.train.test_iterations = []
    c.train.checkpoint_iterations = []
    c.train.log_interval = 1
    c.train.reg_obj_acc_every = 5
    c.optim.lambda_reg = 0.1
    c.optim.densify_until_iter = 25
    c.resume = False
    scene = create_scene(c)
    trainer = GSTrainer(c, scene)
    seen = {}
    trainer.run(log_fn=lambda it, s: seen.update({it: s}))
    late = [s for it, s in seen.items() if it > 26]
    assert any("obj_acc_loss" in s for s in late), sorted(seen)
    assert all("obj_acc_loss" not in s for it, s in seen.items() if it < 25)


def test_train_and_render(cfg):
    from street_crafter_tpu.runner.train import GSTrainer, train
    trainer = train(cfg)
    assert int(trainer.state.step) == 30
    report = trainer.evaluate()
    assert np.isfinite(report["psnr"])

    # checkpoint was written and a fresh trainer resumes from it
    trainer2 = GSTrainer(cfg, trainer.scene)
    assert trainer2.start_iter == 31

    from street_crafter_tpu.runner.render import (render_novel_view,
                                                  render_trajectory)
    videos = render_trajectory(cfg)
    assert "rgb" in videos and os.path.exists(videos["rgb"])
    import imageio.v2 as imageio
    first_png = os.path.join(cfg.model_path, "trajectory_30", "rgb",
                             "000000_0.png")
    img = imageio.imread(first_png)
    assert img.shape == (48, 64, 3)

    nv = render_novel_view(cfg)
    assert any(os.path.exists(p) for p in nv.values())

    # viewer-format PLY was exported at save_iterations and round-trips
    ply = os.path.join(cfg.model_path, "point_cloud", "iteration_30",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    from street_crafter_tpu.utils.gs_ply import import_gaussians_ply
    pools = import_gaussians_ply(ply)
    assert "bkgd" in pools and "sky" in pools
    assert int(pools["bkgd"].num_valid()) > 100


@pytest.mark.slow   # consumes the checkpoint test_train_and_render (slow
# tier) writes into the module cfg dir — must ride in the same tier
def test_virtual_warp_mode(cfg):
    """render.py mode=virtual_warp analog (novel_view_utils.py:387-490):
    per-step render/condition/mask pngs with step 0 = the source image."""
    import imageio.v2 as imageio

    from street_crafter_tpu.runner.render import render_virtual_warp
    c = cfg.clone()
    c.render.novel_view.steps = 3
    outputs = render_virtual_warp(c)
    assert outputs, "no front train cameras warped"
    d = next(iter(outputs.values()))
    for i in range(3):
        for suffix in ("", "_condition", "_mask"):
            assert os.path.exists(os.path.join(d, f"{i:04d}{suffix}.png"))
    # step 0 condition is the source image itself, mask all ones
    mask0 = imageio.imread(os.path.join(d, "0000_mask.png"))
    assert (mask0 == 255).all()
    # warped steps have some valid and some invalid pixels
    mask2 = imageio.imread(os.path.join(d, "0002_mask.png"))
    assert (mask2 == 255).any()


def test_train_batched_dp(cfg):
    """cfg.train.batch_size > 1 drives the camera-DP step through the full
    runner (stacked cameras/batches, jitted once, loss finite)."""
    from street_crafter_tpu.runner import create_scene
    from street_crafter_tpu.runner.train import GSTrainer
    c = cfg.clone()
    c.model_path = cfg.model_path + "_dp"
    c.train.iterations = 8
    c.train.batch_size = 2
    c.train.test_iterations = []
    c.train.checkpoint_iterations = []
    c.train.log_interval = 1
    c.resume = False
    scene = create_scene(c)
    trainer = GSTrainer(c, scene)
    seen = {}
    trainer.run(log_fn=lambda it, s: seen.update({it: s}))
    assert int(trainer.state.step) == 8
    assert all(np.isfinite(s["loss"]) for s in seen.values())
