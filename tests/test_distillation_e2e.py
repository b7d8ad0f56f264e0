"""Full distillation loop (milestone D shape): synthetic scene + tiny VDM ->
diffusion sampling at sample_iterations -> novel-view supervised training."""

import os

import numpy as np
import pytest

from street_crafter_tpu.config import default_config
from tests.synthetic_scene import make_scene


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("distill"))
    scene_dir = make_scene(root, num_frames=3)
    c = default_config()
    c.source_path = scene_dir
    c.model_path = os.path.join(root, "model")
    c.data.cameras = [0]
    c.data.split_test = 2
    c.train.iterations = 8
    c.train.test_iterations = []
    c.train.checkpoint_iterations = []
    c.train.novel_view_prob = 0.9
    c.train.log_interval = 1000
    c.optim.capacity_bkgd = 2048
    c.optim.capacity_obj = 256
    c.optim.capacity_sky = 512
    c.optim.densify_from_iter = 1000
    c.optim.opacity_reset_interval = 100000
    c.render.novel_view.shift = [2.0]
    c.render.max_intersects_per_tile = 64
    c.model.gaussian.sh_degree = 1
    c.optim.allow_missing_lpips = True
    c.diffusion.use_diffusion = True
    c.diffusion.tiny = True
    c.diffusion.height = 32
    c.diffusion.width = 64
    c.diffusion.sample_frames = 4
    c.diffusion.window_size = 1
    c.diffusion.num_steps = 3
    c.diffusion.sample_iterations = [3]
    c.diffusion.sds_scales = [0.7]
    c.diffusion.masked_guidance_iter = 10000
    return c


def test_crop_resize_K_consistency():
    """Projecting through the cropped+scaled K must match cropping+scaling
    the projected pixel coordinates."""
    from street_crafter_tpu.runner.diffusion import crop_resize_K
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    h, w, th, tw = 48, 64, 32, 64  # wider target: height is cropped
    K2 = crop_resize_K(K, h, w, th, tw)
    pt = np.array([0.3, 0.2, 1.0])
    u1 = (K @ pt)[:2]
    ch = int(th / tw * w)  # = 32, crop top h-ch = 16
    expect = (u1 - np.array([0.0, h - ch])) * np.array([tw / w, th / ch])
    u2 = (K2 @ pt)[:2]
    np.testing.assert_allclose(u2, expect, atol=1e-9)


def test_distillation_loop(cfg):
    from street_crafter_tpu.runner.train import train
    trainer = train(cfg)
    # sampling happened: novel cameras carry diffusion images
    novel = [c for c in trainer.scene.info.novel_view_cameras
             if c._image is not None]
    assert len(novel) == 3  # 3 frames x 1 shift, front cam
    assert novel[0]._image.shape == (32, 64, 3)
    assert np.isfinite(novel[0]._image).all()
    # diffusion renders were saved
    diff_dir = os.path.join(cfg.model_path, "diffusion")
    assert len(os.listdir(diff_dir)) == 3
    # training consumed novel views without error and advanced
    assert int(trainer.state.step) >= 7


def test_params_on_host_bitmatch(cfg, tmp_path_factory):
    """diffusion.params_on_host (low_vram analog, sample_condition.py:52-77):
    engine params rest in host RAM between sampling events, and the sampled
    supervision bit-matches the device-resident path."""
    import copy

    from street_crafter_tpu.runner.train import make_diffusion_hook, train

    root = str(tmp_path_factory.mktemp("poh"))
    outs = {}
    for on_host in (False, True):
        c = copy.deepcopy(cfg)
        c.train.iterations = 4
        c.train.save_iterations = []
        c.diffusion.sample_iterations = [2]
        c.diffusion.params_on_host = on_host
        c.model_path = os.path.join(root, f"model_{int(on_host)}")
        hook = make_diffusion_hook(c)
        store = hook.param_store
        assert store.on_host == on_host
        if on_host:
            # at rest on host from construction (before any event)
            assert store.host_resident

        seen = []

        def checked_hook(trainer, iteration, scale, masked_guidance,
                         _h=hook, _s=store, _oh=on_host):
            _h(trainer, iteration, scale, masked_guidance)
            # the event's device copy is dropped before GS training resumes
            if _oh:
                assert _s.host_resident
            seen.append(iteration)

        trainer = train(c, diffusion_hook=checked_hook)
        assert seen == [2]
        outs[on_host] = [
            np.asarray(ci._image)
            for ci in trainer.scene.info.novel_view_cameras
            if ci._image is not None]
        assert outs[on_host], "sampling produced no novel supervision"
    for a, b in zip(outs[False], outs[True], strict=True):
        np.testing.assert_array_equal(a, b)
