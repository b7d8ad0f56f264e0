"""Distillation-mechanism oracle (VERDICT r4 weak #5).

Every on-chip rehearsal so far runs the real sampling plumbing with
random-init engine weights, so its "supervision" is noise — the completed
passes prove the loop runs, not that SDS-style novel-view supervision
improves novel-view quality. This test separates the mechanism from the
env-blocked weights: the sampler is replaced by a GROUND-TRUTH novel-view
oracle (the palette-GT scene rendered at the novel cameras — a perfect
diffusion model), and training with novel-view supervision must beat
GS-only training on held-out NOVEL-view PSNR at equal iterations.

Reference mechanism under test: diffusion sampling attaches images to novel
cameras (diffusion_utils.py:316-338), the train loop samples them with
novel_view_prob and applies the novel-view loss branch
(train.py:142-147,158-180). Everything except the sampler itself runs
exactly as in production (novel pool refresh, diffusion_version bump,
diffusion-resolution cameras, is_novel loss weights).
"""

import importlib.util
import os
import pathlib

import numpy as np
import pytest

from street_crafter_tpu.config import default_config
from tests.synthetic_scene import make_scene

_spec = importlib.util.spec_from_file_location(
    "onchip_e2e", pathlib.Path(__file__).resolve().parent.parent
    / "scripts" / "run_onchip_e2e.py")
onchip_e2e = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(onchip_e2e)

DH, DW = 64, 128   # diffusion/novel-view resolution (= scene resolution)
ITERS = 150


def _base_cfg(root: str, scene_dir: str, name: str):
    c = default_config()
    c.source_path = scene_dir
    c.model_path = os.path.join(root, name)
    c.data.cameras = [0]
    c.data.split_test = 2
    c.train.iterations = ITERS
    c.train.test_iterations = []
    c.train.checkpoint_iterations = []
    c.train.save_iterations = []
    c.train.log_interval = 1000
    c.train.novel_view_prob = 0.0
    c.optim.capacity_bkgd = 2048
    c.optim.capacity_obj = 256
    c.optim.capacity_sky = 512
    c.optim.densify_from_iter = 100000   # fixed pools: isolate supervision
    c.optim.opacity_reset_interval = 100000
    c.render.novel_view.shift = [2.0]
    c.render.max_intersects_per_tile = 64
    c.render.train_auto_capacity = False
    c.model.gaussian.sh_degree = 1
    # the reference's novel-view loss is LPIPS-DOMINANT
    # (lambda_novel_lpips=1.0 vs 0.1 l1/dssim, config.py:93-96); with
    # LPIPS silently absent the novel branch carries ~0.01 effective
    # weight and novel steps become near-no-ops that still consume the
    # iteration budget (measured: -1.1 dB). Use the seeded random-feature
    # stand-in so the mechanism runs at its designed weights.
    c.optim.lpips_fallback = "random_features"
    return c


def _novel_gt(scene):
    """Oracle: palette-GT params rendered at the diffusion-resolution novel
    cameras — what a perfect conditioned diffusion model would sample."""
    from street_crafter_tpu.models.gs.renderer import render_scene
    from street_crafter_tpu.runner.diffusion import diffusion_camera

    gt_params = onchip_e2e.palette_gt_params(scene)
    outs = []
    for info in scene.info.novel_view_cameras:
        cam = diffusion_camera(info, DH, DW)
        b = scene.batch_for(info)
        img = render_scene(
            gt_params, scene.meta, cam, frame_idx=b["frame_idx"],
            frame=b["frame"], cam_id=b["cam_id"],
            timestamp=b.get("timestamp"), sh_degree=1, clamp=True)["rgb"]
        outs.append(np.asarray(img))
    return outs


def _novel_psnr(scene, params, gt_imgs):
    from street_crafter_tpu.models.gs.renderer import render_scene
    from street_crafter_tpu.runner.diffusion import diffusion_camera

    ps = []
    for info, gt in zip(scene.info.novel_view_cameras, gt_imgs):
        cam = diffusion_camera(info, DH, DW)
        b = scene.batch_for(info)
        img = np.asarray(render_scene(
            params, scene.meta, cam, frame_idx=b["frame_idx"],
            frame=b["frame"], cam_id=b["cam_id"],
            timestamp=b.get("timestamp"), sh_degree=1, clamp=True)["rgb"])
        mse = float(np.mean((img - gt) ** 2))
        ps.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(ps))


@pytest.mark.slow
def test_novel_view_supervision_beats_gs_only(tmp_path):
    from street_crafter_tpu.runner.train import train

    root = str(tmp_path)
    scene_dir = make_scene(root, num_frames=4, img_hw=(DH, DW))

    # palette GT on disk for the train/test cameras (the oracle's world)
    c0 = _base_cfg(root, scene_dir, "gt_setup")
    onchip_e2e.write_gt_images(c0)

    # ---- run A: GS-only --------------------------------------------------
    ca = _base_cfg(root, scene_dir, "model_gs_only")
    trainer_a = train(ca)
    gt_novel = _novel_gt(trainer_a.scene)
    psnr_a = _novel_psnr(trainer_a.scene, trainer_a.state.params, gt_novel)

    # ---- run B: novel-view supervision from the GT oracle ---------------
    cb = _base_cfg(root, scene_dir, "model_oracle")
    cb.train.novel_view_prob = 0.4   # reference default (config.py:50)
    cb.diffusion.use_diffusion = True   # enables the sampling schedule;
    cb.diffusion.height = DH            # the hook below replaces the engine
    cb.diffusion.width = DW
    cb.diffusion.sample_iterations = [5]
    cb.diffusion.sds_scales = [0.7]
    cb.diffusion.masked_guidance_iter = 100000

    def oracle_hook(trainer, iteration, scale, masked_guidance):
        scene = trainer.scene
        for info, img in zip(scene.info.novel_view_cameras,
                             _novel_gt(scene)):
            info._image = img
            info.metadata["diffusion_version"] = \
                info.metadata.get("diffusion_version", 0) + 1

    trainer_b = train(cb, diffusion_hook=oracle_hook)
    psnr_b = _novel_psnr(trainer_b.scene, trainer_b.state.params, gt_novel)

    print(f"novel-view PSNR: gs_only {psnr_a:.2f} dB, "
          f"oracle-supervised {psnr_b:.2f} dB "
          f"(+{psnr_b - psnr_a:.2f} dB at {ITERS} iters)")
    # the mechanism must add value, not just run: require a clear margin
    assert psnr_b > psnr_a + 0.3, (psnr_a, psnr_b)
