"""Rendering / evaluation driver.

render.py analog with its three modes (render.py:19-107):
- ``trajectory``: render all train+test cameras sorted by id, write pngs +
  videos per stream;
- ``novel_view``: render each lane-shift trajectory;
- ``diffusion``: run the diffusion model over novel trajectories (wired via
  the same hook as training; requires vdm weights).

CLI: python -m street_crafter_tpu.runner.render --config scene.yaml \
    [mode=trajectory] [k=v ...]
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config, load_config, merge_dotlist
from ..training.gs_trainer import init_train_state
from ..utils.checkpoint import load_checkpoint
from ..visualizers import Visualizer
from .scene import Scene, create_scene
from .train import make_eval_render, psnr


def load_trained_state(cfg: Config, scene: Scene):
    state = init_train_state(scene.params)
    iteration = None if cfg.loaded_iter < 0 else cfg.loaded_iter
    restored, it = load_checkpoint(scene.model_path, state, iteration)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint under {scene.model_path}/checkpoints")
    print(f"loaded checkpoint at iteration {it}")
    return restored, it


def render_trajectory(cfg: Config) -> dict[str, str]:
    """All train+test cameras in id order (render.py:19-40)."""
    scene = create_scene(cfg, need_processor=False)
    state, it = load_trained_state(cfg, scene)
    out_dir = os.path.join(scene.model_path, f"trajectory_{it}")
    vis = Visualizer(out_dir, fps=cfg.render.fps,
                     save_images=bool(cfg.render.save_image))
    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree)

    infos = scene.info.train_cameras + scene.info.test_cameras
    cams = scene.train_cameras + scene.test_cameras
    order = np.argsort([i.uid for i in infos])
    psnrs = []
    for idx in order:
        info, cam = infos[idx], cams[idx]
        batch = scene.batch_for(info)
        out = eval_render(state.params, cam, batch)
        gt = batch.get("gt_image")
        vis.add_result(out, info.metadata["frame"], info.metadata["cam"],
                       gt=None if gt is None else np.asarray(gt))
        if gt is not None and info.metadata["is_val"]:
            psnrs.append(float(psnr(out["rgb"], gt)))
    if psnrs:
        print(f"test psnr: {np.mean(psnrs):.3f}")
    return vis.summarize()


def render_novel_view(cfg: Config) -> dict[str, str]:
    """Per-shift novel trajectories (render.py:43-75)."""
    scene = create_scene(cfg, need_processor=False)
    state, it = load_trained_state(cfg, scene)
    videos = {}
    shifts = sorted({i.metadata["novel_view_id"]
                     for i in scene.info.novel_view_cameras})
    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree)
    for shift in shifts:
        out_dir = os.path.join(scene.model_path,
                               f"novel_view_{it}_shift_{shift:.2f}")
        vis = Visualizer(out_dir, fps=cfg.render.fps,
                         save_images=bool(cfg.render.save_image))
        for info, cam in zip(scene.info.novel_view_cameras,
                             scene.novel_cameras):
            if info.metadata["novel_view_id"] != shift:
                continue
            batch = scene.batch_for(info)
            out = eval_render(state.params, cam, batch)
            vis.add_result(out, info.metadata["frame"],
                           info.metadata["cam"])
        videos.update({f"{shift}:{k}": v
                       for k, v in vis.summarize().items()})
    return videos


def render_diffusion(cfg: Config) -> dict[str, str]:
    """Run the conditioned VDM over the novel trajectories and dump videos
    (render.py:78-107): the current 3DGS render seeds the SDS partial
    denoise, outputs land next to the checkpoints."""
    from ..models.vdm.engine import VideoDiffusionEngine
    from ..models.vdm.weights import engine_from_config, load_vdm_params
    from ..visualizers import save_video
    from .diffusion import (DiffusionRunner, diffusion_camera,
                            sampling_mesh_from_cfg)
    from .train import make_eval_render

    scene = create_scene(cfg)
    state, it = load_trained_state(cfg, scene)
    engine = VideoDiffusionEngine(engine_from_config(cfg.diffusion))
    params = load_vdm_params(engine, cfg.diffusion)
    out_dir = os.path.join(scene.model_path, f"diffusion_{it}")
    runner = DiffusionRunner(
        scene, engine, params, height=cfg.diffusion.height,
        width=cfg.diffusion.width, window_size=cfg.diffusion.window_size,
        num_steps=cfg.diffusion.num_steps,
        cfg_scale=cfg.diffusion.cfg_scale, save_dir=out_dir,
        mesh=sampling_mesh_from_cfg(cfg))

    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree)

    def render_fn(info):
        cam = diffusion_camera(info, cfg.diffusion.height,
                               cfg.diffusion.width)
        return eval_render(state.params, cam, scene.batch_for(info))

    runner.run(scene.info.novel_view_cameras, scene.info.train_cameras,
               render_fn=render_fn, scale=min(cfg.diffusion.sds_scales))

    videos = {}
    for shift in sorted({i.metadata["novel_view_id"]
                         for i in scene.info.novel_view_cameras}):
        frames = [c._image for c in sorted(
            (c for c in scene.info.novel_view_cameras
             if c.metadata["novel_view_id"] == shift and c._image is not None),
            key=lambda c: c.metadata["frame"])]
        if frames:
            videos[f"shift_{shift:.2f}"] = save_video(
                os.path.join(out_dir, f"diffusion_shift_{shift:.2f}.mp4"),
                frames, fps=cfg.render.fps)
    return videos


MODES = {"trajectory": render_trajectory, "novel_view": render_novel_view,
         "diffusion": render_diffusion}


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="render a trained scene")
    p.add_argument("--config", required=True)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = default_config()
    cfg.merge(load_config(args.config))
    merge_dotlist(cfg, args.opts)
    mode = cfg.get("mode", "trajectory")
    if mode == "train":
        mode = "trajectory"
    videos = MODES[mode](cfg)
    for name, path in videos.items():
        print(f"{name}: {path}")


if __name__ == "__main__":
    main()
