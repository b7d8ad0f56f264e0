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


def probe_coarse_capacity(cfg: Config, scene: Scene, params,
                          infos, cams, max_probes: int = 3) -> dict:
    """Pick the raster capacity strategy for a trajectory from a stats
    probe (VERDICT r2 #4 / round 4 escalation). Renders up to
    ``max_probes`` cameras spread over the trajectory with
    ``with_stats=True`` (exact pre-drop per-tile counts, ops/gs_raster.py)
    and returns kwargs for ``make_eval_render``:

    - every probed tile fits the configured base capacity -> plain render
      at the config floor;
    - a MINORITY of tiles overflow (the post-densification norm: dense
      facades, sparse sky/road) -> keep the base capacity and ESCALATE the
      overflowing tiles (ops/gs_raster_fused.py escalate_tiles): gsplat's
      pay-per-tile economics instead of paying coarse_max for all tiles;
    - a majority overflow -> raise the capacity class globally (escalating
      most of the frame would render it twice).

    Returns {} when auto sizing is disabled. One probe costs one stats
    render; capacity buckets keep one compiled executable per class."""
    if not bool(cfg.render.get("auto_capacity", True)) or not infos:
        return {}
    from ..ops.gs_raster import pick_coarse_capacity
    stats_render = make_eval_render(cfg, scene.meta,
                                    cfg.model.gaussian.sh_degree,
                                    with_stats=True)
    picks = np.linspace(0, len(infos) - 1,
                        min(max_probes, len(infos))).astype(int)
    # the configured capacity floors the pick (ADVICE r3): a sparse probe
    # frame must not downgrade denser un-probed frames below the value the
    # old fixed default handled, and a user-raised config value wins
    floor = int(cfg.render.get("max_intersects_per_coarse", 4096))
    from ..ops.gs_raster_fused import _KF_CAP_HI, default_row_capacity
    cmax, ovf, rmax = 0, 0, 0
    hist = {}
    for i in picks:
        out = stats_render(params, cams[i], scene.batch_for(infos[i]))
        st = out["raster_stats"]
        cmax = max(cmax, int(st["coarse_max"]))
        # escalation candidates counted vs the BASE capacities (the stats
        # render runs at the config floor): tiles over the coarse capacity
        # OR with a 16px row over the row capacity (both drop sites the
        # escalated pass clears, ops/gs_raster_fused.py)
        ovf = max(ovf, int(st.get("escalation_candidate_tiles",
                                  st["coarse_overflow_tiles"])))
        rmax = max(rmax, int(st.get("row_max", 0)))
        for cls in (4096, 8192, 16384, 32768):
            k = f"tiles_over_{cls}"
            if k in st:
                hist[cls] = max(hist.get(cls, 0), int(st[k]))
    kc = max(pick_coarse_capacity(cmax), floor)
    # a dense 16px row can overflow the fused kernel's per-row compaction
    # even when its tile's total fits kc; the escalated pass's row capacity
    # (VMEM-capped at _KF_CAP_HI, gate-verified) clears that second drop
    # site
    row_need = rmax > default_row_capacity(floor)
    if kc <= floor and not row_need:
        print(f"auto capacity: coarse_max {cmax} over {len(picks)} probes "
              f"-> kc {floor} (config floor), no escalation needed")
        return {"max_per_coarse": floor}
    cts = int(cfg.render.tile_size) * 8
    Tc = (-(-cams[picks[0]].width // cts)) * (-(-cams[picks[0]].height // cts))
    if bool(cfg.render.get("escalate", True)) and 0 < ovf <= Tc // 2:
        # budget: observed overflow count + headroom for denser un-probed
        # frames, rounded to a bucket of 8 (one executable per bucket)
        def bucket8(x):
            return max(8, -(-int(x * 1.5) // 8) * 8)

        tiles = bucket8(ovf)
        # multi-CLASS escalation (round 5): when the capacity need spans
        # more than one gate-cleared class above the floor, each tile pays
        # its own smallest covering class instead of the global max — the
        # class histogram comes from the stats probe (tiles_over_*)
        if (floor == 4096 and kc > 16384 and hist.get(8192, 0) > 0
                and ovf > hist.get(16384, 0)):
            o8, o16 = hist.get(8192, 0), hist.get(16384, 0)
            o4 = max(ovf, hist.get(4096, 0))
            classes = [(bucket8(max(o16, 1)), kc)]
            if o8 - o16 > 0 or row_need:
                classes.append((bucket8(max(o8 - o16, 0)
                                        + (ovf - o4 if row_need else 0)
                                        + 1), 16384))
            if o4 - o8 > 0:
                classes.append((bucket8(o4 - o8), 8192))
            # quality selection: recall 0.95 (training fidelity). NOT
            # sort: the r5 on-chip measurement showed the (tile, depth)
            # lexsort worklist's 4-corner-tile expansion loses ~half the
            # tile/splat pairs on full-res heavy-tail scenes (wide splats'
            # interior tiles) — 18.4 dB vs exact; see BASELINE.md r5
            # decision record
            caps = {"max_per_coarse": floor,
                    "escalate_classes": tuple(classes)}
            print(f"auto capacity: coarse_max {cmax}, row_max {rmax}, "
                  f"{ovf}/{Tc} tiles over the {floor} floor -> "
                  f"multi-class escalation {classes}")
            return caps
        caps = {"max_per_coarse": floor, "escalate_tiles": tiles,
                "escalate_per_coarse": kc}
        if row_need:
            caps["escalate_per_row"] = min(_KF_CAP_HI, kc)
        print(f"auto capacity: coarse_max {cmax}, row_max {rmax}, "
              f"{ovf}/{Tc} tiles over the {floor} floor -> escalate "
              f"{tiles} tiles at kc {kc}"
              + (f" / row {caps['escalate_per_row']}" if row_need else ""))
        return caps
    caps = {"max_per_coarse": kc}
    if row_need and default_row_capacity(kc, cap=_KF_CAP_HI) < min(rmax,
                                                                   _KF_CAP_HI):
        caps["max_per_row"] = _KF_CAP_HI
    print(f"auto capacity: coarse_max {cmax}, row_max {rmax}, {ovf}/{Tc} "
          f"tiles overflow -> global kc {kc} (config floor {floor})"
          + (" / row " + str(caps.get("max_per_row", "")) if "max_per_row"
             in caps else ""))
    return caps


def render_trajectory(cfg: Config) -> dict[str, str]:
    """All train+test cameras in id order (render.py:19-40)."""
    scene = create_scene(cfg, need_processor=False)
    state, it = load_trained_state(cfg, scene)
    out_dir = os.path.join(scene.model_path, f"trajectory_{it}")
    vis = Visualizer(out_dir, fps=cfg.render.fps,
                     save_images=bool(cfg.render.save_image))

    infos = scene.info.train_cameras + scene.info.test_cameras
    cams = scene.train_cameras + scene.test_cameras
    caps = probe_coarse_capacity(cfg, scene, state.params, infos, cams)
    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree, **caps)
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
    caps = probe_coarse_capacity(cfg, scene, state.params,
                                 scene.info.novel_view_cameras,
                                 scene.novel_cameras)
    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree, **caps)
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


def render_virtual_warp(cfg: Config) -> dict[str, str]:
    """Depth-reprojection warp guidance (novel_view_utils.py:387-490
    ``virtual_warp``): for each front train camera, render the source view,
    then for ``steps`` interpolation fractions r in [0, 1] build a virtual
    pose (lane shift ``shift*r`` + yaw ``rotate*r``), render its depth, and
    warp the source image into it. Saves ``{i:04d}.png`` (render),
    ``{i:04d}_condition.png`` (warp) and ``{i:04d}_mask.png`` per step under
    ``model_path/virtual_warp/{name}/{image_name}/``."""
    import imageio.v2 as imageio

    from ..datasets import waymo_layout
    from ..datasets.cameras import Camera
    from ..ops.warp import process_depth, virtual_warp_images

    scene = create_scene(cfg, need_processor=False)
    state, it = load_trained_state(cfg, scene)
    eval_render = make_eval_render(cfg, scene.meta,
                                   cfg.model.gaussian.sh_degree)
    nv = cfg.render.novel_view
    steps = int(nv.steps)
    shift = nv.shift
    shift = float(shift[0] if isinstance(shift, (list, tuple)) else shift)
    yaw = float(nv.rotate)
    ego_frame_poses = scene.info.metadata["ego_frame_poses"]
    out_root = os.path.join(scene.model_path, "virtual_warp", str(nv.name))

    start, end = int(nv.start_frame), int(nv.end_frame)
    outputs: dict[str, str] = {}
    for info, cam in zip(scene.info.train_cameras, scene.train_cameras):
        if info.metadata["cam"] != 0:
            continue  # front camera only, like the lane-shift trajectories
        frame = info.metadata["frame"]
        if start >= 0 and frame < start or end >= 0 and frame > end:
            continue
        save_dir = os.path.join(out_root, info.image_name)
        os.makedirs(save_dir, exist_ok=True)
        batch = scene.batch_for(info)
        src_out = eval_render(state.params, cam, batch)
        src_rgb = jnp.asarray(info.load_image())
        src_depth = process_depth(src_out["depth"], src_out["acc"])

        # step 0 is the source itself (novel_view_utils.py:421-434)
        imageio.imwrite(os.path.join(save_dir, "0000.png"),
                        np.asarray(src_rgb * 255, np.uint8))
        imageio.imwrite(os.path.join(save_dir, "0000_condition.png"),
                        np.asarray(src_rgb * 255, np.uint8))
        imageio.imwrite(os.path.join(save_dir, "0000_mask.png"),
                        np.full((cam.height, cam.width), 255, np.uint8))

        direction = waymo_layout.get_lane_shift_direction(
            ego_frame_poses, frame)
        ext = np.asarray(info.metadata["extrinsic"])  # cam -> ego
        tar_rgbs, tar_depths, tar_c2ws = [], [], []
        for r in np.linspace(0.0, 1.0, steps)[1:]:
            ego = np.asarray(info.metadata["ego_pose"]).copy()
            ego[:3, 3] += direction * shift * r
            c, s = np.cos(yaw * r), np.sin(yaw * r)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
            ego[:3, :3] = rot @ ego[:3, :3]
            tar_c2w = ego @ ext
            tar_cam = Camera.from_c2w(tar_c2w, np.asarray(cam.K),
                                      cam.width, cam.height)
            tar_out = eval_render(state.params, tar_cam, batch)
            tar_rgbs.append(tar_out["rgb"])
            tar_depths.append(process_depth(tar_out["depth"],
                                            tar_out["acc"]))
            tar_c2ws.append(tar_c2w)

        B = len(tar_c2ws)
        K = jnp.broadcast_to(cam.K, (B, 3, 3))
        res = virtual_warp_images(
            K, jnp.asarray(np.stack(tar_c2ws), jnp.float32),
            jnp.stack(tar_depths),
            K, jnp.asarray(np.asarray(info.c2w), jnp.float32)[None]
            .repeat(B, 0),
            jnp.broadcast_to(src_depth, (B, *src_depth.shape)),
            jnp.broadcast_to(src_rgb, (B, *src_rgb.shape)))
        for i in range(B):
            rgb = np.clip(np.asarray(tar_rgbs[i]), 0, 1)
            imageio.imwrite(os.path.join(save_dir, f"{i + 1:04d}.png"),
                            (rgb * 255).astype(np.uint8))
            warp = np.clip(np.asarray(res.rgb[i]), 0, 1)
            imageio.imwrite(
                os.path.join(save_dir, f"{i + 1:04d}_condition.png"),
                (warp * 255).astype(np.uint8))
            imageio.imwrite(os.path.join(save_dir, f"{i + 1:04d}_mask.png"),
                            np.asarray(res.mask[i], np.uint8) * 255)
        outputs[info.image_name] = save_dir
    return outputs


MODES = {"trajectory": render_trajectory, "novel_view": render_novel_view,
         "diffusion": render_diffusion, "virtual_warp": render_virtual_warp}


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
