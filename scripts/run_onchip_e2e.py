"""On-chip end-to-end GS training: synthetic scene in the real on-disk
format -> 3D-consistent rendered ground truth -> runner.train loop on the
TPU -> held-out PSNR + iteration timing.

Ground truth is produced by rendering the scene's OWN geometry (lidar-
initialized background/actor/sky pools) with a smooth position-dependent
palette and high opacity, then overwriting the scene images. Training
re-initializes from the same plys but with the plys' random colors — so the
optimizer must recover the palette appearance, and the held-out frames test
3D consistency (novel ego positions), not memorization. This is the full
training stack (scene build, condition rendering, loss stack, fused-train
raster, densify/prune, per-group Adam, eval) on real hardware — the closest
available stand-in for a real-Waymo parity run (VERDICT r1 #2) in a
zero-egress environment.

Usage: python scripts/run_onchip_e2e.py [--iters 2000] [--frames 4]
       [--height 384 --width 512]
"""

import argparse
import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def palette(xyz: np.ndarray) -> np.ndarray:
    """Smooth position->color map (3 incommensurate spatial frequencies)."""
    f = np.array([[0.37, 0.11, 0.23],
                  [0.05, 0.41, 0.17],
                  [0.19, 0.07, 0.31]], np.float32)
    return 0.5 + 0.45 * np.sin(np.asarray(xyz, np.float32) @ f.T)


def build_config(scene_dir: str, model_path: str, iters: int):
    from street_crafter_tpu.config import default_config
    c = default_config()
    c.source_path = scene_dir
    c.model_path = model_path
    c.data.cameras = [0]
    c.data.split_test = 2   # every-2nd frame held out (get_val_frames analog)
    c.train.iterations = iters
    c.train.test_iterations = [iters // 2, iters]
    c.train.checkpoint_iterations = [iters]
    c.train.save_iterations = [iters]
    c.train.novel_view_prob = 0.0
    c.train.log_interval = 500
    c.optim.densify_from_iter = 200
    c.optim.densification_interval = 100
    c.optim.densify_until_iter = iters // 2
    c.optim.opacity_reset_interval = 100000
    c.render.novel_view.shift = [2.0]
    c.optim.allow_missing_lpips = True
    return c


def write_gt_images(c) -> None:
    """Render palette-colored GT from the scene's own geometry and
    overwrite every train/test image on disk."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    from street_crafter_tpu.models.gs.renderer import render_scene
    from street_crafter_tpu.ops.sh import rgb_to_sh
    from street_crafter_tpu.runner import create_scene

    scene = create_scene(c)

    def recolor(pool, opacity_logit=3.0):
        if pool is None:
            return None
        cols = palette(np.asarray(pool.xyz).reshape(-1, 3))
        fdc = rgb_to_sh(jnp.asarray(cols)).reshape(
            pool.xyz.shape[:-1] + (1, 3))
        if pool.features_dc.shape[-2] > 1:   # Fourier DC: fill coefficient 0
            fdc = jnp.concatenate(
                [fdc, jnp.zeros(pool.features_dc.shape[:-2]
                                + (pool.features_dc.shape[-2] - 1, 3))], -2)
        return dataclasses.replace(
            pool, features_dc=fdc.astype(pool.features_dc.dtype),
            features_rest=jnp.zeros_like(pool.features_rest),
            opacity=jnp.full_like(pool.opacity, opacity_logit))

    gt_params = dataclasses.replace(
        scene.params,
        bkgd=recolor(scene.params.bkgd),
        actors=recolor(scene.params.actors),
        sky=recolor(scene.params.sky))

    infos = scene.info.train_cameras + scene.info.test_cameras
    cams = scene.train_cameras + scene.test_cameras
    for info, cam in zip(infos, cams):
        b = scene.batch_for(info)
        img = render_scene(
            gt_params, scene.meta, cam, frame_idx=b["frame_idx"],
            frame=b["frame"], cam_id=b["cam_id"],
            timestamp=b.get("timestamp"), clamp=True)["rgb"]
        arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        imageio.imwrite(info.image_path, arr)
    print(f"wrote {len(infos)} palette-GT images "
          f"({arr.shape[0]}x{arr.shape[1]})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--root", default="")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="onchip_e2e_")
    from tests.synthetic_scene import make_scene
    scene_dir = make_scene(root, num_frames=args.frames,
                           img_hw=(args.height, args.width))

    c = build_config(scene_dir, os.path.join(root, "model"), args.iters)
    write_gt_images(c)

    from street_crafter_tpu.runner.train import train
    t0 = time.perf_counter()
    train(c)
    dt = time.perf_counter() - t0
    print(f"on-chip e2e: {args.iters} iters in {dt:.1f} s "
          f"({dt / args.iters * 1e3:.1f} ms/iter incl. compile+eval+io)")
    print(f"outputs in {c.model_path}")


if __name__ == "__main__":
    main()
