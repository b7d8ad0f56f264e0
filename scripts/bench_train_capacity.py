"""Measure the gradient-drop cost of the training raster capacity class
(VERDICT r4 weak #1 / next #4).

gsplat sizes its per-tile worklists dynamically and drops nothing
(street_gaussian_renderer.py:243-280); our static-shape training raster
clamps at max_per_coarse, and every dropped candidate gets ZERO gradient —
the densification loop then feeds on those same gradients. This script
quantifies that distortion: the SAME dense synthetic scene + palette GT is
trained at two gate-cleared capacity classes, and held-out PSNR is measured
with one shared high-capacity exact-select render (so the eval cannot favor
either run).

Usage: python scripts/bench_train_capacity.py [--iters 800]
       [--height 576 --width 1024] [--classes 4096,16384]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "onchip_e2e", pathlib.Path(__file__).resolve().parent
    / "run_onchip_e2e.py")
onchip_e2e = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(onchip_e2e)


def heldout_psnr(scene, params, sh: int, kc_eval: int = 32768) -> float:
    """Shared high-capacity EXACT eval: drop-free for every run under
    comparison, so the metric measures the trained model, not the raster."""
    import jax.numpy as jnp

    from street_crafter_tpu.models.gs.renderer import render_scene

    ps = []
    for info, cam in zip(scene.info.test_cameras, scene.test_cameras):
        b = scene.batch_for(info)
        if "gt_image" not in b:
            continue
        out = render_scene(
            params, scene.meta, cam, frame_idx=b["frame_idx"],
            frame=b["frame"], cam_id=b["cam_id"],
            timestamp=b.get("timestamp"), sh_degree=sh,
            max_per_coarse=kc_eval, max_per_tile=2048,
            select_method="exact", recall_target=0.95, clamp=True,
            method="xla")["rgb"]
        mse = float(jnp.mean((out - b["gt_image"]) ** 2))
        ps.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(ps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=800)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--classes", default="4096,16384")
    ap.add_argument("--root", default="")
    args = ap.parse_args()
    onchip_e2e._enable_compile_cache()

    from tests.synthetic_scene import make_scene

    root = args.root or tempfile.mkdtemp(prefix="train_capacity_")
    scene_dir = make_scene(root, num_frames=args.frames,
                           img_hw=(args.height, args.width))
    c0 = onchip_e2e.build_config(scene_dir, os.path.join(root, "gt"),
                                 args.iters)
    onchip_e2e.write_gt_images(c0)

    rows = {}
    for kc in (int(x) for x in args.classes.split(",")):
        from street_crafter_tpu.runner.train import GSTrainer
        from street_crafter_tpu.runner.scene import create_scene

        c = onchip_e2e.build_config(scene_dir,
                                    os.path.join(root, f"model_kc{kc}"),
                                    args.iters)
        c.train.test_iterations = []
        c.render.train_auto_capacity = False
        c.render.max_intersects_per_coarse = kc
        scene = create_scene(c)
        trainer = GSTrainer(c, scene)
        trainer.train_kc = kc   # fixed class for this run
        t0 = time.perf_counter()
        trainer.run()
        wall = time.perf_counter() - t0
        report = trainer.evaluate(trainer.active_sh(args.iters))
        psnr_shared = heldout_psnr(scene, trainer.state.params,
                                   trainer.active_sh(args.iters))
        rows[kc] = {
            "iters": args.iters, "wall_s": round(wall, 1),
            "heldout_psnr_exact_db": round(psnr_shared, 2),
            "train_coarse_dropped": report.get("train_coarse_dropped"),
            "train_row_dropped": report.get("train_row_dropped"),
        }
        print(f"[kc={kc}] {rows[kc]}", flush=True)

    print(json.dumps({"metric": "train_capacity_ablation", "rows": rows}))


if __name__ == "__main__":
    main()
