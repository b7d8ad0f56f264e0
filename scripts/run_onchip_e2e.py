"""On-chip end-to-end GS training: synthetic scene in the real on-disk
format -> runner.train loop on the TPU -> held-out PSNR + iteration timing.

This is the full training stack (scene build, condition rendering, loss
stack, fused-train raster, densify/prune/reset, per-group Adam, eval) on
real hardware — the closest available stand-in for the real-Waymo parity
run (VERDICT r1 #2) in a zero-egress environment.

Usage: python scripts/run_onchip_e2e.py [--iters 2000] [--frames 4]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--root", default="")
    args = ap.parse_args()

    root = args.root or tempfile.mkdtemp(prefix="onchip_e2e_")
    from tests.synthetic_scene import make_scene
    scene_dir = make_scene(root, num_frames=args.frames)

    from street_crafter_tpu.config import default_config
    c = default_config()
    c.source_path = scene_dir
    c.model_path = os.path.join(root, "model")
    c.data.cameras = [0]
    c.data.split_test = 2   # every-2nd frame held out (get_val_frames analog)
    c.train.iterations = args.iters
    c.train.test_iterations = [args.iters // 2, args.iters]
    c.train.checkpoint_iterations = [args.iters]
    c.train.save_iterations = [args.iters]
    c.train.novel_view_prob = 0.0
    c.train.log_interval = 500
    c.optim.densify_from_iter = 200
    c.optim.densification_interval = 100
    c.optim.densify_until_iter = args.iters // 2
    c.optim.opacity_reset_interval = 100000
    c.render.novel_view.shift = [2.0]
    c.optim.allow_missing_lpips = True

    from street_crafter_tpu.runner.train import train
    t0 = time.perf_counter()
    train(c)
    dt = time.perf_counter() - t0
    print(f"on-chip e2e: {args.iters} iters in {dt:.1f} s "
          f"({dt / args.iters * 1e3:.1f} ms/iter incl. compile+eval+io)")
    print(f"outputs in {c.model_path}")


if __name__ == "__main__":
    main()
