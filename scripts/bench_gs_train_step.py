"""GS training-step throughput on the real chip.

Times the full jitted train step (render fwd + loss stack + backward +
per-pool Adam) at Waymo-like resolution over a 200k-splat background pool —
the 30k-iteration inner loop of the reference's train.py.

Measured (v5e, 640x960 / 200k): 90 ms/iter steady-state -> 30k iters in
~45 min. NOTE the first timed loop after compile reads 130-1000 ms/iter
over the axon tunnel (executable warm-up, magnitude varies run-to-run);
this script therefore runs two loops and reports the second.

Usage: python scripts/bench_gs_train_step.py [N] [H W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.config import default_config
from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.scene import SceneParams
from street_crafter_tpu.training.gs_trainer import (init_train_state,
                                                    make_train_step)

from bench import build_trained_like_scene


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    H = int(sys.argv[2]) if len(sys.argv) > 3 else 640
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 960

    pool = build_trained_like_scene(N)
    params = SceneParams(
        bkgd=pool, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None)
    state = init_train_state(params)

    cfg = default_config()
    cfg.optim.lambda_depth_lidar = 0.0
    cfg.optim.allow_missing_lpips = True
    cfg.render.max_intersects_per_tile = 256
    step_fn = make_train_step(cfg, None, spatial_lr_scale=1.0)

    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    gts = [jax.random.uniform(jax.random.PRNGKey(i), (H, W, 3))
           for i in range(3)]

    def batch_for(i):
        return {"gt_image": gts[i % 3], "frame_idx": jnp.int32(0),
                "frame": jnp.float32(0), "cam_id": jnp.int32(0)}

    iters = 12
    keys = jax.random.split(jax.random.PRNGKey(0), iters + 1)
    state, scalars = step_fn(state, cam, batch_for(0), keys[-1])
    _ = float(scalars["loss"])
    print("compiled; timing ...", flush=True)

    for rep in range(2):  # loop 0 is tunnel warm-up; report loop 1
        t0 = time.perf_counter()
        for i in range(iters):
            state, scalars = step_fn(state, cam, batch_for(i), keys[i])
        _ = float(scalars["loss"])
        dt = (time.perf_counter() - t0) / iters
    print(f"GS train step {H}x{W} / {N} splats: {dt*1e3:.1f} ms/iter "
          f"-> 30k iters in {dt*30000/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
