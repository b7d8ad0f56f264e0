"""Benchmark entry: prints ONE JSON line.

Round-1 headline: 3DGS trajectory-render throughput (FPS) on a synthetic
street-scale scene at Waymo-like resolution, on the available accelerator.
Baseline target: >= 60 FPS (BASELINE.md north star; the reference publishes
no render-throughput number, so vs_baseline is FPS / 60).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_scene(n: int, seed: int = 0):
    from street_crafter_tpu.models.gs.params import init_pool_from_points
    rng = np.random.default_rng(seed)
    # street-like slab of points ahead of the camera
    pts = np.stack([
        rng.uniform(-30, 30, n),
        rng.uniform(-5, 5, n),
        rng.uniform(2, 80, n)], -1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_pool_from_points(pts, cols, capacity=n, fixed_scale=0.05,
                                 init_opacity=0.8)


def main():
    from street_crafter_tpu.datasets import Camera
    from street_crafter_tpu.models.gs.renderer import render_flat
    from street_crafter_tpu.models.gs.scene import FlatGaussians

    N = 200_000
    H, W = 640, 960
    pool = build_scene(N)
    flat = FlatGaussians(
        xyz=pool.xyz, rotation=pool.get_rotation(),
        scaling=pool.get_scaling(), opacity=pool.get_opacity()[:, 0],
        shs=pool.get_features(), valid=pool.valid)
    K = np.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)

    @jax.jit
    def render(flat, w2c, K, center):
        out = render_flat(flat, w2c, K, center, W, H,
                          sh_degree=3, tile_size=16, max_per_tile=256,
                          bf16_composite=True, recall_target=0.85)
        return out["rgb"]

    w2c = cam.w2c
    center = cam.camera_center
    img = render(flat, w2c, jnp.asarray(K), center)
    img.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        img = render(flat, w2c, jnp.asarray(K), center)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "gs_trajectory_render_fps_640x960_200k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
