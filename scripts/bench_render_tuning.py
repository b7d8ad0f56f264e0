"""Tuning sweep for the headline render (1066x1600, 600k heavy-tailed):

- proj+SH pipeline cost (validates the eval_sh_columns lane fix)
- fused render at (kc, kf, recall, bf16_composite) variants
- PSNR of each variant vs a high-capacity exact-select reference
- overflow stats per variant

Usage: python scripts/bench_render_tuning.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.renderer import render_flat

from bench import build_trained_like_scene, flat_from_pool

H, W = 1066, 1600


def timed(fn, args_list, iters=10):
    _ = float(fn(*args_list[0]))
    for _loop in range(2):
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    N = 600_000
    pool = build_trained_like_scene(N)
    flat = flat_from_pool(pool)
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    Kj = jnp.asarray(K)
    w2cs = [jnp.asarray(np.asarray(cam.w2c)).at[0, 3].add(0.002 * i)
            for i in range(4)]

    # --- proj+SH cost (columns formulation) --------------------------------
    from street_crafter_tpu.ops.gs_projection import project_gaussians
    from street_crafter_tpu.ops import sh as SH

    @jax.jit
    def proj_cols(flat, w2c):
        proj = project_gaussians(flat.xyz, flat.rotation, flat.scaling,
                                 w2c, Kj, W, H, mask=flat.valid)
        dirs = flat.xyz - cam.camera_center[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        cols = SH.eval_sh_columns(3, flat.shs, dirs)
        return (jnp.sum(proj.u) + jnp.sum(proj.depths)
                + jnp.sum(cols.astype(jnp.float32)))

    @jax.jit
    def proj_einsum(flat, w2c):
        proj = project_gaussians(flat.xyz, flat.rotation, flat.scaling,
                                 w2c, Kj, W, H, mask=flat.valid)
        dirs = flat.xyz - cam.camera_center[None]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        cols = SH.eval_sh(3, jnp.swapaxes(flat.shs, -1, -2), dirs)
        return (jnp.sum(proj.u) + jnp.sum(proj.depths)
                + jnp.sum(cols.astype(jnp.float32)))

    ins = [(flat, w) for w in w2cs]
    print(f"proj+SH einsum : {timed(proj_einsum, ins)*1e3:7.2f} ms",
          flush=True)
    print(f"proj+SH columns: {timed(proj_cols, ins)*1e3:7.2f} ms",
          flush=True)

    # --- reference image (exact select, high capacity, f32) ---------------
    def make(method="fused", recall=0.85, bf16=False, kc=4096, kf=1024,
             select="approx", want_img=False):
        @jax.jit
        def render(flat, w2c):
            out = render_flat(flat, w2c, Kj, cam.camera_center, W, H,
                              sh_degree=3, tile_size=16, method=method,
                              bf16_composite=bf16, recall_target=recall,
                              max_per_coarse=kc, max_per_row=kf)
            if want_img:
                return out["rgb"]
            return jnp.sum(out["rgb"].astype(jnp.float32))
        return render

    # high-capacity reference via the XLA path (the training-fidelity
    # rasterizer; kc=8192/kf=2048 blows the compact kernel's scoped VMEM)
    @jax.jit
    def ref_img(flat, w2c):
        out = render_flat(flat, w2c, Kj, cam.camera_center, W, H,
                          sh_degree=3, tile_size=16, method="xla",
                          bf16_composite=False, recall_target=0.95,
                          max_per_coarse=6144, max_per_tile=1024)
        return out["rgb"]

    ref = np.asarray(ref_img(flat, w2cs[0]))

    def psnr(img):
        mse = float(np.mean((np.asarray(img) - ref) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    variants = [
        ("kc4096 kf1024 r.85 f32 (current)", dict()),
        ("kc4096 kf1024 r.85 bf16", dict(bf16=True)),
        ("kc3072 kf1024 r.85 f32", dict(kc=3072)),
        ("kc3072 kf768  r.85 bf16", dict(kc=3072, kf=768, bf16=True)),
        ("kc4096 kf768  r.85 f32", dict(kf=768)),
        ("kc2048 kf1024 r.85 f32", dict(kc=2048)),
        ("kc4096 kf1024 r.80 f32", dict(recall=0.80)),
    ]
    for tag, kw in variants:
        f = make(**kw)
        dt = timed(f, ins)
        img = make(want_img=True, **kw)(flat, w2cs[0])
        print(f"{tag:36s}: {dt*1e3:7.2f} ms  {1/dt:6.1f} FPS  "
              f"PSNR {psnr(img):5.1f} dB", flush=True)


if __name__ == "__main__":
    main()
