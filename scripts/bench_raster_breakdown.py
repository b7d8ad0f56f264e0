"""Stage-level timing of the rasterizer on the real chip.

Times (a) full render, (b) selection-only (coarse mask + approx_min_k +
gather), (c) selection variants, at 640x960 and 1066x1600, using pipelined
distinct-input calls with one final block (tunnel-RTT rule, CLAUDE.md).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.renderer import render_flat
from street_crafter_tpu.models.gs.scene import FlatGaussians

from bench import build_scene


def timeit(fn, args_list, iters=10):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pool = build_scene(N)
    flat = FlatGaussians(
        xyz=pool.xyz, rotation=pool.get_rotation(),
        scaling=pool.get_scaling(), opacity=pool.get_opacity()[:, 0],
        shs=pool.get_features(), valid=pool.valid)

    for (H, W) in ((640, 960), (1066, 1600)):
        K = np.array([[1000.0, 0, W / 2], [0, 1000.0, H / 2], [0, 0, 1]],
                     np.float32)
        cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
        w2c = cam.w2c

        # distinct inputs: jitter the camera slightly per call
        w2cs = [jnp.asarray(np.asarray(w2c) +
                            np.diag([0, 0, 0, 0]).astype(np.float32))
                .at[0, 3].add(0.001 * i) for i in range(4)]

        @jax.jit
        def render(flat, w2c):
            out = render_flat(flat, w2c, jnp.asarray(K), cam.camera_center,
                              W, H, sh_degree=3, tile_size=16,
                              max_per_tile=256, bf16_composite=True,
                              recall_target=0.85)
            return out["rgb"]

        dt = timeit(render, [(flat, w) for w in w2cs])
        print(f"[{H}x{W}] full render: {dt*1e3:8.2f} ms  ({1/dt:6.1f} FPS)")

        # selection-only: project + coarse mask + approx_min_k + gather
        from street_crafter_tpu.ops.gs_projection import project_gaussians

        def sel_only(flat, w2c, kc, cts, recall, bf16_key):
            proj = project_gaussians(
                flat.xyz, flat.rotation, flat.scaling, w2c, jnp.asarray(K),
                W, H, mask=flat.valid)
            u, v, radii = proj.u, proj.v, proj.radii
            depth_key = jnp.where(proj.valid, proj.depths, 1e10)
            if bf16_key:
                depth_key = depth_key.astype(jnp.bfloat16)
            x0, x1 = u - radii, u + radii
            y0, y1 = v - radii, v + radii
            TWc, THc = -(-W // cts), -(-H // cts)
            tyc, txc = jnp.meshgrid(
                jnp.arange(THc, dtype=jnp.float32),
                jnp.arange(TWc, dtype=jnp.float32), indexing="ij")
            cx0 = (txc.reshape(-1) * cts)[:, None]
            cy0 = (tyc.reshape(-1) * cts)[:, None]
            inter = ((x0[None] < cx0 + cts) & (x1[None] > cx0)
                     & (y0[None] < cy0 + cts) & (y1[None] > cy0))
            key = jnp.where(inter, depth_key[None],
                            jnp.asarray(1e10, depth_key.dtype))
            vals, idx = jax.lax.approx_min_k(
                key, kc, recall_target=recall, aggregate_to_topk=True)
            attrs = jnp.stack([u, v, proj.conic_a, proj.conic_b,
                               proj.conic_c, flat.opacity], -1)
            cand = attrs[idx]
            return cand.sum(), vals.sum()

        for kc, cts, recall, bf16k in ((4096, 128, 0.85, False),
                                       (4096, 128, 0.85, True),
                                       (3072, 128, 0.85, False),
                                       (4096, 256, 0.85, False),
                                       (8192, 256, 0.85, False),
                                       (2048, 64, 0.85, False)):
            f = jax.jit(lambda fl, w, kc=kc, cts=cts, r=recall, b=bf16k:
                        sel_only(fl, w, kc, cts, r, b))
            try:
                dt = timeit(f, [(flat, w) for w in w2cs])
                print(f"  sel kc={kc} cts={cts} bf16={int(bf16k)}: "
                      f"{dt*1e3:7.2f} ms")
            except Exception as e:
                print(f"  sel kc={kc} cts={cts}: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
