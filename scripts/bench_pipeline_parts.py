"""Selection/SH sub-part economics of the fused render on the headline
scene (600k heavy-tailed, 1066x1600).

Parts (pipelined distinct inputs, one fetch, second timed loop reported):
  proj            projection only
  proj+sh f32     + SH eval from f32 [N,16,3] coefficients (115 MB read)
  proj+sh bf16    + SH eval from bf16 coefficients (58 MB read)
  key-only        + coarse intersection mask + masked key materialization
  +approx         + approx_min_k (aggregate_to_topk=True, r=0.85)
  FULL f32 / bf16 full fused render with f32 vs bf16 SH storage (+PSNR)

Usage: python scripts/bench_pipeline_parts.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.ops import sh as SH
from street_crafter_tpu.ops.gs_projection import project_gaussians
from street_crafter_tpu.models.gs.renderer import render_flat

from bench import build_trained_like_scene, flat_from_pool

_INF = jnp.float32(1e10)


def main():
    N = 600_000
    H, W = 1066, 1600
    pool = build_trained_like_scene(N)
    flat = flat_from_pool(pool)
    flat_bf16 = flat._replace(shs=flat.shs.astype(jnp.bfloat16))
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    w2cs = [jnp.asarray(np.asarray(cam.w2c)).at[0, 3].add(0.002 * i)
            for i in range(4)]
    Kj = jnp.asarray(K)
    cts = 128
    TWc = -(-W // cts)
    THc = -(-H // cts)

    def timed(fn, fl, iters=12):
        _ = float(fn(fl, w2cs[0]))
        for _loop in range(2):
            t0 = time.perf_counter()
            outs = [fn(fl, w2cs[i % 4]) for i in range(iters)]
            _ = float(outs[-1])
            dt = (time.perf_counter() - t0) / iters
        return dt

    def stage(fl, w2c, *, with_sh=False, with_key=False, with_topk=False):
        proj = project_gaussians(fl.xyz, fl.rotation, fl.scaling, w2c, Kj,
                                 W, H, mask=fl.valid)
        acc = jnp.sum(proj.u) + jnp.sum(proj.conic_a)
        if with_sh:
            dirs = fl.xyz - cam.camera_center[None]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
            cols = SH.eval_sh(3, jnp.swapaxes(fl.shs, -1, -2), dirs)
            acc = acc + jnp.sum(cols.astype(jnp.float32))
        if with_key:
            u, v, r = proj.u, proj.v, proj.radii
            x0, x1, y0, y1 = u - r, u + r, v - r, v + r
            dk = jnp.where(proj.valid, proj.depths, _INF)
            ty, tx = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                                  jnp.arange(TWc, dtype=jnp.float32),
                                  indexing="ij")
            cx0 = (tx.reshape(-1) * cts)[:, None]
            cy0 = (ty.reshape(-1) * cts)[:, None]
            inter = ((x0[None] < cx0 + cts) & (x1[None] > cx0)
                     & (y0[None] < cy0 + cts) & (y1[None] > cy0))
            key = jnp.where(inter, dk[None], _INF)
            if with_topk:
                d, idx = jax.lax.approx_min_k(key, 4096, recall_target=0.85,
                                              aggregate_to_topk=True)
                acc = acc + jnp.sum(d) + jnp.sum(idx)
            else:
                acc = acc + jnp.sum(key)
        return acc

    for name, kw in (("proj", {}),
                     ("proj+sh", dict(with_sh=True)),
                     ("key-only", dict(with_key=True)),
                     ("+approx", dict(with_key=True, with_topk=True))):
        fn = jax.jit(functools.partial(stage, **kw))
        print(f"{name:14s} f32 : {timed(fn, flat)*1e3:7.2f} ms", flush=True)
        if name == "proj+sh":
            print(f"{name:14s} bf16: {timed(fn, flat_bf16)*1e3:7.2f} ms",
                  flush=True)

    def full(fl, w2c, want_img=False):
        out = render_flat(fl, w2c, Kj, cam.camera_center, W, H, sh_degree=3,
                          method="fused", recall_target=0.85)
        if want_img:
            return out["rgb"].astype(jnp.float32)
        return jnp.sum(out["rgb"].astype(jnp.float32))

    ffull = jax.jit(full)
    dt32 = timed(ffull, flat, iters=20)
    dt16 = timed(ffull, flat_bf16, iters=20)
    img32 = np.asarray(jax.jit(
        functools.partial(full, want_img=True))(flat, w2cs[0]))
    img16 = np.asarray(jax.jit(
        functools.partial(full, want_img=True))(flat_bf16, w2cs[0]))
    mse = float(np.mean((img32 - img16) ** 2))
    print(f"FULL f32 shs : {dt32*1e3:7.2f} ms ({1/dt32:5.1f} FPS)")
    print(f"FULL bf16 shs: {dt16*1e3:7.2f} ms ({1/dt16:5.1f} FPS)  "
          f"PSNR vs f32 {-10*np.log10(mse + 1e-12):.1f} dB")


if __name__ == "__main__":
    main()
