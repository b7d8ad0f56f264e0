"""Stage breakdown of the fused render path on the heavy-tailed headline
scene (bench.py build_trained_like_scene, 600k, 1066x1600).

Times, with pipelined distinct inputs + one final host fetch (CLAUDE.md):
  (a) projection+SH only
  (b) + coarse intersection mask + approx_min_k + gather (selection)
  (c) full fused render
at a (kc, recall, coarse_factor) grid.

Usage: python scripts/bench_heavy_breakdown.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.renderer import render_flat
from street_crafter_tpu.ops.gs_projection import project_gaussians
from street_crafter_tpu.ops import sh as SH

from bench import build_trained_like_scene, flat_from_pool

_INF = jnp.float32(1e10)


def timed(fn, args_list, iters=8):
    out = fn(*args_list[0])
    _ = float(out)
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    H, W = 1066, 1600
    pool = build_trained_like_scene(N)
    flat = flat_from_pool(pool)
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    w2cs = [jnp.asarray(np.asarray(cam.w2c)).at[0, 3].add(0.002 * i)
            for i in range(4)]
    Kj = jnp.asarray(K)

    @jax.jit
    def proj_only(flat, w2c):
        proj = project_gaussians(flat.xyz, flat.rotation, flat.scaling,
                                 w2c, Kj, W, H, mask=flat.valid)
        cols = SH.eval_sh(3, jnp.swapaxes(flat.shs, -1, -2),
                          flat.xyz - cam.camera_center[None]) + 0.5
        return (jnp.sum(proj.u) + jnp.sum(proj.depths)
                + jnp.sum(cols.astype(jnp.float32)))

    if "--all" in sys.argv:
        print(f"projection+SH: {timed(proj_only, [(flat, w) for w in w2cs])*1e3:8.2f} ms")

    def make_select(kc, recall, cf, method="approx"):
        cts = 16 * cf
        TWc = -(-W // cts)
        THc = -(-H // cts)

        @jax.jit
        def select(flat, w2c):
            proj = project_gaussians(flat.xyz, flat.rotation, flat.scaling,
                                     w2c, Kj, W, H, mask=flat.valid)
            u, v, radii = proj.u, proj.v, proj.radii
            x0, x1 = u - radii, u + radii
            y0, y1 = v - radii, v + radii
            dk = jnp.where(proj.valid, proj.depths, _INF)
            tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                                    jnp.arange(TWc, dtype=jnp.float32),
                                    indexing="ij")
            cx0 = (txc.reshape(-1) * cts)[:, None]
            cy0 = (tyc.reshape(-1) * cts)[:, None]
            inter = ((x0[None] < cx0 + cts) & (x1[None] > cx0)
                     & (y0[None] < cy0 + cts) & (y1[None] > cy0))
            key = jnp.where(inter, dk[None], _INF)
            if method == "exact":
                negd, idx = jax.lax.top_k(-key, kc)
                d = -negd
            else:
                d, idx = jax.lax.approx_min_k(key, kc, recall_target=recall,
                                              aggregate_to_topk=True)
            cand = flat.xyz[idx]   # representative gather
            return jnp.sum(d) + jnp.sum(cand)
        return select

    if "--all" in sys.argv:
        for kc, recall, cf in ((4096, 0.85, 8), (8192, 0.85, 8)):
            f = make_select(kc, recall, cf)
            dt = timed(f, [(flat, w) for w in w2cs])
            print(f"proj+select kc={kc} r={recall} cf={cf}: {dt*1e3:8.2f} ms")

    from street_crafter_tpu.models.gs import renderer as rmod

    ref_img = None
    for kc, kr, recall, cf, sel, b16, dbg, ph1 in (
            (4096, 1024, 0.85, 8, "approx", False, True, False),   # no kernel
            (4096, 1024, 0.85, 8, "approx", False, False, True),   # phase1 only
            (4096, 1024, 0.85, 8, "approx", False, False, False)):  # full
        def full(flat, w2c, kc=kc, kr=kr, recall=recall, cf=cf, sel=sel,
                 b16=b16, dbg=dbg, ph1=ph1, want_img=False):
            proj = rmod.project_gaussians(
                flat.xyz, flat.rotation, flat.scaling, w2c, Kj, W, H,
                mask=flat.valid)
            dirs = flat.xyz - cam.camera_center[None]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
            cols = SH.eval_sh(3, jnp.swapaxes(flat.shs, -1, -2), dirs) + 0.5
            chan = jnp.concatenate(
                [jnp.maximum(cols, 0.0), proj.depths[:, None]], -1)
            from street_crafter_tpu.ops.gs_raster_fused import (
                rasterize_pixels_fused)
            out = rasterize_pixels_fused(
                proj.u, proj.v, proj.conic_a, proj.conic_b, proj.conic_c,
                chan, flat.opacity * proj.compensations, proj.depths,
                proj.valid, proj.radii, width=W, height=H, tile_size=16,
                coarse_factor=cf, max_per_coarse=kc, max_per_row=kr,
                select_method=sel, recall_target=recall, bf16_composite=b16,
                _debug_no_kernel=dbg, _debug_phase1=ph1)
            if want_img:
                return out.colors[..., :3].astype(jnp.float32)
            return jnp.sum(out.colors[..., :3].astype(jnp.float32))
        dt = timed(jax.jit(full), [(flat, w) for w in w2cs])
        if dbg or ph1:
            acc = "pipeline-only" if dbg else "phase1-only"
        else:
            img = np.asarray(jax.jit(
                lambda f, w: full(f, w, want_img=True))(flat, w2cs[0]))
            if ref_img is None:
                ref_img = img
                acc = "ref"
            else:
                mse = float(np.mean((img - ref_img) ** 2))
                acc = f"{-10*np.log10(mse + 1e-12):.1f} dB"
        print(f"FULL fused kc={kc} kr={kr} r={recall} b16={int(b16)} "
              f"dbg={int(dbg)} ph1={int(ph1)}: {dt*1e3:8.2f} ms  "
              f"({1/dt:.1f} FPS)  vs-full: {acc}")


if __name__ == "__main__":
    main()
