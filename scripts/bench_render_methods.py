"""Time XLA vs fused-Pallas render paths on the real chip at both
resolutions, with host-materialized scalar outputs (block_until_ready is not
reliable over the axon tunnel — see CLAUDE.md / bench_unet.py).

Usage: python scripts/bench_render_methods.py [N]
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
    _ = float(out)  # materialize
    t0 = time.perf_counter()
    outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
    _ = float(outs[-1])
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
        w2cs = [jnp.asarray(np.asarray(w2c)).at[0, 3].add(0.001 * i)
                for i in range(4)]

        def make(method, recall, bf16, mpt=256):
            @jax.jit
            def render(flat, w2c):
                out = render_flat(flat, w2c, jnp.asarray(K),
                                  cam.camera_center, W, H, sh_degree=3,
                                  tile_size=16, max_per_tile=mpt,
                                  bf16_composite=bf16, method=method,
                                  recall_target=recall)
                return jnp.sum(out["rgb"].astype(jnp.float32))
            return render

        # accuracy: fused vs training-fidelity XLA
        ref = jax.jit(lambda f, w: render_flat(
            f, w, jnp.asarray(K), cam.camera_center, W, H, sh_degree=3,
            tile_size=16, max_per_tile=1024, method="xla",
            recall_target=0.95)["rgb"])(flat, w2cs[0])

        fu = jax.jit(lambda f, w: render_flat(
            f, w, jnp.asarray(K), cam.camera_center, W, H, sh_degree=3,
            tile_size=16, method="fused", recall_target=0.95)["rgb"])(
            flat, w2cs[0])
        mse = float(jnp.mean((ref - fu) ** 2))
        print(f"[{H}x{W}] fused-vs-xla(0.95/f32) PSNR: "
              f"{-10*np.log10(mse+1e-12):.1f} dB")

        for label, method, recall, bf16 in (
                ("xla eval (r.85 bf16)", "xla", 0.85, True),
                ("xla train (r.95 f32)", "xla", 0.95, False),
                ("fused r.85", "fused", 0.85, False),
                ("fused r.95", "fused", 0.95, False)):
            f = make(method, recall, bf16)
            dt = timeit(f, [(flat, w) for w in w2cs])
            print(f"  {label:24s}: {dt*1e3:7.2f} ms ({1/dt:6.1f} FPS)")


if __name__ == "__main__":
    main()
