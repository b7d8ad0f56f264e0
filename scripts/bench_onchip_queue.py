"""Serial on-chip measurement queue (one process = one axon tunnel).

Runs, in order:
  1. GS train step xla vs fused_train at 640x960/200k (the new
     ops/gs_raster_train.py path) + on-chip gradient agreement spot check.
  2. Temporal fused-block RS sweep at level-0 shape (RS 8/16/32/64).
  3. Fine-tune remat-policy probe: delegates to
     `bench_unet.py --grad --remat-policy {nothing,dots}` (run separately;
     each holds the full 1.5B UNet so they must not share a process).

Usage: python scripts/bench_onchip_queue.py [--gs-only|--rs-only]
       python scripts/bench_unet.py --grad --remat-policy dots --iters 4
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed_loops(step, n_iters, n_loops=2):
    """Run `step(i)` n_iters times per loop; block once per loop; return the
    LAST loop's per-iter seconds (first loop is tunnel warm-up)."""
    for _ in range(n_loops):
        t0 = time.perf_counter()
        out = None
        for i in range(n_iters):
            out = step(i)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n_iters
    return dt


def bench_gs_train():
    from street_crafter_tpu.config import default_config
    from street_crafter_tpu.datasets import Camera
    from street_crafter_tpu.models.gs.scene import SceneParams
    from street_crafter_tpu.training.gs_trainer import (init_train_state,
                                                        make_train_step)
    from bench import build_trained_like_scene

    N, H, W = 200_000, 640, 960
    pool = build_trained_like_scene(N)
    params = SceneParams(
        bkgd=pool, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None)

    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    gts = [jax.random.uniform(jax.random.PRNGKey(i), (H, W, 3))
           for i in range(3)]

    def batch_for(i):
        return {"gt_image": gts[i % 3], "frame_idx": jnp.int32(0),
                "frame": jnp.float32(0), "cam_id": jnp.int32(0)}

    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    results = {}
    for method in ("xla", "fused_train"):
        cfg = default_config()
        cfg.optim.lambda_depth_lidar = 0.0
        cfg.optim.allow_missing_lpips = True
        cfg.render.max_intersects_per_tile = 256
        cfg.render.train_method = method
        step_fn = make_train_step(cfg, None, spatial_lr_scale=1.0)
        state = init_train_state(params)
        t0 = time.perf_counter()
        state, scalars = step_fn(state, cam, batch_for(0), keys[-1])
        loss0 = float(scalars["loss"])
        print(f"[{method}] compiled in {time.perf_counter()-t0:.1f} s, "
              f"loss {loss0:.4f}", flush=True)
        st = {"s": state}

        def step(i, st=st):
            st["s"], sc = step_fn(st["s"], cam, batch_for(i), keys[i % 12])
            return sc["loss"]

        dt = timed_loops(step, 12)
        results[method] = (dt, loss0)
        print(f"[{method}] {dt*1e3:.1f} ms/iter "
              f"-> 30k iters {dt*30000/60:.1f} min", flush=True)
    lx, lf = results["xla"][1], results["fused_train"][1]
    print(f"loss agreement xla={lx:.5f} fused={lf:.5f} "
          f"rel={abs(lx-lf)/max(abs(lx),1e-9):.2e}", flush=True)


def bench_rs_sweep():
    from street_crafter_tpu.ops.temporal_block import temporal_block_fused

    BT, S, C, T, heads, dh = 50, 9216, 320, 25, 5, 64
    B = BT // T
    inner = 4 * C
    k = jax.random.split(jax.random.PRNGKey(0), 24)
    h = [jax.random.normal(k[i], (BT, S, C), jnp.bfloat16) * 0.3
         for i in range(3)]
    emb = jax.random.normal(k[3], (BT, C), jnp.bfloat16) * 0.3
    alpha = jnp.float32(0.6)
    bias = jax.random.normal(k[4], (B, C), jnp.bfloat16) * 0.1
    wn = lambda i, *s: jax.random.normal(k[5 + i], s, jnp.bfloat16) * 0.02
    weights = [
        jnp.ones((C,), jnp.bfloat16), jnp.zeros((C,), jnp.bfloat16),
        wn(0, C, 2 * inner), jnp.zeros((2 * inner,), jnp.bfloat16),
        wn(1, inner, C), jnp.zeros((C,), jnp.bfloat16),
        jnp.ones((C,), jnp.bfloat16), jnp.zeros((C,), jnp.bfloat16),
        wn(2, C, 3 * C), wn(3, C, C), jnp.zeros((C,), jnp.bfloat16),
        jnp.ones((C,), jnp.bfloat16), jnp.zeros((C,), jnp.bfloat16),
        wn(4, C, 2 * inner), jnp.zeros((2 * inner,), jnp.bfloat16),
        wn(5, inner, C), jnp.zeros((C,), jnp.bfloat16),
    ]

    ref = None
    for rs in (8, 16, 32, 64):
        try:
            fn = jax.jit(lambda x, rs=rs: temporal_block_fused(
                x, emb, alpha, bias, *weights, num_frames=T, heads=heads,
                dim_head=dh, rows_per_block=rs))
            out = fn(h[0])
            jax.block_until_ready(out)
        except Exception as e:  # VMEM/Mosaic failures expected at high RS
            print(f"RS={rs}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        if ref is None:
            ref = np.asarray(out[0, :64].astype(jnp.float32))
        else:
            got = np.asarray(out[0, :64].astype(jnp.float32))
            err = np.abs(got - ref).max()
            assert err < 2e-2, (rs, err)

        def step(i, fn=fn):
            return fn(h[i % 3])

        dt = timed_loops(step, 8)
        print(f"RS={rs}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    if "--rs-only" not in sys.argv:
        bench_gs_train()
    if "--gs-only" not in sys.argv:
        bench_rs_sweep()
