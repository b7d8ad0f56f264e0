"""Validate + measure the W8A8 int8 UNet eval path end-to-end (VERDICT r2 #2).

On the real chip, at the sample_condition spec (25 frames, 72x128 latents,
CFG doubling -> BT=50), with FIXED deterministic weights (the cos fill from
bench_unet.py — non-constant so every channel is distinct):

  1. quality — forward the SAME params+inputs through
       (a) f32 params / f32 policy   (numerics reference)
       (b) bf16 policy               (production eval path)
       (c) bf16 policy + quant_convs (Int8Conv W8A8)
     and report max|delta| and per-frame PSNR of (b) and (c) vs (a),
     so quant's ADDED error is visible next to bf16's own error.
  2. speed — two-loop timing (CLAUDE.md tunnel rule) of (b) vs (c).

Reference comparison note: the reference samples under fp16 autocast
(video_diffusion/sample_condition.py), so a reduced-precision eval path is
like-for-like; this script decides whether int8 buys real wall-clock at an
acceptable numerics cost. Usage:

  python scripts/validate_int8_eval.py [--frames 25] [--iters 6] [--skip-f32]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet


def make_inputs(cfg, BT, T, H, W, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (BT, H, W, cfg.in_channels), jnp.float32)
    t = jnp.full((BT,), 0.25, jnp.float32)
    ctx = jax.random.normal(ks[1], (BT, 1, cfg.context_dim), jnp.float32)
    y = jax.random.normal(ks[2], (BT, cfg.adm_in_channels), jnp.float32)
    cond_mask = jnp.zeros((BT,), jnp.float32).at[::T].set(1.0)
    guide = jax.random.normal(ks[3], (BT, H, W, cfg.in_channels // 2),
                              jnp.float32)
    gscale = jnp.concatenate(
        [jnp.ones((T,))] + [jnp.zeros((T,))] * (BT // T - 1)).astype(
            jnp.float32)
    return x, t, ctx, y, cond_mask, guide, gscale


def materialize(model, cfg, inp, T, pdt):
    shapes = jax.eval_shape(
        lambda k: model.init(k, inp[0], inp[1], inp[2], inp[3], num_frames=T,
                             cond_mask=inp[4], guidance_input=inp[5],
                             guidance_scale=inp[6]),
        jax.random.PRNGKey(0))

    @jax.jit
    def fill_tree():
        def fill(sd):
            n = 1
            for s in sd.shape:
                n *= s
            i = jnp.arange(n, dtype=jnp.int32) % 100003
            return (0.02 * jnp.cos(i.astype(jnp.float32) * 0.7)
                    ).reshape(sd.shape).astype(pdt)
        return jax.tree.map(fill, shapes)

    return fill_tree()


def psnr_per_frame(ref, out):
    """ref/out: [BT, H, W, C] f32 numpy. Returns [BT] PSNR in dB."""
    peak = float(np.abs(ref).max())
    mse = ((ref - out) ** 2).mean(axis=(1, 2, 3))
    return 10.0 * np.log10(peak ** 2 / np.maximum(mse, 1e-30))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--skip-f32", action="store_true",
                    help="skip the f32 numerics reference (memory fallback)")
    args = ap.parse_args()

    T, H, W = args.frames, args.height, args.width
    B = 2  # CFG doubling
    BT = B * T

    variants = {}
    if not args.skip_f32:
        variants["f32"] = (UNetConfig(remat=False, dtype=None), jnp.float32)
    variants["bf16"] = (UNetConfig(remat=False, dtype="bfloat16"),
                        jnp.bfloat16)
    variants["int8"] = (UNetConfig(remat=False, dtype="bfloat16",
                                   quant_convs=True), jnp.bfloat16)

    cfg0 = variants["bf16"][0]
    inp = make_inputs(cfg0, BT, T, H, W)

    outs, timings = {}, {}
    for name, (cfg, pdt) in variants.items():
        model = VideoUNet(cfg)
        t0 = time.perf_counter()
        params = materialize(model, cfg, inp, T, pdt)
        jax.block_until_ready(params)
        print(f"[{name}] params materialized ({pdt.__name__}) "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

        @jax.jit
        def fwd(params, x, t, ctx, y, cm, g, gs):
            return model.apply(params, x, t, ctx, y, num_frames=T,
                               cond_mask=cm, guidance_input=g,
                               guidance_scale=gs).astype(jnp.float32)

        t0 = time.perf_counter()
        out = np.asarray(fwd(params, *inp))
        print(f"[{name}] fwd compiled+ran {time.perf_counter()-t0:.0f}s "
              f"out mean {out.mean():+.5f} absmax {np.abs(out).max():.4f}",
              flush=True)
        if not np.isfinite(out).all():
            print(f"[{name}] NON-FINITE OUTPUT — aborting quality compare")
        outs[name] = out

        if name in ("bf16", "int8"):
            # distinct inputs per iter (tunnel caching rule); scalar fetch
            @jax.jit
            def fwd_scalar(params, x, t, ctx, y, cm, g, gs):
                o = model.apply(params, x, t, ctx, y, num_frames=T,
                                cond_mask=cm, guidance_input=g,
                                guidance_scale=gs)
                return jnp.mean(o.astype(jnp.float32))

            batches = [make_inputs(cfg, BT, T, H, W, seed=i)
                       for i in range(3)]
            _ = float(fwd_scalar(params, *batches[0]))
            for loop in ("warm", "timed"):
                t0 = time.perf_counter()
                rs = [fwd_scalar(params, *batches[i % 3])
                      for i in range(args.iters)]
                _ = float(rs[-1])
                dt = (time.perf_counter() - t0) / args.iters
                print(f"[{name}][{loop}] {dt*1e3:.0f} ms/eval", flush=True)
            timings[name] = dt
        del params

    ref_name = "f32" if "f32" in outs else "bf16"
    ref = outs[ref_name]
    print(f"\n== quality vs {ref_name} (fixed cos-fill weights) ==")
    for name, out in outs.items():
        if name == ref_name:
            continue
        d = np.abs(out - ref)
        p = psnr_per_frame(ref, out)
        print(f"{name:5s}: max|delta| {d.max():.5f}  mean|delta| "
              f"{d.mean():.6f}  PSNR/frame min {p.min():.1f} dB  "
              f"median {np.median(p):.1f} dB")
    if "bf16" in timings and "int8" in timings:
        sp = timings["bf16"] / timings["int8"]
        print(f"\n== speed == bf16 {timings['bf16']*1e3:.0f} ms  "
              f"int8 {timings['int8']*1e3:.0f} ms  speedup {sp:.2f}x  "
              f"50-step sample {timings['int8']*50:.1f} s")


if __name__ == "__main__":
    main()
