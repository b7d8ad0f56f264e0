"""Full-size VideoUNet CFG-eval timing on the real chip.

Times ONE denoiser eval at the sample_condition spec (25 frames, 576x1024
pixels -> 72x128 latents, CFG batch doubling -> BT=50), bf16 params, with
pipelined distinct inputs and a single final block (tunnel-RTT rule,
CLAUDE.md). Round-1 baseline: 2.47 s/eval.

Usage: python scripts/bench_unet.py [--f32] [--frames 25] [--iters 6]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f32", action="store_true", help="keep params f32")
    ap.add_argument("--no-policy", action="store_true",
                    help="dtype=None (round-1 promotion semantics)")
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--height", type=int, default=72)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="fused temporal-stage Pallas kernel (eval only)")
    ap.add_argument("--remat-policy", default="nothing",
                    choices=("nothing", "dots", "flash", "flash0", "flash01", "flashx"),
                    help="jax.checkpoint policy for --grad (dots saves "
                         "matmul/conv outputs, recomputes elementwise only; "
                         "flash/flash0 save flash-attention outputs)")
    ap.add_argument("--quant", action="store_true",
                    help="W8A8 int8 ResBlock/Down/Up convs (eval only)")
    ap.add_argument("--aot-mem", action="store_true",
                    help="AOT-compile only and print memory_analysis "
                         "(peak HBM) instead of running")
    ap.add_argument("--grad", action="store_true",
                    help="time a fine-tune style fwd+bwd step (B=1, no CFG "
                         "doubling, remat on unless --no-remat)")
    args = ap.parse_args()

    cfg = UNetConfig(remat=not args.no_remat,
                     remat_policy=args.remat_policy,
                     dtype=None if args.no_policy else "bfloat16",
                     fused_temporal=args.fused,
                     quant_convs=args.quant)
    model = VideoUNet(cfg)
    T = args.frames
    B = 1 if args.grad else 2  # CFG doubling at eval; fine-tune is bs=1/chip
    BT = B * T
    H, W = args.height, args.width

    def inputs(seed):
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 5)
        x = jax.random.normal(ks[0], (BT, H, W, cfg.in_channels), jnp.bfloat16)
        t = jnp.full((BT,), 0.25, jnp.float32)
        ctx = jax.random.normal(ks[1], (BT, 1, cfg.context_dim), jnp.bfloat16)
        y = jax.random.normal(ks[2], (BT, cfg.adm_in_channels), jnp.bfloat16)
        cond_mask = jnp.zeros((BT,), jnp.float32).at[::T].set(1.0)
        guide = jax.random.normal(ks[3], (BT, H, W, cfg.in_channels // 2),
                                  jnp.bfloat16)
        gscale = jnp.concatenate(
            [jnp.ones((T,))] + [jnp.zeros((T,))] * (B - 1)) \
            .astype(jnp.float32)
        return x, t, ctx, y, cond_mask, guide, gscale

    x, t, ctx, y, cm, g, gs = inputs(0)
    print("initializing full-size UNet ...", flush=True)
    t0 = time.perf_counter()
    # shapes via eval_shape, then materialize directly at the target dtype
    # (a full f32 init + cast would peak ~9 GB on the 15.75 GB chip)
    shapes = jax.eval_shape(
        lambda k: model.init(k, x, t, ctx, y, num_frames=T, cond_mask=cm,
                             guidance_input=g, guidance_scale=gs),
        jax.random.PRNGKey(0))
    pdt = jnp.float32 if args.f32 else jnp.bfloat16

    @jax.jit
    def materialize():
        # non-constant fill: an all-constant fill (old: 0.01 everywhere)
        # makes every conv output channel identical -> degenerate
        # normalizations -> NaN output regardless of quantization (verified
        # on CPU at tiny shape, quant on AND off). A cheap deterministic
        # per-element cos fill keeps init memory at the target dtype while
        # giving channels distinct weights, so `val` is a usable smoke
        # check. Timing is fill-invariant.
        def fill(sd):
            n = 1
            for s in sd.shape:
                n *= s
            # int32 iota with a prime modulus: exact for any leaf size
            # (f32 arange loses integer exactness past 2^24 ~ 16.8M, and the
            # largest current leaf is already at 14.75M)
            i = jnp.arange(n, dtype=jnp.int32) % 100003
            return (0.02 * jnp.cos(i.astype(jnp.float32) * 0.7)
                    ).reshape(sd.shape).astype(pdt)
        return jax.tree.map(fill, shapes)

    params = materialize()
    n_params = sum(p.size for p in jax.tree.leaves(params))
    jax.block_until_ready(params)
    print(f"init done: {n_params/1e9:.2f} B params, "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    if args.grad:
        def loss_fn(params, x, t, ctx, y, cm, g, gs):
            out = model.apply(params, x, t, ctx, y, num_frames=T,
                              cond_mask=cm, guidance_input=g,
                              guidance_scale=gs)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        @jax.jit
        def fwd(params, x, t, ctx, y, cm, g, gs):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, t, ctx, y,
                                                      cm, g, gs)
            # one representative grad leaf + loss -> single scalar fetch
            leaf = jax.tree.leaves(grads)[0]
            return loss + jnp.sum(leaf.astype(jnp.float32)) * 1e-20
    else:
        @jax.jit
        def fwd(params, x, t, ctx, y, cm, g, gs):
            out = model.apply(params, x, t, ctx, y, num_frames=T,
                              cond_mask=cm, guidance_input=g,
                              guidance_scale=gs)
            # scalar so the end-of-run host fetch is one small transfer;
            # block_until_ready does NOT reliably wait over the axon
            # tunnel — materialize the LAST scalar (device is in-order)
            return jnp.mean(out.astype(jnp.float32))

    batches = [inputs(i) for i in range(3)]
    if args.aot_mem:
        lowered = fwd.lower(params, *batches[0])
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gb = 1 / 2**30
        print(f"policy={args.remat_policy} grad={args.grad}: "
              f"args {ma.argument_size_in_bytes*gb:.2f} GB, "
              f"out {ma.output_size_in_bytes*gb:.2f} GB, "
              f"temp {ma.temp_size_in_bytes*gb:.2f} GB, "
              f"total {(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes)*gb:.2f} GB")
        return
    print("val:", float(fwd(params, *batches[0])), flush=True)
    print("compiled; timing ...", flush=True)

    # two timed loops; the FIRST loop on a fresh executable reads 1.5-11x
    # slow over the axon tunnel (CLAUDE.md) — report the second.
    for loop in ("warm", "timed"):
        t0 = time.perf_counter()
        outs = [fwd(params, *batches[i % 3]) for i in range(args.iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"[{loop}] {dt*1e3:.0f} ms/eval", flush=True)
    print(f"UNet {'fine-tune fwd+bwd' if args.grad else 'CFG eval'} "
          f"{T}f {H}x{W} "
          f"params={'f32' if args.f32 else 'bf16'} quant={args.quant} "
          f"policy={'none' if args.no_policy else 'bf16'}: "
          f"{dt*1e3:.0f} ms/eval -> {dt*50:.1f} s per 50-step sample")


if __name__ == "__main__":
    main()
