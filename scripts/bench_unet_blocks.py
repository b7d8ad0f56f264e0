"""Block-level UNet timings at full size with the bf16 policy.

Times SpatialVideoTransformer / VideoResBlock / raw flash attention at each
UNet level (BT=50 CFG batch), host-materializing a scalar per run (axon
tunnel rule). Identifies where the 2.0 s CFG eval goes.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.models.vdm.layers import (SpatialVideoTransformer,
                                                  VideoResBlock)
from street_crafter_tpu.ops.flash_attention import flash_attention

T = 25
BT = 50
DT = "bfloat16"


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def bench_module(mod, make_inputs, tag, n_inputs=3, **apply_kw):
    ins0 = make_inputs(0)
    params = jax.jit(lambda k: mod.init(k, *ins0, **apply_kw))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(params, *ins):
        return jnp.mean(mod.apply(params, *ins, **apply_kw)
                        .astype(jnp.float32))

    dt = timeit(fwd, [(params, *make_inputs(i)) for i in range(n_inputs)])
    print(f"{tag:42s}: {dt*1e3:7.1f} ms", flush=True)


def main():
    shapes = [(72, 128, 320, 5), (36, 64, 640, 10), (18, 32, 1280, 20),
              (9, 16, 1280, 20)]

    for (H, W, C, heads) in shapes:
        def mk(seed, H=H, W=W, C=C):
            k = jax.random.split(jax.random.PRNGKey(seed), 3)
            x = jax.random.normal(k[0], (BT, H, W, C), jnp.bfloat16)
            ctx = jax.random.normal(k[1], (BT, 1, 1024), jnp.bfloat16)
            return (x, ctx)

        mod = SpatialVideoTransformer(heads=heads, dim_head=64,
                                      context_dim=1024, dtype=DT)
        bench_module(mod, mk, f"SpatialVideoTransformer {H}x{W}x{C}",
                     num_frames=T)

        def mk_res(seed, H=H, W=W, C=C):
            k = jax.random.split(jax.random.PRNGKey(seed), 2)
            x = jax.random.normal(k[0], (BT, H, W, C), jnp.bfloat16)
            emb = jax.random.normal(k[1], (BT, 1280), jnp.bfloat16)
            return (x, emb)

        rmod = VideoResBlock(out_channels=C, dtype=DT)
        bench_module(rmod, mk_res, f"VideoResBlock {H}x{W}x{C}",
                     num_frames=T)

        # raw flash attention at this spatial shape
        S = H * W
        def mk_fa(seed, S=S, heads=heads):
            k = jax.random.split(jax.random.PRNGKey(seed), 3)
            q = jax.random.normal(k[0], (BT, S, heads, 64), jnp.bfloat16)
            kk = jax.random.normal(k[1], (BT, S, heads, 64), jnp.bfloat16)
            v = jax.random.normal(k[2], (BT, S, heads, 64), jnp.bfloat16)
            return q, kk, v

        @jax.jit
        def fa(q, k, v):
            return jnp.mean(flash_attention(q, k, v).astype(jnp.float32))

        dt = timeit(fa, [mk_fa(i) for i in range(3)])
        print(f"{'flash fwd':>20s} [{BT},{S},{heads},64]   : "
              f"{dt*1e3:7.1f} ms", flush=True)




def bench_flash_bwd():
    shapes = [(9216, 5), (2304, 10), (576, 20), (144, 20)]
    for S, heads in shapes:
        def mk(seed, S=S, heads=heads):
            k = jax.random.split(jax.random.PRNGKey(seed), 3)
            return tuple(jax.random.normal(k[i], (BT, S, heads, 64),
                                           jnp.bfloat16) for i in range(3))

        @jax.jit
        def fb(q, k, v):
            def loss(q, k, v):
                return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return jnp.mean(g[0].astype(jnp.float32))

        dt = timeit(fb, [mk(i) for i in range(3)])
        print(f"flash fwd+bwd [{BT},{S},{heads},64]: {dt*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        bench_flash_bwd()
    else:
        main()
