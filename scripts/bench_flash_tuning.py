"""Flash-attention forward tuning at the UNet level-0 shape
[B=50, S=9216, H=5, D=64] (bh=250 after folding).

Compares (block_q, block_k) combos of our kernel and the jax.experimental
pallas flash reference. Pipelined distinct inputs, one final host fetch.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.ops.flash_attention import _flash_forward

BH, S, D = 250, 9216, 64


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    mk = lambda k: jax.random.normal(k, (BH, S, D), jnp.bfloat16)
    inputs = [(mk(ks[3 * i]), mk(ks[3 * i + 1]), mk(ks[3 * i + 2]))
              for i in range(3)]

    flops = 4 * BH * S * S * D
    for bq, bk in ((512, 1024), (1024, 512), (1024, 1024), (2048, 512),
                   (512, 512), (2048, 1024), (1024, 2048), (512, 2304),
                   (4608, 512)):
        @jax.jit
        def f(q, k, v, bq=bq, bk=bk):
            out, _ = _flash_forward(q, k, v, block_q=bq, block_k=bk)
            return jnp.mean(out.astype(jnp.float32))
        try:
            dt = timeit(f, inputs)
            print(f"ours bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms "
                  f"({flops/dt/1e12:6.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"ours bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash, BlockSizes)

        q4 = lambda x: x.reshape(50, 5, S, D)
        for blk in (None, BlockSizes(block_q=512, block_k_major=512,
                                     block_k=512, block_b=1)):
            @jax.jit
            def g(q, k, v, blk=blk):
                out = jax_flash(q4(q), q4(k), q4(v), causal=False,
                                sm_scale=1.0 / (D ** 0.5), block_sizes=blk)
                return jnp.mean(out.astype(jnp.float32))
            try:
                dt = timeit(g, inputs)
                print(f"jax reference blk={'default' if blk is None else 'custom'}:"
                      f" {dt*1e3:7.2f} ms ({flops/dt/1e12:6.1f} TF/s)",
                      flush=True)
            except Exception as e:
                print(f"jax reference: FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
    except ImportError as e:
        print("no jax reference flash:", e)


if __name__ == "__main__":
    main()
