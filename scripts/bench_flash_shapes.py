"""Flash-attention block-size sweep at the UNet's NON-level-0 shapes.

Level 0 (S=9216) was tuned to (512, 1024). But S=2304 (level 1) pads kv
3072 (+33% masked chunks) and S=576 (level 2) pads q to 1024 (+78%!) under
those fixed blocks. Sweep exact-tiling candidates per shape; also time the
backward (fine-tune step) at the same shapes.

Usage: python scripts/bench_flash_shapes.py [--bwd]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.ops.flash_attention import (_flash_forward,
                                                    _flash_backward)

# (bh, S) per UNet level at the CFG-eval spec (BT=50)
SHAPES = {
    1: (500, 2304),
    2: (1000, 576),
    3: (1000, 144),   # middle block 9x16
}

FWD_CANDS = {
    1: [(512, 1024), (768, 1152), (576, 1152), (768, 768), (384, 1152),
        (1152, 1152), (768, 2304), (2304, 1152)],
    2: [(512, 1024), (576, 640), (576, 128), (192, 640), (576, 256)],
    3: [(512, 1024), (144, 256), (144, 128), (48, 256)],
}

BWD_CANDS = {
    1: [(512, 512), (768, 768), (384, 768), (768, 384), (1152, 576),
        (576, 1152)],
    2: [(512, 512), (576, 640), (576, 320), (192, 640)],
}


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def mk(bh, s, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(ks[i], (bh, s, 64), jnp.bfloat16)
                 for i in range(3))


def sweep_fwd(level):
    bh, s = SHAPES[level]
    ins = [mk(bh, s, i) for i in range(3)]
    for need_lse in (False, True):
        for bq, bk in FWD_CANDS[level]:
            @jax.jit
            def f(q, k, v, bq=bq, bk=bk, nl=need_lse):
                out, _ = _flash_forward(q, k, v, block_q=bq, block_k=bk,
                                        need_lse=nl)
                return jnp.mean(out.astype(jnp.float32))
            try:
                dt = timeit(f, ins)
            except Exception as e:  # VMEM / Mosaic failures
                print(f"L{level} fwd lse={int(need_lse)} bq={bq:5d} "
                      f"bk={bk:5d}: FAIL {type(e).__name__}", flush=True)
                continue
            print(f"L{level} fwd lse={int(need_lse)} bq={bq:5d} bk={bk:5d}: "
                  f"{dt*1e3:7.2f} ms", flush=True)


def sweep_bwd(level):
    bh, s = SHAPES[level]
    ins = [mk(bh, s, i) for i in range(3)]
    for bq, bk in BWD_CANDS[level]:
        @jax.jit
        def f(q, k, v, bq=bq, bk=bk):
            out, lse = _flash_forward(q, k, v, block_q=min(bq, 512),
                                      block_k=min(bk, 1024))
            dq, dk, dv = _flash_backward(q, k, v, out, lse, v,
                                         block_q=bq, block_k=bk)
            return (jnp.mean(dq.astype(jnp.float32))
                    + jnp.mean(dk.astype(jnp.float32)))
        try:
            dt = timeit(f, ins)
        except Exception as e:
            print(f"L{level} fwd+bwd bq={bq:5d} bk={bk:5d}: FAIL "
                  f"{type(e).__name__}", flush=True)
            continue
        print(f"L{level} fwd+bwd bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    if "--bwd" in sys.argv:
        for lv in (1, 2):
            sweep_bwd(lv)
    else:
        for lv in (1, 2, 3):
            sweep_fwd(lv)
