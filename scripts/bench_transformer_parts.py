"""Sub-block timings inside SpatialVideoTransformer, BT=50.

Finds where the non-attention time per transformer goes.
Usage: python scripts/bench_transformer_parts.py [level]   (default 0)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from flax import linen as nn
from street_crafter_tpu.models.vdm.layers import (
    BasicTransformerBlock, GEGLUFeedForward, VideoTransformerBlock,
    CrossAttention, _norm_attn)
from street_crafter_tpu.ops.attention import attention_xla

T = 25
BT = 50
DT = "bfloat16"
_LEVELS = {0: (72, 128, 320, 5), 1: (36, 64, 640, 10),
           2: (18, 32, 1280, 20), 3: (9, 16, 1280, 20)}
_lv = int([a for a in sys.argv[1:] if a.isdigit()][0]) if any(
    a.isdigit() for a in sys.argv[1:]) else 0
H, W, C, heads = _LEVELS[_lv]
S = H * W


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def bench_module(mod, make_inputs, tag, **apply_kw):
    ins0 = make_inputs(0)
    params = jax.jit(lambda k: mod.init(k, *ins0, **apply_kw))(
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def fwd(params, *ins):
        return jnp.mean(mod.apply(params, *ins, **apply_kw)
                        .astype(jnp.float32))

    dt = timeit(fwd, [(params, *make_inputs(i)) for i in range(3)])
    print(f"{tag:44s}: {dt*1e3:7.1f} ms", flush=True)


def mk_seq(seed):
    k = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(k[0], (BT, S, C), jnp.bfloat16)
    ctx = jax.random.normal(k[1], (BT, 1, 1024), jnp.bfloat16)
    return x, ctx


def main():
    bench_module(BasicTransformerBlock(heads, 64, context_dim=1024,
                                       dtype=DT),
                 mk_seq, "BasicTransformerBlock (spatial)")
    bench_module(VideoTransformerBlock(heads, 64, context_dim=1024,
                                       dtype=DT),
                 mk_seq, "VideoTransformerBlock (temporal)",
                 num_frames=T)
    bench_module(GEGLUFeedForward(dtype=DT),
                 lambda s: (mk_seq(s)[0],), "GEGLU FF")
    bench_module(CrossAttention(heads, 64, context_dim=1024, dtype=DT),
                 mk_seq, "cross-attn (ctx len 1)")

    # LayerNorm alone
    bench_module(nn.LayerNorm(dtype=jnp.bfloat16),
                 lambda s: (mk_seq(s)[0],), "LayerNorm")

    # GroupNorm on the spatial layout
    def mk_img(seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (BT, H, W, C),
                              jnp.bfloat16)
        return (x,)
    bench_module(_norm_attn("n", jnp.bfloat16), mk_img, "GroupNorm")

    # temporal attention via XLA at [B*S, T, heads, 64]
    def mk_t(seed):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        return tuple(jax.random.normal(k[i], (2 * S, T, heads, 64),
                                       jnp.bfloat16) for i in range(3))

    @jax.jit
    def tattn(q, k, v):
        return jnp.mean(attention_xla(q, k, v).astype(jnp.float32))

    dt = timeit(tattn, [mk_t(i) for i in range(3)])
    print(f"{'temporal attention XLA':44s}: {dt*1e3:7.1f} ms",
          flush=True)

    # the (b t) s c -> (b s) t c transpose round-trip
    @jax.jit
    def transpose_rt(x):
        b = BT // T
        y = x.reshape(b, T, S, C).transpose(0, 2, 1, 3).reshape(b * S, T, C)
        y = y * 1.000001
        z = y.reshape(b, S, T, C).transpose(0, 2, 1, 3).reshape(BT, S, C)
        return jnp.mean(z.astype(jnp.float32))

    dt = timeit(transpose_rt, [(mk_seq(i)[0],) for i in range(3)])
    print(f"{'(b t) s c <-> (b s) t c round trip':44s}: {dt*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
