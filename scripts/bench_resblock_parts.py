"""Where do VideoResBlock's ~32 ms at [50, 72, 128, 320] go?

Times GroupNorm / SiLU / conv3x3 / temporal conv / full block separately,
plus a matmul-formulated GroupNorm (group stats + broadcast via MXU
indicator matmuls instead of 10-lane grouped reduces).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from flax import linen as nn

BT, H, W, C = 50, 72, 128, 320
DT = jnp.bfloat16


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def bench(tag, mod, make_inputs, **kw):
    ins0 = make_inputs(0)
    params = jax.jit(lambda k: mod.init(k, *ins0, **kw))(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda p: p.astype(DT), params)

    @jax.jit
    def fwd(params, *ins):
        return jnp.mean(mod.apply(params, *ins, **kw).astype(jnp.float32))

    ins = [(params,) + make_inputs(i) for i in range(3)]
    dt = timeit(lambda p, *i: fwd(p, *i), ins)
    print(f"{tag:40s}: {dt*1e3:7.2f} ms", flush=True)


class MatmulGroupNorm(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.groups
        cg = c // g
        ind = jnp.repeat(jnp.eye(g, dtype=x.dtype), cg, axis=0)  # [C, G]
        flat = x.reshape(-1, c)
        n = flat.shape[0]
        mean_g = (flat @ ind) / cg                               # [N, G]
        var_g = (jnp.square(flat) @ ind) / cg - jnp.square(mean_g)
        scale_g = jax.lax.rsqrt(var_g + 1e-5)
        scale = scale_g @ ind.T                                  # [N, C]
        mean = mean_g @ ind.T
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        out = (flat - mean) * scale * gamma.astype(x.dtype) \
            + beta.astype(x.dtype)
        return out.reshape(x.shape)


def main():
    mk = lambda i: (jax.random.normal(jax.random.PRNGKey(i), (BT, H, W, C),
                                      DT),)

    bench("GroupNorm32 flax", nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                           dtype=DT), mk)
    bench("GroupNorm32 matmul", MatmulGroupNorm(), mk)
    bench("conv3x3 320->320", nn.Conv(C, (3, 3), padding="SAME", dtype=DT),
          mk)

    class NormSiluConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.silu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     dtype=DT)(x))
            return nn.Conv(C, (3, 3), padding="SAME", dtype=DT)(h)

    bench("norm+silu+conv", NormSiluConv(), mk)

    class MMNormSiluConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.silu(MatmulGroupNorm()(x))
            return nn.Conv(C, (3, 3), padding="SAME", dtype=DT)(h)

    bench("mm-norm+silu+conv", MMNormSiluConv(), mk)

    from street_crafter_tpu.models.vdm.layers import VideoResBlock
    mk2 = lambda i: (jax.random.normal(jax.random.PRNGKey(i), (BT, H, W, C),
                                       DT),
                     jax.random.normal(jax.random.PRNGKey(100 + i),
                                       (BT, 1280), DT))
    bench("VideoResBlock full", VideoResBlock(dtype="bfloat16"), mk2,
          num_frames=25)


if __name__ == "__main__":
    main()
