"""Is XLA's 3x3 conv at [50, 72, 128, 320] (37% MXU) beatable?

Times: dense matmul ceiling at equal FLOPs, conv3x3 via XLA, conv3x3 as 9
shifted matmuls (jnp.roll + dot accumulation), and the fused
norm+silu+conv chain for each.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

BT, H, W, C = 50, 72, 128, 320
DT = jnp.bfloat16


def timeit(fn, inputs, iters=6):
    _ = float(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    xs = [jax.random.normal(ks[i], (BT, H, W, C), DT) for i in range(3)]
    wconv = jax.random.normal(ks[3], (3, 3, C, C), DT) * 0.02
    wdense = jax.random.normal(ks[4], (9 * C, C), DT) * 0.02

    @jax.jit
    def dense_equiv(x):
        # same FLOPs as the 3x3 conv: [BT*H*W, 9C] @ [9C, C]
        flat = jnp.broadcast_to(x.reshape(BT * H * W, C)[:, None, :],
                                (BT * H * W, 9, C)).reshape(-1, 9 * C)
        return jnp.mean((flat @ wdense).astype(jnp.float32))

    @jax.jit
    def conv_xla(x):
        out = jax.lax.conv_general_dilated(
            x, wconv, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.mean(out)

    @jax.jit
    def conv_shifts(x):
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xx = jnp.roll(x, (-dy, -dx), axis=(1, 2))
                t = jnp.einsum("bhwc,cd->bhwd", xx, wconv[dy + 1, dx + 1],
                               preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return jnp.mean(acc)

    flops = 2 * BT * H * W * 9 * C * C
    for tag, fn in (("dense 9C ceiling", dense_equiv),
                    ("conv3x3 XLA", conv_xla),
                    ("conv3x3 9-shift", conv_shifts)):
        try:
            dt = timeit(fn, [(x,) for x in xs])
            print(f"{tag:20s}: {dt*1e3:7.2f} ms ({flops/dt/1e12:6.1f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"{tag:20s}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
