"""Chunked VideoDecoder timing at the sample spec: 25 frames of 72x128x4
latents -> 576x1024x3 pixels, bf16 params + policy, on the real chip.

The other component of per-sample wall-clock next to the 50 UNet CFG evals.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.models.vdm.vae import VAE, VAEConfig


def main():
    cfg = VAEConfig(dtype="bfloat16")
    model = VAE(cfg)
    T, h, w = 25, 72, 128
    z = jax.random.normal(jax.random.PRNGKey(0), (8, h, w, 4), jnp.bfloat16)
    print("initializing VAE ...", flush=True)
    shapes = jax.eval_shape(
        lambda k: model.init(k, z, num_frames=8, method=VAE.decode),
        jax.random.PRNGKey(0))
    params = jax.jit(lambda: jax.tree.map(
        lambda sd: jnp.full(sd.shape, 0.01, jnp.bfloat16), shapes))()
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"{n/1e6:.0f} M params", flush=True)

    @jax.jit
    def dec(params, zc):
        out = model.apply(params, zc, num_frames=zc.shape[0],
                          method=VAE.decode)
        return jnp.mean(out.astype(jnp.float32))

    # chunked schedule: chunk 8, overlap 3 -> chunks of 8,8,8,8 frames
    # (5 jitted calls of <=8 frames for 25); time one 8-frame decode and
    # scale, plus measure the full python-level chunked loop wall-clock
    zs = [jax.random.normal(jax.random.PRNGKey(i), (8, h, w, 4),
                            jnp.bfloat16) for i in range(3)]
    _ = float(dec(params, zs[0]))
    t0 = time.perf_counter()
    outs = [dec(params, zs[i % 3]) for i in range(6)]
    _ = float(outs[-1])
    dt = (time.perf_counter() - t0) / 6
    # 25 frames with chunk 8 / overlap 3: ceil((25-3)/5) = 5 chunks
    print(f"decode 8f 72x128 -> 576x1024: {dt*1e3:.0f} ms/chunk; "
          f"~{dt*5:.2f} s per 25-frame sample decode", flush=True)


if __name__ == "__main__":
    main()
