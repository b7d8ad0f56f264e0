"""Per-device HBM accounting for the FULL-SIZE fine-tune train state under
DDP (replicated params) vs FSDP (ShardingRules.fsdp_params) on a v5e-8 mesh.

Pure eval_shape + sharding-spec arithmetic — no arrays are materialized, no
devices needed (runs on CPU; an 8-way virtual mesh provides the specs).
Activation memory comes from the measured XLA memory_analysis of the
full-size fwd+bwd step (scripts/bench_unet.py --aot-mem --remat-policy
flash0: temp 11.18 GB, which includes the bf16 grads of the scalarized
bench; we add grads explicitly and subtract nothing, so the total is
conservative).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/check_fsdp_memory.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_platforms", "cpu")

from street_crafter_tpu.models.vdm.engine import (  # noqa: E402
    VideoDiffusionEngine, EngineConfig)
from street_crafter_tpu.parallel import (  # noqa: E402
    make_virtual_cpu_mesh, ShardingRules)

GB = 1 / 2**30
V5E_HBM = 15.75
# measured activation/workspace peak of the full fwd+bwd at B=1x25f
# (flash0 remat policy, XLA memory_analysis temp size)
ACT_GB = 11.18


def per_device_bytes(shapes, spec_fn, n_dev):
    total = 0
    for leaf in jax.tree_util.tree_leaves(shapes):
        sh = spec_fn(leaf)
        # shard count along the partitioned dims
        parts = 1
        for axes in sh.spec:
            if axes is None:
                continue
            names = axes if isinstance(axes, tuple) else (axes,)
            for a in names:
                parts *= sh.mesh.shape[a]
        total += leaf.size * leaf.dtype.itemsize / parts
    return total


def main():
    mesh = make_virtual_cpu_mesh(8, {"data": 8})
    eng = VideoDiffusionEngine(EngineConfig())  # full size
    shapes = jax.eval_shape(
        lambda: eng.init_params(jax.random.PRNGKey(0), 576, 1024))
    # fine-tune state dtypes: bf16 params/EMA/grads, f32 Adam moments (x2)
    unet = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        shapes["unet"])
    frozen = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16),
        {"vae": shapes["vae"], "clip": shapes["clip"]})
    moments = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float32), unet)

    for fsdp in (False, True):
        rules = ShardingRules(mesh, fsdp_params=fsdp)
        p = per_device_bytes(unet, rules.param_spec, 8)
        g = per_device_bytes(unet, rules.param_spec, 8)   # grads like params
        e = per_device_bytes(unet, rules.param_spec, 8)   # EMA like params
        f = per_device_bytes(frozen, rules.param_spec, 8)
        m = 2 * per_device_bytes(moments, rules.opt_state_spec, 8)
        state = p + g + e + f + m
        total = state * GB + ACT_GB
        print(f"{'FSDP' if fsdp else 'DDP '}: params {p*GB:5.2f}  "
              f"grads {g*GB:5.2f}  ema {e*GB:5.2f}  frozen {f*GB:5.2f}  "
              f"moments {m*GB:5.2f}  + activations {ACT_GB:.2f}  "
              f"= {total:5.2f} GB/device  "
              f"({'FITS' if total < V5E_HBM else 'OVER'} v5e {V5E_HBM} GB)")


if __name__ == "__main__":
    main()
