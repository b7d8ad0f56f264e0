"""Compiler-verified per-device memory of the FULL-SIZE fine-tune step.

Round-2 VERDICT weak #3: the "full-size FSDP fits v5e-8" claim rested on
eval_shape arithmetic (scripts/check_fsdp_memory.py) — and that arithmetic
assumed bf16 params, while the real trainer keeps f32 masters with a bf16
COMPUTE dtype (models/vdm/weights.py:36-38). This script AOT-compiles the
actual ``make_vdm_train_step`` (B clips x 25 frames, 576x1024 -> 72x128
latents, remat_policy flash0) against a **v5e:2x4 TPU topology
description** (jax.experimental.topologies — the REAL TPU compiler with
the real SPMD partitioner, no chips needed) and reports
``compiled.memory_analysis()`` per-device sizes for DDP vs FSDP layouts.

``--backend cpu`` keeps the old virtual-CPU-mesh path; measured once and
rejected as evidence: the CPU backend's temp accounting is not
representative of TPU scheduling (it reported 696 GB temps for the very
step the real chip runs in 13.95 GB at B=1 — CPU XLA does not model TPU
buffer reuse; argument/output sizes agree, temps do not).

Usage:
  python scripts/check_fsdp_memory_aot.py [--tiny] [--batch 8]
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/check_fsdp_memory_aot.py --backend cpu --tiny
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup_backend(backend: str, axes: dict):
    """Returns the mesh. Import order matters for the CPU path."""
    n = 1
    for v in axes.values():
        n *= v
    if backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        if "xla_force_host_platform_device_count" not in os.environ.get(
                "XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}")
        import jax
        jax.config.update("jax_platforms", "cpu")
        from street_crafter_tpu.parallel import make_virtual_cpu_mesh
        return make_virtual_cpu_mesh(n, axes)
    import jax
    from jax.experimental import topologies
    from street_crafter_tpu.parallel.mesh import MeshSpec, make_mesh
    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    try:
        return make_mesh(MeshSpec(axes), list(topo.devices)[:n])
    except AssertionError:
        # non-rectangular device subsets (e.g. 5 chips for frames=5 over
        # T=25): mesh_utils wants a physical grid; for an AOT MEMORY probe
        # the logical mesh is what matters
        import numpy as np
        from jax.sharding import Mesh
        devs = np.array(list(topo.devices)[:n]).reshape(
            [axes[k] for k in axes])
        return Mesh(devs, tuple(axes))

GB = 1 / 2 ** 30
V5E_HBM = 15.75


def with_sharding(sds_tree, spec_fn):
    import jax
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=spec_fn(s)),
        sds_tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny engine smoke run (seconds, sanity only)")
    ap.add_argument("--batch", type=int, default=8,
                    help="clips per step (reference: bs=1/GPU x 8 GPUs)")
    ap.add_argument("--frames", type=int, default=0,
                    help="override num_frames (0 = config default)")
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--backend", choices=("topology", "cpu"),
                    default="topology")
    ap.add_argument("--remat", default="flash0",
                    help="UNet remat policy for the full-size config "
                         "(flash0 | nothing | ...). The r5 full-size FSDP "
                         "compile at flash0 measured 23.94 GB vs 15.75 — "
                         "the flash-output saves that WIN single-chip "
                         "interact badly with the FSDP all-gather "
                         "schedule; 'nothing' (full remat) is the "
                         "candidate fallback.")
    ap.add_argument("--ddp", action="store_true",
                    help="also compile the DDP layout (2nd compile, "
                         "~40 min)")
    ap.add_argument("--axes", default="data=8",
                    help="mesh axes, e.g. data=2,frames=4 — the frames "
                         "axis shards the T=25 temporal dimension whose "
                         "per-clip activation temps are what blew the "
                         "data-only FSDP compile (24 GB vs 15.75)")
    args = ap.parse_args()

    axes = {k: int(v) for k, v in
            (kv.split("=") for kv in args.axes.split(","))}
    mesh = _setup_backend(args.backend, axes)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from street_crafter_tpu.models.vdm.engine import (
        EngineConfig, VideoDiffusionEngine)
    from street_crafter_tpu.models.vdm.unet import UNetConfig
    from street_crafter_tpu.models.vdm.vae import VAEConfig
    from street_crafter_tpu.models.vdm.clip import CLIPVisualConfig
    from street_crafter_tpu.parallel import ShardingRules
    from street_crafter_tpu.training.vdm_trainer import (
        init_vdm_train_state, make_vdm_train_step)

    if args.tiny:
        cfg = EngineConfig.tiny(num_frames=args.frames or 2)
        H = W = 32
    else:
        T = args.frames or 25
        # full-size fine-tune configuration (engine_from_config defaults:
        # bf16 compute dtype, f32 param masters, remat flash0)
        cfg = EngineConfig(
            unet=UNetConfig(dtype="bfloat16", remat_policy=args.remat),
            vae=VAEConfig(dtype="bfloat16"),
            clip=CLIPVisualConfig(dtype="bfloat16"),
            num_frames=T)
        H, W = args.height, args.width
    T = cfg.num_frames
    B = args.batch
    eng = VideoDiffusionEngine(cfg)

    print(f"AOT memory check: B={B} clips x {T}f, images {H}x{W}", flush=True)
    params_sds = jax.eval_shape(
        lambda k: eng.init_params(k, H, W), jax.random.PRNGKey(0))
    state_sds = jax.eval_shape(
        lambda p: init_vdm_train_state(eng, p), params_sds)

    f = 2 ** (len(cfg.vae.ch_mult) - 1)     # VAE downsample factor (f8 full)
    h, w = H // f, W // f
    lat_sds = jax.ShapeDtypeStruct((B, T, h, w, 4), jnp.float32)
    imgs_sds = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    cond_sds, _ = jax.eval_shape(
        lambda p, im: eng.build_conditioning(p, im), params_sds, imgs_sds)
    cond_sds = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct((B, T) + s.shape[1:], s.dtype)
        if s.shape[0] in (B, B * T) else s, cond_sds)
    batch_sds = {"latents": lat_sds, "cond": cond_sds,
                 "guidance_latents": lat_sds}

    for fsdp in ((True, False) if args.ddp else (True,)):
        rules = ShardingRules(mesh, fsdp_params=fsdp)

        def state_spec(s):
            return rules.param_spec(s)

        st = type(state_sds)(
            unet_params=with_sharding(state_sds.unet_params,
                                      rules.param_spec),
            frozen_params=with_sharding(state_sds.frozen_params,
                                        rules.param_spec),
            opt_state=with_sharding(state_sds.opt_state,
                                    rules.opt_state_spec),
            ema_params=with_sharding(state_sds.ema_params,
                                     rules.param_spec),
            step=jax.ShapeDtypeStruct(
                (), jnp.int32, sharding=NamedSharding(mesh, P())))

        ndata = mesh.shape["data"]
        nframes = mesh.shape.get("frames", 1)

        def batch_spec(s):
            if (nframes > 1 and s.ndim >= 2 and s.shape[1] == T
                    and s.shape[0] % ndata == 0):
                return NamedSharding(
                    mesh, P("data", "frames", *([None] * (s.ndim - 2))))
            if s.ndim >= 1 and s.shape[0] % ndata == 0:
                return NamedSharding(mesh, P("data"))
            return NamedSharding(mesh, P())

        bt = with_sharding(batch_sds, batch_spec)
        key_sds = jax.ShapeDtypeStruct(
            (2,), jnp.uint32, sharding=NamedSharding(mesh, P()))

        step = make_vdm_train_step(eng, rules=rules)
        t0 = time.time()
        print(f"[{'FSDP' if fsdp else 'DDP '}] lowering...", flush=True)
        lowered = step.lower(st, bt, key_sds)
        print(f"[{'FSDP' if fsdp else 'DDP '}] compiling "
              f"(lower took {time.time()-t0:.0f}s)...", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        arg = ma.argument_size_in_bytes * GB
        out = ma.output_size_in_bytes * GB
        tmp = ma.temp_size_in_bytes * GB
        alias = ma.alias_size_in_bytes * GB
        peak = getattr(ma, "peak_memory_in_bytes", 0) * GB
        total = arg + out + tmp - alias
        print(f"[{'FSDP' if fsdp else 'DDP '}] compile {time.time()-t0:.0f}s"
              f"  per-device: args {arg:.2f} GB  outputs {out:.2f} GB"
              f"  temps {tmp:.2f} GB  alias {alias:.2f}  peak {peak:.2f}"
              f"  => args+out+temp-alias {total:.2f} GB "
              f"({'FITS' if total < V5E_HBM else 'OVER'} v5e {V5E_HBM} GB)",
              flush=True)


if __name__ == "__main__":
    main()
