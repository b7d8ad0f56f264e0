"""AOT compile-gate: lower every shipped Pallas kernel shape/capacity class
against the real v5e TPU compiler (VERDICT r3 weak #2).

Two rounds running, Mosaic lowering/scoped-VMEM walls escaped CPU
interpret-mode tests and surfaced only in production benches (round 3: the
kc>4096 compaction wall; round 4: the 18 MB comp-block charge). CPU
interpret mode cannot see Mosaic's lowering or VMEM accounting, so this
gate compiles — not runs — each kernel class via
``jax.experimental.topologies`` (the real TPU compiler + SPMD partitioner,
chipless), and reports ok/fail per class.

Legs:
  raster-eval   fused Pallas render at every auto-capacity bucket the
                probe can pick (kc 4096..65536; ops/gs_raster.py
                pick_coarse_capacity) at headline + r1-metric resolutions
  raster-row    the kf=4096 row-capacity probe class (gs_raster_fused
                _KF_CAP TODO: comp block doubles; gate it before shipping)
  raster-train  fused fwd + analytic-VJP backward (grad) at training
                capacity classes
  unet-flagship the full SVD-320ch UNet forward at flagship latent shape
                (72x128, T=25) — instantiates every flash-attention and
                fused-temporal-block shape class the sampler ships

Usage:
  python scripts/pallas_compile_gate.py [--quick] [--json OUT]

``--quick`` compiles one small class per leg (plumbing smoke, ~1 min).
Full run is serialized with other tunnel users (compiles go through the
remote compile helper); expect ~10-20 min cold.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GB = 1 / 2 ** 30


def _sds(tree, dev):
    import jax
    sh = jax.sharding.SingleDeviceSharding(dev)
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), tree)


def _gate(name, fn, args_sds, results):
    import jax
    only = results.get("_only")
    if only and only not in name:
        return
    t0 = time.perf_counter()
    try:
        compiled = jax.jit(fn).lower(*args_sds).compile()
        mem = compiled.memory_analysis()
        peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes) * GB
        dt = time.perf_counter() - t0
        results[name] = {"ok": True, "compile_s": round(dt, 1),
                         "peak_gb": round(peak, 2)}
        print(f"[gate] {name}: ok ({dt:.1f} s, ~{peak:.2f} GB)", flush=True)
    except Exception as e:  # noqa: BLE001 — the gate's job is to catch these
        msg = str(e)
        results[name] = {"ok": False, "error": msg[:500]}
        print(f"[gate] {name}: FAIL {msg[:200]}", flush=True)


def _flat_sds(n):
    import jax
    import jax.numpy as jnp
    from street_crafter_tpu.models.gs.scene import FlatGaussians

    def build():
        z = jnp.zeros
        return FlatGaussians(
            xyz=z((n, 3)), rotation=z((n, 4)), scaling=z((n, 3)),
            opacity=z((n,)), shs=z((n, 16, 3)),
            valid=jnp.ones((n,), bool))

    return jax.eval_shape(build)


def _mk_eval_render(H, W, kc, kf=None):
    import jax.numpy as jnp
    from street_crafter_tpu.models.gs.renderer import render_flat
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)

    def f(flat, w2c):
        out = render_flat(flat, w2c, jnp.asarray(K), jnp.zeros(3), W, H,
                          sh_degree=3, method="fused", max_per_coarse=kc,
                          max_per_row=kf, recall_target=0.85)
        return out["rgb"]

    return f


def _mk_escalated_render(H, W, tiles, kc_hi):
    import jax.numpy as jnp
    from street_crafter_tpu.models.gs.renderer import render_flat
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)

    def f(flat, w2c):
        out = render_flat(flat, w2c, jnp.asarray(K), jnp.zeros(3), W, H,
                          sh_degree=3, method="fused", max_per_coarse=4096,
                          recall_target=0.85, escalate_tiles=tiles,
                          escalate_per_coarse=kc_hi)
        return out["rgb"]

    return f


def _mk_multiclass_render(H, W, classes):
    import jax.numpy as jnp
    from street_crafter_tpu.models.gs.renderer import render_flat
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)

    def f(flat, w2c):
        out = render_flat(flat, w2c, jnp.asarray(K), jnp.zeros(3), W, H,
                          sh_degree=3, method="fused", max_per_coarse=4096,
                          recall_target=0.85, escalate_classes=classes)
        return out["rgb"]

    return f


def _mk_train_render(H, W, kc):
    import jax
    import jax.numpy as jnp
    from street_crafter_tpu.models.gs.renderer import render_flat
    from street_crafter_tpu.models.gs.scene import FlatGaussians
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)

    def loss(ps, w2c):
        flat = FlatGaussians(
            xyz=ps["xyz"], rotation=ps["rotation"], scaling=ps["scaling"],
            opacity=ps["opacity"], shs=ps["shs"],
            valid=jnp.ones(ps["xyz"].shape[:1], bool))
        out = render_flat(flat, w2c, jnp.asarray(K), jnp.zeros(3), W, H,
                          sh_degree=3, method="fused_train",
                          max_per_coarse=kc)
        return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["acc"])

    return jax.grad(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", default="")
    # v5e:1x1x1 is not constructible (chips_per_host_bounds 2x2x1 must
    # divide the layout); single-device programs compiled on one device of
    # the 2x4 topology are identical — Mosaic compiles per-device
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--only", default="",
                    help="substring filter: only gate classes whose name "
                         "contains this (e.g. raster_train)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(args.topology, "tpu")
    dev = list(topo.devices)[0]
    results: dict = {"topology": args.topology}
    if args.only:
        results["_only"] = args.only

    # ---- raster eval capacity classes -----------------------------------
    w2c_sds = _sds(jax.ShapeDtypeStruct((4, 4), jnp.float32), dev)
    kcs = [4096] if args.quick else [4096, 8192, 16384, 32768, 43008, 65536]
    for kc in kcs:
        n = 1_000_000 if kc >= 65536 else 600_000
        flat = _sds(_flat_sds(n), dev)
        _gate(f"raster_eval_1066x1600_kc{kc}",
              _mk_eval_render(1066, 1600, kc), (flat, w2c_sds), results)
    if not args.quick:
        flat = _sds(_flat_sds(200_000), dev)
        _gate("raster_eval_640x960_kc4096",
              _mk_eval_render(640, 960, 4096), (flat, w2c_sds), results)
        # kf=4096 row-capacity probe class (2x the shipped _KF_CAP)
        flat = _sds(_flat_sds(600_000), dev)
        _gate("raster_eval_1066x1600_kc16384_kf4096",
              _mk_eval_render(1066, 1600, 16384, kf=4096),
              (flat, w2c_sds), results)
        # overflow-tile escalation class (round 4): base 4096 + 40 dense
        # tiles at the 600k scene's drop-free bucket (round 5: kf_hi now
        # defaults to the gate-verified _KF_CAP_HI=4096 — this class
        # re-verifies that combination at kc=43008)
        _gate("raster_eval_1066x1600_escalate40_kc43008",
              _mk_escalated_render(1066, 1600, 40, 43008),
              (flat, w2c_sds), results)
        # multi-class escalation (round 5): three capacity classes in one
        # executable — the bench/probe production shape for dense scenes
        _gate("raster_eval_1066x1600_multiclass_43008_16384_8192",
              _mk_multiclass_render(1066, 1600,
                                    ((16, 43008), (16, 16384), (16, 8192))),
              (flat, w2c_sds), results)

    # ---- raster train (fwd + analytic VJP) ------------------------------
    for kc in ([4096] if args.quick else [4096, 8192, 16384]):
        n = 300_000
        ps = {k: s for k, s in
              zip(("xyz", "rotation", "scaling", "opacity", "shs"),
                  (jax.ShapeDtypeStruct((n, 3), jnp.float32),
                   jax.ShapeDtypeStruct((n, 4), jnp.float32),
                   jax.ShapeDtypeStruct((n, 3), jnp.float32),
                   jax.ShapeDtypeStruct((n,), jnp.float32),
                   jax.ShapeDtypeStruct((n, 16, 3), jnp.float32)))}
        _gate(f"raster_train_640x960_kc{kc}",
              _mk_train_render(640, 960, kc),
              (_sds(ps, dev), w2c_sds), results)
        if kc == 4096 and not args.quick:
            # full-dataset-resolution TRAINING class (Tc=117): the bwd
            # custom-call's buffers scale with Tc as well as kf — a class
            # the 640x960 legs (Tc=40) cannot vouch for
            _gate("raster_train_1066x1600_kc4096",
                  _mk_train_render(1066, 1600, kc),
                  (_sds(ps, dev), w2c_sds), results)

    # ---- flagship UNet forward (all flash + temporal classes) -----------
    if not args.quick:
        from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
        cfg = UNetConfig(model_channels=320, channel_mult=(1, 2, 4, 4),
                         attention_resolutions=(4, 2, 1),
                         num_head_channels=64, context_dim=1024,
                         adm_in_channels=768, in_channels=8, out_channels=4,
                         dtype="bfloat16", fused_temporal=True)
        model = VideoUNet(cfg)
        T, H, W = 25, 72, 128   # 576x1024 f8 latents
        x = jax.ShapeDtypeStruct((T, H, W, 8), jnp.float32)
        t = jax.ShapeDtypeStruct((T,), jnp.float32)
        ctx = jax.ShapeDtypeStruct((1, 1, 1024), jnp.float32)
        y = jax.ShapeDtypeStruct((1, 768), jnp.float32)
        guide = jax.ShapeDtypeStruct((T, H, W, 4), jnp.float32)
        params = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), jnp.zeros((T, H, W, 8)),
                jnp.zeros((T,)), jnp.zeros((1, 1, 1024)),
                jnp.zeros((1, 768)), num_frames=T,
                cond_mask=jnp.zeros((T,)),
                guidance_input=jnp.zeros((T, H, W, 4)),
                guidance_scale=jnp.ones((T,))))

        def unet_fwd(params, x, t, ctx, y, guide):
            return model.apply(params, x, t, ctx, y, num_frames=T,
                               cond_mask=jnp.zeros((T,)),
                               guidance_input=guide,
                               guidance_scale=jnp.ones((T,)))

        _gate("unet_flagship_fwd_25x72x128",
              unet_fwd,
              tuple(_sds(a, dev) for a in (params, x, t, ctx, y, guide)),
              results)

    results.pop("_only", None)
    n_gated = sum(1 for v in results.values()
                  if isinstance(v, dict) and "ok" in v)
    n_fail = sum(1 for v in results.values()
                 if isinstance(v, dict) and not v.get("ok", True))
    if args.only and n_gated == 0:
        # a typo'd --only would otherwise gate NOTHING and exit 0 — a
        # go/no-go check that silently passes without testing anything
        print(f"[gate] ERROR: --only {args.only!r} matched no class names",
              flush=True)
        n_fail = 1
    results["gated"] = n_gated
    results["failures"] = n_fail
    line = json.dumps(results)
    print(line, flush=True)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
