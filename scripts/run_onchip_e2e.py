"""On-chip end-to-end GS training: synthetic scene in the real on-disk
format -> 3D-consistent rendered ground truth -> runner.train loop on the
TPU -> held-out PSNR + iteration timing.

Ground truth is produced by rendering the scene's OWN geometry (lidar-
initialized background/actor/sky pools) with a smooth position-dependent
palette and high opacity, then overwriting the scene images. Training
re-initializes from the same plys but with the plys' random colors — so the
optimizer must recover the palette appearance, and the held-out frames test
3D consistency (novel ego positions), not memorization. This is the full
training stack (scene build, condition rendering, loss stack, fused-train
raster, densify/prune, per-group Adam, eval) on real hardware — the closest
available stand-in for a real-Waymo parity run (VERDICT r1 #2) in a
zero-egress environment.

Usage: python scripts/run_onchip_e2e.py [--iters 2000] [--frames 4]
       [--height 384 --width 512]
"""

import argparse
import dataclasses
import os
import sys
import tempfile
import time

import numpy as np

# resolve the tree this script lives in (NOT a hardcoded /root/repo): long
# on-chip runs launch from an immutable snapshot so live edits to the work
# tree cannot race a lazy import mid-run (round-4 lesson: a mixed-version
# ImportError killed an 800-iter rehearsal after its 20-min engine init)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def palette(xyz: np.ndarray) -> np.ndarray:
    """Smooth position->color map (3 incommensurate spatial frequencies)."""
    f = np.array([[0.37, 0.11, 0.23],
                  [0.05, 0.41, 0.17],
                  [0.19, 0.07, 0.31]], np.float32)
    return 0.5 + 0.45 * np.sin(np.asarray(xyz, np.float32) @ f.T)


def build_config(scene_dir: str, model_path: str, iters: int):
    from street_crafter_tpu.config import default_config
    c = default_config()
    c.source_path = scene_dir
    c.model_path = model_path
    c.data.cameras = [0]
    c.data.split_test = 2   # every-2nd frame held out (get_val_frames analog)
    c.train.iterations = iters
    c.train.test_iterations = [iters // 2, iters]
    c.train.checkpoint_iterations = [iters]
    c.train.save_iterations = [iters]
    c.train.novel_view_prob = 0.0
    c.train.log_interval = 500
    c.optim.densify_from_iter = 200
    c.optim.densification_interval = 100
    c.optim.densify_until_iter = iters // 2
    c.optim.opacity_reset_interval = 100000
    c.render.novel_view.shift = [2.0]
    c.optim.allow_missing_lpips = True
    return c


def palette_gt_params(scene):
    """Ground-truth SceneParams: the scene's own geometry recolored with the
    smooth position palette at high opacity (see module docstring). Shared
    by the on-chip e2e run and the distillation-mechanism oracle test
    (tests/test_distillation_oracle.py)."""
    import jax.numpy as jnp

    from street_crafter_tpu.ops.sh import rgb_to_sh

    def recolor(pool, opacity_logit=3.0):
        if pool is None:
            return None
        cols = palette(np.asarray(pool.xyz).reshape(-1, 3))
        fdc = rgb_to_sh(jnp.asarray(cols)).reshape(
            pool.xyz.shape[:-1] + (1, 3))
        if pool.features_dc.shape[-2] > 1:   # Fourier DC: fill coefficient 0
            fdc = jnp.concatenate(
                [fdc, jnp.zeros(pool.features_dc.shape[:-2]
                                + (pool.features_dc.shape[-2] - 1, 3))], -2)
        return dataclasses.replace(
            pool, features_dc=fdc.astype(pool.features_dc.dtype),
            features_rest=jnp.zeros_like(pool.features_rest),
            opacity=jnp.full_like(pool.opacity, opacity_logit))

    return dataclasses.replace(
        scene.params,
        bkgd=recolor(scene.params.bkgd),
        actors=recolor(scene.params.actors),
        sky=recolor(scene.params.sky))


def write_gt_images(c) -> None:
    """Render palette-colored GT from the scene's own geometry and
    overwrite every train/test image on disk."""
    import imageio.v2 as imageio

    from street_crafter_tpu.models.gs.renderer import render_scene
    from street_crafter_tpu.runner import create_scene

    scene = create_scene(c)
    gt_params = palette_gt_params(scene)

    infos = scene.info.train_cameras + scene.info.test_cameras
    cams = scene.train_cameras + scene.test_cameras
    for info, cam in zip(infos, cams):
        b = scene.batch_for(info)
        img = render_scene(
            gt_params, scene.meta, cam, frame_idx=b["frame_idx"],
            frame=b["frame"], cam_id=b["cam_id"],
            timestamp=b.get("timestamp"),
            sh_degree=c.model.gaussian.sh_degree, clamp=True)["rgb"]
        arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        imageio.imwrite(info.image_path, arr)
    print(f"wrote {len(infos)} palette-GT images "
          f"({arr.shape[0]}x{arr.shape[1]})", flush=True)


def make_instrumented_hook(c, events: list):
    """Distillation hook (VERDICT r2 #3): a MID-SIZE VDM engine (same
    structure as the flagship — full channel_mult/attention/CLIP context
    dims, reduced model_channels — so the conditioning plumbing and window
    logic are exercised unchanged) with per-event wall-clock + HBM-peak
    instrumentation. Random converted-structure weights: real checkpoints
    are env-blocked; the rehearsal measures the reference hot loop's shape
    (train.py:123-138 + diffusion_utils.py:229-314) on the chip, not sample
    quality."""
    import jax

    from street_crafter_tpu.models.vdm.clip import CLIPVisualConfig
    from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                      VideoDiffusionEngine)
    from street_crafter_tpu.models.vdm.unet import UNetConfig
    from street_crafter_tpu.models.vdm.vae import VAEConfig
    from street_crafter_tpu.models.vdm.weights import load_vdm_params
    from street_crafter_tpu.runner.diffusion import (DiffusionRunner,
                                                     diffusion_camera)
    from street_crafter_tpu.runner.train import make_eval_render

    d = c.diffusion
    mc = int(d.get("mid_channels", 192))
    tiny_towers = bool(d.get("tiny_towers", False))  # CPU wiring smoke only
    engine_cfg = EngineConfig(
        unet=UNetConfig(model_channels=mc, dtype="bfloat16",
                        fused_temporal=not tiny_towers,
                        num_head_channels=16 if tiny_towers else 64,
                        context_dim=48 if tiny_towers else 1024,
                        adm_in_channels=24 if tiny_towers else 768),
        vae=VAEConfig.tiny() if tiny_towers else VAEConfig(dtype="bfloat16"),
        clip=(CLIPVisualConfig.tiny() if tiny_towers
              else CLIPVisualConfig(dtype="bfloat16")),
        num_frames=d.sample_frames, num_steps=d.num_steps,
        cfg_scale=d.cfg_scale,
        decode_chunk=int(d.get("decode_chunk", 8)),
        encode_chunk=int(d.get("encode_chunk", 0)),
        low_vram=bool(d.get("low_vram", True)) and not tiny_towers)
    engine = VideoDiffusionEngine(engine_cfg)
    t0 = time.perf_counter()
    params = load_vdm_params(engine, d, init_height=d.height,
                             init_width=d.width)
    # eval-only hook: bf16 params at rest (the engine computes in bf16
    # anyway) — f32 masters for a 1.3B mid engine cost 5.2 GB HBM and
    # OOMed the subsequent GS train step on the 15.75 GB chip
    import jax.numpy as jnp
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "dtype") and p.dtype == jnp.float32 else p, params)
    # attempt-3 finding (Aug 19): bf16-at-rest (2.6 GB) was NOT enough —
    # the first GS train step AFTER a sampling event still died
    # RESOURCE_EXHAUSTED at the exact same point as the f32 attempt. So
    # keep the eval-only engine params at rest on HOST: freed HBM during
    # all GS training, pushed to device only for each event's duration
    # (one 2.6 GB transfer per event) and deleted right after.
    host_params = jax.device_get(params)
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    params = host_params
    n = sum(p.size for p in jax.tree.leaves(params))
    print(f"[diffusion] mid engine ({mc}ch, {n/1e6:.0f} M params) "
          f"init {time.perf_counter()-t0:.0f}s (params at rest on host)",
          flush=True)

    def mem_gb():
        try:
            st = jax.local_devices()[0].memory_stats()
            return st.get("peak_bytes_in_use", 0) / 2**30
        except Exception:
            return float("nan")

    def hook(trainer, iteration: int, scale: float,
             masked_guidance: bool) -> None:
        scene = trainer.scene
        # Drop every cached executable + its device allocations before the
        # event: after a 100+-step GS phase (train step at kc16384, stats
        # probes, eval renders — all at 576x1024) the accumulated loaded
        # executables and allocator fragmentation left the 50-step CFG
        # denoise scan RESOURCE_EXHAUSTED even with low_vram keeping only
        # the 3.06 GB UNet resident (r5 flagship attempts 4-5). The GS step
        # recompiles after the event via the persistent compile cache.
        jax.clear_caches()
        dev_params = jax.device_put(params)
        runner = DiffusionRunner(
            scene, engine, dev_params, height=d.height, width=d.width,
            window_size=d.window_size, num_steps=d.num_steps,
            cfg_scale=d.cfg_scale,
            save_dir=os.path.join(scene.model_path, "diffusion"))
        eval_render = make_eval_render(c, scene.meta,
                                       trainer.active_sh(iteration))
        render_s = [0.0]

        def render_fn(info):
            t0 = time.perf_counter()
            cam = diffusion_camera(info, d.height, d.width)
            batch = scene.batch_for(info)
            out = eval_render(trainer.state.params, cam, batch)
            render_s[0] += time.perf_counter() - t0
            return out

        t0 = time.perf_counter()
        runner.run(scene.info.novel_view_cameras, scene.info.train_cameras,
                   render_fn=render_fn, scale=scale,
                   masked_guidance=masked_guidance)
        ev = dict(iteration=iteration, scale=scale,
                  total_s=time.perf_counter() - t0,
                  gs_render_s=render_s[0], hbm_peak_gb=mem_gb())
        # drop the engine's device copy AND the sampling executables
        # before GS training resumes (see the host-at-rest note in
        # make_instrumented_hook; r3 measured the post-event GS step dying
        # without this)
        for leaf in jax.tree.leaves(dev_params):
            leaf.delete()
        jax.clear_caches()
        events.append(ev)
        print(f"[diffusion] it {iteration}: event {ev['total_s']:.1f}s "
              f"(gs renders {ev['gs_render_s']:.1f}s) "
              f"HBM peak {ev['hbm_peak_gb']:.2f} GB", flush=True)

    return hook


def _enable_compile_cache():
    """Persistent XLA compile cache (same policy as __graft_entry__): a
    flagship-scale rehearsal's cold engine init is ~18 min of compiles over
    the tunnel; with the cache a relaunch (e.g. after a VM reset) reuses
    them (214 s measured at mid scale). Honors JAX_COMPILATION_CACHE_DIR so
    snapshot launches can share the work tree's cache."""
    import jax
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_compile_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # older jax — run uncached, but say so: an
        # interrupted rehearsal would silently repay ~18 min of compiles
        print(f"[warn] compile cache setup failed ({e!r}); "
              f"running without a persistent cache", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--root", default="")
    ap.add_argument("--diffusion", action="store_true",
                    help="distillation rehearsal: GS training + sliding-"
                         "window VDM sampling + SDS init (VERDICT r2 #3)")
    ap.add_argument("--mid-channels", type=int, default=192)
    # latent H/W (image/8) must divide by 8 again for the UNet's three
    # 2x downsamples + skips: 384x512 -> 48x64 latents
    ap.add_argument("--diff-height", type=int, default=384)
    ap.add_argument("--diff-width", type=int, default=512)
    ap.add_argument("--sample-frames", type=int, default=13)
    ap.add_argument("--num-steps", type=int, default=20)
    ap.add_argument("--tiny-towers", action="store_true",
                    help="tiny VAE/CLIP + small context dims (CPU wiring "
                         "smoke only; the chip run uses full towers)")
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help="VAE decode chunk (>=4: 3-frame overlap floor)")
    ap.add_argument("--encode-chunk", type=int, default=0,
                    help="VAE encode chunk (0 = decode chunk); the encoder "
                         "has no temporal context so 1-2 is valid — the "
                         "r5 flagship OOM site at 576x1024")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="also checkpoint every N iters (config resume=True "
                         "restarts a killed run from the last one — the r4 "
                         "flagship rehearsal was zeroed by a VM restart)")
    args = ap.parse_args()
    _enable_compile_cache()

    if args.diffusion:
        # a lane-shift trajectory has one camera per scene frame; sampling
        # needs n >= sample_frames-1 (DiffusionRunner.run_sequence)
        args.frames = max(args.frames, args.sample_frames - 1)

    root = args.root or tempfile.mkdtemp(prefix="onchip_e2e_")
    from tests.synthetic_scene import make_scene
    scene_dir = make_scene(root, num_frames=args.frames,
                           img_hw=(args.height, args.width))

    c = build_config(scene_dir, os.path.join(root, "model"), args.iters)
    if args.checkpoint_every:
        c.train.checkpoint_iterations = sorted(
            set(range(args.checkpoint_every, args.iters,
                      args.checkpoint_every)) | {args.iters})
    hook, events = None, []
    if args.diffusion:
        c.diffusion.use_diffusion = True
        c.diffusion.height = args.diff_height
        c.diffusion.width = args.diff_width
        c.diffusion.sample_frames = args.sample_frames
        c.diffusion.num_steps = args.num_steps
        c.diffusion.window_size = 2
        c.diffusion.decode_chunk = args.decode_chunk
        c.diffusion.encode_chunk = args.encode_chunk
        c.diffusion.mid_channels = args.mid_channels
        c.diffusion.tiny_towers = args.tiny_towers
        # two sampling events inside the run; SDS partial denoise on the 2nd
        c.diffusion.sample_iterations = [args.iters // 4, args.iters // 2]
        c.diffusion.sds_scales = [0.7, 0.4]
        c.diffusion.masked_guidance_iter = args.iters // 2
        c.train.novel_view_prob = 0.3
        c.render.novel_view.shift = [2.0]
    write_gt_images(c)

    from street_crafter_tpu.runner.train import train
    if args.diffusion:
        hook = make_instrumented_hook(c, events)
    t0 = time.perf_counter()
    train(c, diffusion_hook=hook)
    dt = time.perf_counter() - t0
    diff_s = sum(e["total_s"] for e in events)
    print(f"on-chip e2e: {args.iters} iters in {dt:.1f} s "
          f"({dt / args.iters * 1e3:.1f} ms/iter incl. compile+eval+io)")
    if events:
        print(f"phase split: GS training {dt - diff_s:.1f} s, "
              f"diffusion {diff_s:.1f} s over {len(events)} events; "
              f"HBM peak {max(e['hbm_peak_gb'] for e in events):.2f} GB")
    print(f"outputs in {c.model_path}")


if __name__ == "__main__":
    main()
