"""Video-diffusion fine-tune driver.

The video_diffusion/train.py analog, TPU-native: instead of Lightning
DDP/DeepSpeed ZeRO-2 over NCCL (train.py:745-758), one jax mesh with a
``data`` axis — params replicated, Adam moments ZeRO-sharded, batch clips
sharded (training/vdm_trainer.py). Data comes from meta_info clip windows
(datasets/vdm_data.py); first-stage encoding runs on device inside a jitted
closure over the frozen VAE/CLIP.

CLI: python -m street_crafter_tpu.runner.vdm_train --config cfg.yaml [k=v ..]
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config, load_config, merge_dotlist
from ..datasets.vdm_data import ClipDataset, MultiSourceSampler
from ..models.vdm.engine import VideoDiffusionEngine
from ..models.vdm.weights import (engine_from_config, load_vdm_params,
                                  save_vdm_params)
from ..parallel import ShardingRules, make_mesh
from ..training.vdm_trainer import (
    init_vdm_train_state, make_vdm_train_step, shard_batch_for_mesh,
    shard_vdm_train_state,
)
from ..utils.checkpoint import load_checkpoint, save_checkpoint

SUBSET_CLASSES = {"waymo": ClipDataset, "pandaset": ClipDataset}


def build_sampler(cfg: Config) -> MultiSourceSampler:
    v = cfg.vdm_train
    datasets = []
    for name in v.subsets:
        root = os.path.join(v.data_root, name) if len(v.subsets) > 1 \
            else v.data_root
        datasets.append(SUBSET_CLASSES[name.lower()](
            root, split="train", target_height=v.height,
            target_width=v.width, num_frames=v.num_frames,
            postfix=v.get("postfix") or None))
    return MultiSourceSampler(
        datasets, probs=list(v.probs) if v.probs else None,
        batch_size=v.batch_size, samples_per_epoch=v.samples_per_epoch,
        seed=cfg.seed, num_workers=int(v.get("num_workers", 0) or 0))


def make_encode_fn(engine: VideoDiffusionEngine, params):
    """Jitted: raw image batch -> latent training batch
    (shared_step, diffusion_condition.py:237-247)."""

    @jax.jit
    def encode(img_seq: jax.Array, guide_seq: jax.Array) -> dict:
        B, T = img_seq.shape[:2]
        flat = lambda x: x.reshape((B * T,) + x.shape[2:])
        clip = lambda x: x.reshape((B, T) + x.shape[1:])
        latents = clip(engine.encode_images(params, flat(img_seq)))
        guidance = clip(engine.encode_images(params, flat(guide_seq)))
        cond, _ = engine.build_conditioning(params, img_seq[:, 0])
        cond = jax.tree_util.tree_map(
            lambda x: x.reshape((B, T) + x.shape[1:]), cond)
        return {"latents": latents, "cond": cond,
                "guidance_latents": guidance}

    return encode


def finetune(cfg: Config) -> None:
    v = cfg.vdm_train
    model_path = cfg.model_path or os.path.join(
        cfg.workspace, "output", "vdm", cfg.exp_name)
    os.makedirs(model_path, exist_ok=True)

    dcfg = cfg.diffusion.clone()
    dcfg.sample_frames = v.num_frames
    engine = VideoDiffusionEngine(engine_from_config(dcfg, training=True))
    params = load_vdm_params(engine, dcfg, init_height=v.height,
                             init_width=v.width)

    mesh = make_mesh(dict(cfg.mesh.axes))
    rules = ShardingRules(mesh, fsdp_params=bool(v.get("fsdp", False)))
    if mesh.shape.get("frames", 1) > 1:
        print(f"mesh: {dict(mesh.shape)} (frame-axis sequence sharding on)")
    if rules.fsdp_params:
        print("FSDP parameter sharding on (full-size fine-tune fits "
              "v5e-8: ~14.4 vs ~22 GB/device replicated)")
    # param-group recipe (slow/frozen temporal layers etc.,
    # diffusion_condition.py:298-355; the StreetCrafter conditioned
    # fine-tune freezes temporal layers: waymo_high_res_mix.yaml:12-16)
    groups = {k: v.get(k) for k in (
        "slow_spatial_layers", "slow_spatial_layers_scale",
        "slow_temporal_layers", "slow_temporal_layers_scale",
        "train_peft_adapters") if v.get(k) is not None}
    from ..models.vdm.lr_schedule import schedule_from_config
    schedule = schedule_from_config(v.get("scheduler"))
    state = shard_vdm_train_state(
        init_vdm_train_state(engine, params, lr=v.lr,
                             grad_clip=v.grad_clip, param_groups=groups,
                             schedule=schedule),
        rules)
    if cfg.resume:
        restored, it = load_checkpoint(model_path, state)
        if restored is not None:
            state = shard_vdm_train_state(restored, rules)
            print(f"resumed from step {it}")

    step_fn = make_vdm_train_step(
        engine, lr=v.lr, grad_clip=v.grad_clip, ema_decay=v.ema_decay,
        guidance_dropout=v.guidance_dropout, rules=rules,
        accum_steps=int(v.get("accumulate", 1)), param_groups=groups,
        schedule=schedule)
    encode_fn = make_encode_fn(
        engine, {"vae": params["vae"], "clip": params["clip"]})

    from ..utils.metrics import MetricsLogger, ProfilerHook
    metrics = MetricsLogger(os.path.join(model_path, "logs"))
    profiler = ProfilerHook(cfg.profiler, model_path)

    def log_image_samples(step: int, np_batch: dict) -> None:
        """ImageLogger analog (video_diffusion/train.py:318-475 +
        log_images, diffusion_condition.py:383-450): dump inputs / VAE
        targets / current-weights samples of the batch's first clip as
        mp4 + first-frame TB images under image_log/."""
        from ..visualizers import save_video
        full = {"unet": state.unet_params, **state.frozen_params}
        img = jnp.asarray(np_batch["img_seq"][0])      # [T, H, W, 3] [-1,1]
        guide = jnp.asarray(np_batch["guide_seq"][0])
        z = engine.encode_images_chunked(full, img)
        targets = engine.decode_latents_chunked(full, z)
        samples = engine.sample(
            full, jax.random.PRNGKey(step), guide, img[:1],
            num_steps=int(v.get("log_images_steps", 0)) or None)
        out_dir = os.path.join(model_path, "image_log", f"step_{step:08d}")
        os.makedirs(out_dir, exist_ok=True)
        for name, seq in (("inputs", img), ("targets", targets),
                          ("samples", samples)):
            frames = list(np.asarray((seq + 1.0) / 2.0).clip(0, 1))
            save_video(os.path.join(out_dir, f"{name}.mp4"), frames,
                       fps=int(cfg.render.fps))
            metrics.log_image(step, f"image_log/{name}", frames[0])

    key = jax.random.PRNGKey(cfg.seed)
    sampler = build_sampler(cfg)
    step = int(state.step)
    t0 = time.perf_counter()
    for epoch in range(v.epochs):
        for np_batch in sampler:
            profiler.step(step)
            key, k = jax.random.split(key)
            batch = encode_fn(jnp.asarray(np_batch["img_seq"]),
                              jnp.asarray(np_batch["guide_seq"]))
            batch = shard_batch_for_mesh(batch, rules, v.num_frames)
            state, scalars = step_fn(state, batch, k)
            step += 1
            if step % v.log_every == 0:
                dt = time.perf_counter() - t0
                vals = {k2: float(v2) for k2, v2 in scalars.items()}
                metrics.log_scalars(step, vals, prefix="train/")
                print(f"[epoch {epoch} step {step}] "
                      f"loss={vals['loss']:.4f} "
                      f"({v.log_every / dt:.2f} it/s)", flush=True)
                t0 = time.perf_counter()
            if v.log_images_every and step % v.log_images_every == 0:
                log_image_samples(step, np_batch)
            if step % v.ckpt_every == 0:
                save_checkpoint(model_path, step, state)
    profiler.close()
    metrics.close()
    save_checkpoint(model_path, step, state)
    # export EMA weights in engine format for sampling (bin_to_st analog)
    save_vdm_params(os.path.join(model_path, "ema_params"),
                    {"unet": state.ema_params, **state.frozen_params})
    print(f"done: {step} steps; ema params at {model_path}/ema_params")


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="video diffusion fine-tune")
    p.add_argument("--config", required=True)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = default_config()
    cfg.merge(load_config(args.config))
    merge_dotlist(cfg, args.opts)
    finetune(cfg)


if __name__ == "__main__":
    main()
