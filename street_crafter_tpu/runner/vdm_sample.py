"""Standalone conditioned video sampling over meta_info clips.

The video_diffusion/sample_condition.py CLI analog (:487-563): iterate val
clips, run LiDAR-conditioned sampling (frame 0 as conditioning), save
ground-truth / condition / sample videos side by side.

CLI: python -m street_crafter_tpu.runner.vdm_sample --config cfg.yaml [k=v ..]
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config, load_config, merge_dotlist
from ..datasets.vdm_data import ClipDataset
from ..models.vdm.engine import VideoDiffusionEngine
from ..models.vdm.weights import engine_from_config, load_vdm_params
from ..visualizers import save_video
from ..visualizers.visualizer import to_uint8


def sample_clips(cfg: Config, num_clips: int | None = None) -> list[str]:
    v = cfg.vdm_train
    out_dir = cfg.model_path or os.path.join(cfg.workspace, "output",
                                             "vdm_samples", cfg.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    dcfg = cfg.diffusion.clone()
    dcfg.sample_frames = v.num_frames
    engine = VideoDiffusionEngine(engine_from_config(dcfg))
    params = load_vdm_params(engine, dcfg, init_height=v.height,
                             init_width=v.width)

    ds = ClipDataset(v.data_root, split="val", target_height=v.height,
                     target_width=v.width, num_frames=v.num_frames,
                     postfix=v.get("postfix") or None)
    n = min(num_clips or len(ds), len(ds))
    key = jax.random.PRNGKey(23)  # the reference seeds 23 per call
    videos = []
    from .diffusion import sampling_mesh_from_cfg
    mesh = sampling_mesh_from_cfg(cfg)
    for i in range(n):
        item = ds[i]
        if mesh is not None:
            from ..parallel import sample_on_mesh
            out = sample_on_mesh(
                engine, params, key, jnp.asarray(item["guide_seq"]),
                jnp.asarray(item["img_seq"][:1]), mesh=mesh)
        else:
            out = engine.sample(
                params, key,
                guide_images=jnp.asarray(item["guide_seq"]),
                cond_image=jnp.asarray(item["img_seq"][:1]))
        sample = (np.asarray(out) + 1.0) / 2.0
        gt = (item["img_seq"] + 1.0) / 2.0
        guide = (item["guide_seq"] + 1.0) / 2.0
        frames = [np.concatenate([to_uint8(g), to_uint8(c), to_uint8(s)], 0)
                  for g, c, s in zip(gt, guide, sample)]
        videos.append(save_video(
            os.path.join(out_dir, f"clip_{i:04d}.mp4"), frames,
            fps=cfg.render.fps))
        print(f"clip {i}: {videos[-1]}")
    return videos


def sample_rollout(engine: VideoDiffusionEngine, params, key,
                   guide_images: np.ndarray, cond_image: np.ndarray,
                   overlap: int = 3, cfg_scale: float | None = None,
                   num_steps: int | None = None) -> np.ndarray:
    """Multi-round long-video rollout with frame overlap (Vista do_sample,
    sample_utils.py:286-376): round 1 conditions on the given frame, each
    later round on the last ``overlap`` frames of the previous round.
    guide_images: [F, H, W, 3] in [-1, 1]; returns [F, H, W, 3] in [-1, 1].
    """
    T = engine.cfg.num_frames
    F = guide_images.shape[0]
    out = np.zeros_like(guide_images)
    pos = 0
    cond_imgs = np.asarray(cond_image)[None] if cond_image.ndim == 3 \
        else np.asarray(cond_image)
    cond_indices: tuple[int, ...] = (0,)
    while pos < F:
        end = min(pos + T, F)
        start = end - T
        # overlap frames must sit at the window head; shift back if clipped
        if start < pos - overlap:
            start = max(pos - overlap, 0)
            end = start + T
        key, k = jax.random.split(key)
        frames = engine.sample(
            params, k,
            guide_images=jnp.asarray(guide_images[start:end]),
            cond_image=jnp.asarray(cond_imgs),
            cfg_scale=cfg_scale, num_steps=num_steps,
            cond_indices=cond_indices)
        frames = np.asarray(frames)
        out[start:end] = frames
        pos = end
        cond_imgs = frames[-overlap:]
        cond_indices = tuple(range(overlap))
    return out


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="conditioned video sampling")
    p.add_argument("--config", required=True)
    p.add_argument("--num-clips", type=int, default=None)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = default_config()
    cfg.merge(load_config(args.config))
    merge_dotlist(cfg, args.opts)
    sample_clips(cfg, args.num_clips)


if __name__ == "__main__":
    main()
