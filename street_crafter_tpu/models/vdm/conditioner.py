"""Conditioning assembly for the LiDAR-conditioned video model.

Analog of GeneralConditioner (vwm/modules/encoders/modules.py:70-184) with
the embedder set fixed to the StreetCrafter inference config
(configs/inference/waymo_high_res.yaml:43-105):

- ``crossattn``: frozen OpenCLIP image embedding of the conditioning frame,
  [B, 1, 1024];
- ``vector``: sinusoidal 256-d embeddings of (fps_id, motion_bucket_id,
  cond_aug) concatenated -> [B, 768] (ConcatTimestepEmbedderND);
- ``concat``: VAE-encoded (mode) conditioning frame latents repeated over the
  clip -> [B*T, h, w, 4] (VideoPredictionEmbedderWithEncoder);
- ``guidance``: VAE-encoded LiDAR-condition render latents + per-frame scale
  (diffusion_condition.py:158-180).

The unconditional branch zeroes crossattn and concat
(force_uc_zero_embeddings, sample_utils.py) and keeps vector.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .layers import timestep_embedding


class Conditioning(NamedTuple):
    """All leaves carried per frame ([B*T, ...]) so the jitted denoiser never
    re-shapes across the sharded batch axis."""
    crossattn: jax.Array  # [B*T, S, 1024]
    vector: jax.Array     # [B*T, 768]
    concat: jax.Array     # [B*T, h, w, 4]


def concat_timestep_embed(values: jax.Array, outdim: int = 256) -> jax.Array:
    """ConcatTimestepEmbedderND (modules.py:407-430): [B, D] -> [B, D*outdim]."""
    if values.ndim == 1:
        values = values[:, None]
    b, d = values.shape
    emb = timestep_embedding(values.reshape(-1), outdim)
    return emb.reshape(b, d * outdim)


def make_vector_conditioning(fps_id: jax.Array, motion_bucket_id: jax.Array,
                             cond_aug: jax.Array, outdim: int = 256) -> jax.Array:
    """fps/motion/cond_aug -> [B, 3*outdim] (the yaml's three embedders)."""
    parts = [concat_timestep_embed(v, outdim)
             for v in (fps_id, motion_bucket_id, cond_aug)]
    return jnp.concatenate(parts, axis=-1)


def get_conditioning(
    clip_embed_fn: Callable[[jax.Array], jax.Array],  # images -> [B, 1024]
    vae_encode_fn: Callable[[jax.Array], jax.Array],  # images -> latents (mode)
    cond_frame_without_noise: jax.Array,  # [B, H, W, 3] in [-1, 1]
    cond_frame: jax.Array,                # [B, H, W, 3] (cond_aug noise added)
    num_frames: int,
    fps_id: float = 10.0,
    motion_bucket_id: float = 127.0,
    cond_aug: float = 0.0,
    vector_outdim: int = 256,
) -> tuple[Conditioning, Conditioning]:
    """Returns (cond, uncond) — VanillaCFG's prepared pair (guiders.py:28-41,
    with crossattn/concat zeroed in uc)."""
    b = cond_frame.shape[0]
    crossattn = clip_embed_fn(cond_frame_without_noise)[:, None, :]
    crossattn = jnp.repeat(crossattn, num_frames, axis=0)
    ones = jnp.ones((b,), jnp.float32)
    vector = make_vector_conditioning(
        ones * fps_id, ones * motion_bucket_id, ones * cond_aug, vector_outdim)
    vector = jnp.repeat(vector, num_frames, axis=0)
    concat = vae_encode_fn(cond_frame)            # [B, h, w, 4]
    concat = jnp.repeat(concat, num_frames, axis=0)

    cond = Conditioning(crossattn=crossattn, vector=vector, concat=concat)
    uc = Conditioning(crossattn=jnp.zeros_like(crossattn), vector=vector,
                      concat=jnp.zeros_like(concat))
    return cond, uc


def apply_ucg_dropout(key: jax.Array, cond: Conditioning,
                      rates: dict[str, float], batch: int) -> Conditioning:
    """Per-embedder unconditional-guidance dropout during fine-tuning
    (GeneralConditioner ucg_rate; guidance dropout 0.15 lives in the engine,
    diffusion_condition.py:167-176)."""
    out = cond
    ks = jax.random.split(key, 3)
    if rates.get("crossattn", 0) > 0:
        t = out.crossattn.shape[0] // batch
        keep = jax.random.bernoulli(
            ks[0], 1 - rates["crossattn"], (batch, 1, 1))
        out = out._replace(crossattn=out.crossattn * jnp.repeat(keep, t, 0))
    if rates.get("concat", 0) > 0:
        t = out.concat.shape[0] // batch
        keep = jax.random.bernoulli(ks[1], 1 - rates["concat"], (batch, 1, 1, 1))
        keep = jnp.repeat(keep, t, axis=0)
        out = out._replace(concat=out.concat * keep)
    return out
