"""OpenCLIP ViT visual tower (image embedder).

flax counterpart of FrozenOpenCLIPImageEmbedder (vwm/modules/encoders/
modules.py:255-404): the frozen ViT-H/14 visual encoder whose pooled, final
projection (1024-d) feeds cross-attention as the single reference-frame
embedding. Weights are converted from an open_clip checkpoint
(models/vdm/convert.py); a tiny config serves tests.

Preprocess matches the reference (modules.py:302-311 + SVD convention):
inputs in [-1, 1] -> bicubic resize to 224 -> [0, 1] -> CLIP mean/std.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisualConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    output_dim: int = 1024
    # compute dtype; None = flax promotion (see models/vdm/layers.py header)
    dtype: Optional[str] = None

    @staticmethod
    def tiny() -> "CLIPVisualConfig":
        return CLIPVisualConfig(image_size=32, patch_size=8, width=32,
                                layers=2, heads=2, output_dim=48)


class ResidualAttentionBlock(nn.Module):
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        width = x.shape[-1]
        h = nn.LayerNorm(name="ln_1", dtype=dt)(x)
        h = nn.SelfAttention(num_heads=self.heads, qkv_features=width,
                             name="attn", deterministic=True, dtype=dt)(h)
        x = x + h
        h = nn.LayerNorm(name="ln_2", dtype=dt)(x)
        h = nn.Dense(width * 4, name="mlp_fc", dtype=dt)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(width, name="mlp_proj", dtype=dt)(h)
        return x + h


class CLIPVisual(nn.Module):
    cfg: CLIPVisualConfig = CLIPVisualConfig()

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """[N, H, W, 3] preprocessed images -> [N, output_dim] embeddings."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype) if cfg.dtype else None
        n = images.shape[0]
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    name="patch_embed", dtype=dt)(images)
        x = x.reshape(n, -1, cfg.width)
        n_tok = x.shape[1]
        cls = self.param("class_embedding",
                         nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (n_tok + 1, cfg.width))
        x = x + pos
        x = nn.LayerNorm(name="ln_pre", dtype=dt)(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.heads, name=f"resblock_{i}",
                                       dtype=dt)(x)
        x = nn.LayerNorm(name="ln_post", dtype=dt)(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.width, cfg.output_dim))
        return x @ proj.astype(x.dtype)


def clip_preprocess(images: jax.Array, size: int = 224) -> jax.Array:
    """[-1,1] images [N,H,W,3] -> normalized [N,size,size,3]."""
    x = (images + 1.0) / 2.0
    x = jax.image.resize(x, (x.shape[0], size, size, 3), method="bicubic")
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
