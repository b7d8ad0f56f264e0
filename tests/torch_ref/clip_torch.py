"""Torch reference OpenCLIP ViT visual tower fixture.

Our own torch implementation of the published CLIP ViT visual encoder with
open_clip's state-dict naming (conv1, class_embedding, positional_embedding,
ln_pre, transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp}, ln_post, proj).
Test fixture only.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualAttentionBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu", nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, need_weights=False)
        x = x + h
        x = x + self.mlp(self.ln_2(x))
        return x


class _Transformer(nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [ResidualAttentionBlock(width, heads) for _ in range(layers)])

    def forward(self, x):
        for blk in self.resblocks:
            x = blk(x)
        return x


class TorchCLIPVisual(nn.Module):
    """open_clip VisionTransformer (visual.*) with final projection."""

    def __init__(self, image_size=32, patch_size=8, width=32, layers=2,
                 heads=2, output_dim=48):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, stride=patch_size,
                               bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n_tok = (image_size // patch_size) ** 2
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(n_tok + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = _Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        n = x.shape[0]
        x = self.conv1(x)                       # [N, W, g, g]
        x = x.reshape(n, x.shape[1], -1).movedim(1, 2)  # [N, T, W]
        cls = self.class_embedding[None, None].expand(n, 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x)
        x = self.ln_post(x[:, 0])
        return x @ self.proj
