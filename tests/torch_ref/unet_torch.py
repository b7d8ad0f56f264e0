"""Torch reference implementation of the SVD/StreetCrafter VideoUNet.

Our own torch implementation of the PUBLISHED SVD architecture (as in
vwm/modules/diffusionmodules/video_model.py + attention.py +
video_attention.py), written so its ``state_dict()`` uses the exact
reference key names. It exists purely as a test fixture: conversion tests
save its state dict, convert to flax, and compare forward activations
(torch CPU f32 vs jax CPU f32).

NOT copied from the reference — re-implemented from the architecture spec;
behavioral deviations from vwm are bugs in THIS file and get fixed when the
numerics tests disagree.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


def zero_(m):
    for p in m.parameters():
        nn.init.zeros_(p)
    return m


def norm32(ch):
    return nn.GroupNorm(32 if ch % 32 == 0 else min(32, ch), ch)


class ResBlock(nn.Module):
    """openaimodel ResBlock (dims 2 or 3), NCHW / NCTHW."""

    def __init__(self, ch, emb_ch, out_ch=None, dims=2, kernel_size=3,
                 exchange_temb_dims=False, skip_t_emb=False):
        super().__init__()
        out_ch = out_ch or ch
        self.out_ch = out_ch
        self.exchange_temb_dims = exchange_temb_dims
        self.skip_t_emb = skip_t_emb
        conv = nn.Conv2d if dims == 2 else nn.Conv3d
        if isinstance(kernel_size, int):
            pad = kernel_size // 2
        else:
            pad = tuple(k // 2 for k in kernel_size)
        self.in_layers = nn.Sequential(
            norm32(ch), nn.SiLU(), conv(ch, out_ch, kernel_size, padding=pad))
        if not skip_t_emb:
            self.emb_layers = nn.Sequential(
                nn.SiLU(), nn.Linear(emb_ch, out_ch))
        self.out_layers = nn.Sequential(
            norm32(out_ch), nn.SiLU(), nn.Dropout(0.0),
            zero_(conv(out_ch, out_ch, kernel_size, padding=pad)))
        if out_ch != ch:
            self.skip_connection = conv(ch, out_ch, 1)

    def forward(self, x, emb=None):
        h = self.in_layers(x)
        if not self.skip_t_emb:
            e = self.emb_layers(emb)
            if self.exchange_temb_dims:
                # [B, T, C] -> [B, C, T] then broadcast over H, W
                e = e.movedim(-1, 1)
            while e.dim() < h.dim():
                e = e[..., None]
            h = h + e
        h = self.out_layers(h)
        skip = self.skip_connection(x) if hasattr(self, "skip_connection") \
            else x
        return skip + h


class AlphaBlender(nn.Module):
    def __init__(self, alpha=0.5):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.full((1,), float(alpha)))

    def forward(self, x_spatial, x_temporal):
        a = torch.sigmoid(self.mix_factor)[0]
        return a * x_spatial + (1.0 - a) * x_temporal


class VideoResBlock(ResBlock):
    """video_model.py VideoResBlock: spatial ResBlock (own params) + 3D
    time_stack + time_mixer. x: [B*T, C, H, W]."""

    def __init__(self, ch, emb_ch, out_ch=None, video_kernel_size=(3, 1, 1)):
        super().__init__(ch, emb_ch, out_ch, dims=2)
        self.time_stack = ResBlock(self.out_ch, emb_ch, self.out_ch, dims=3,
                                   kernel_size=tuple(video_kernel_size),
                                   exchange_temb_dims=True)
        self.time_mixer = AlphaBlender(0.5)

    def forward(self, x, emb, num_frames):
        x = super().forward(x, emb)
        bt, c, h, w = x.shape
        b = bt // num_frames
        x5 = x.reshape(b, num_frames, c, h, w).movedim(1, 2)  # B C T H W
        e5 = emb.reshape(b, num_frames, -1)
        h5 = self.time_stack(x5, e5)
        out = self.time_mixer(x5, h5)
        return out.movedim(2, 1).reshape(bt, c, h, w)


class CrossAttention(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.dim_head = dim_head
        ctx = context_dim or dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        B, S, _ = x.shape
        q = self.to_q(x).reshape(B, S, self.heads, self.dim_head)
        k = self.to_k(ctx).reshape(B, -1, self.heads, self.dim_head)
        v = self.to_v(ctx).reshape(B, -1, self.heads, self.dim_head)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.dim_head)
        attn = attn.softmax(dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        a, b = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(b)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(GEGLU(dim, dim * mult), nn.Dropout(0.0),
                                 nn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim=None, ff_in=False):
        super().__init__()
        if ff_in:
            self.norm_in = nn.LayerNorm(dim)
            self.ff_in = FeedForward(dim)
        self.has_ff_in = ff_in
        self.attn1 = CrossAttention(dim, heads, dim_head)
        self.attn2 = CrossAttention(dim, heads, dim_head, context_dim)
        self.ff = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context=None):
        if self.has_ff_in:
            x = self.ff_in(self.norm_in(x)) + x
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class VideoTransformerBlock(BasicTransformerBlock):
    """Temporal block: (b t) s c -> (b s) t c."""

    def forward(self, x, context=None, num_frames=1):
        bt, s, c = x.shape
        b = bt // num_frames
        x = x.reshape(b, num_frames, s, c).movedim(1, 2).reshape(
            b * s, num_frames, c)
        if context is not None and context.shape[0] != x.shape[0]:
            ctx0 = context.reshape(b, num_frames,
                                   *context.shape[1:])[:, 0]
            context = ctx0.repeat_interleave(s, dim=0)
        x = super().forward(x, context)
        return x.reshape(b, s, num_frames, c).movedim(1, 2).reshape(bt, s, c)


class SpatialVideoTransformer(nn.Module):
    def __init__(self, ch, heads, dim_head, depth=1, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32 if ch % 32 == 0 else min(32, ch), ch,
                                 eps=1e-6)
        self.proj_in = nn.Linear(ch, inner)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner, heads, dim_head, context_dim)
            for _ in range(depth)])
        self.time_stack = nn.ModuleList([
            VideoTransformerBlock(inner, heads, dim_head, context_dim,
                                  ff_in=True) for _ in range(depth)])
        self.time_pos_embed = nn.Sequential(
            nn.Linear(ch, ch * 4), nn.SiLU(), nn.Linear(ch * 4, ch))
        self.time_mixer = AlphaBlender(0.5)
        self.proj_out = zero_(nn.Linear(inner, ch))
        self.ch = ch

    def forward(self, x, context=None, num_frames=1):
        bt, c, H, W = x.shape
        x_in = x
        h = self.norm(x)
        h = h.reshape(bt, c, H * W).movedim(1, 2)   # bt, s, c
        h = self.proj_in(h)
        frames = torch.arange(num_frames, dtype=torch.float32).repeat(
            bt // num_frames)
        emb = self.time_pos_embed(timestep_embedding(frames, self.ch))
        emb = emb[:, None]
        time_context = context
        for block, mix_block in zip(self.transformer_blocks,
                                    self.time_stack):
            h = block(h, context)
            h_mix = h + emb
            h_mix = mix_block(h_mix, time_context, num_frames)
            h = self.time_mixer(h, h_mix)
        h = self.proj_out(h)
        h = h.movedim(2, 1).reshape(bt, c, H, W)
        return h + x_in


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchVideoUNet(nn.Module):
    """Reference-named SVD UNet + StreetCrafter deltas. Layout NCHW."""

    def __init__(self, in_channels=8, model_channels=32, out_channels=4,
                 num_res_blocks=2, attention_resolutions=(2,),
                 channel_mult=(1, 2), num_head_channels=16,
                 transformer_depth=1, context_dim=48, adm_in_channels=24):
        super().__init__()
        mc = model_channels
        ted = mc * 4
        self.model_channels = mc
        self.num_res_blocks = num_res_blocks
        self.channel_mult = channel_mult
        self.attention_resolutions = attention_resolutions

        self.time_embed = nn.Sequential(
            nn.Linear(mc, ted), nn.SiLU(), nn.Linear(ted, ted))
        self.cond_time_stack_embed = nn.Sequential(
            nn.Linear(mc, ted), nn.SiLU(), nn.Linear(ted, ted))
        self.label_emb = nn.Sequential(nn.Sequential(
            nn.Linear(adm_in_channels, ted), nn.SiLU(), nn.Linear(ted, ted)))

        def attn(ch):
            return SpatialVideoTransformer(
                ch, ch // num_head_channels, num_head_channels,
                transformer_depth, context_dim)

        self.input_blocks = nn.ModuleList([nn.ModuleList(
            [nn.Conv2d(in_channels, mc, 3, padding=1)])])
        self.condition_input_blocks = nn.ModuleList([
            nn.ModuleList([nn.Conv2d(in_channels // 2, mc, 3, padding=1)]),
            nn.ModuleList([zero_(nn.Conv2d(mc, mc, 3, padding=1))]),
        ])

        ch = mc
        ds = 1
        chans = [mc]
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                mods = [VideoResBlock(ch, ted, mult * mc)]
                ch = mult * mc
                if ds in attention_resolutions:
                    mods.append(attn(ch))
                self.input_blocks.append(nn.ModuleList(mods))
                chans.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.ModuleList([Downsample(ch)]))
                chans.append(ch)
                ds *= 2
        self.middle_block = nn.ModuleList(
            [VideoResBlock(ch, ted), attn(ch), VideoResBlock(ch, ted)])

        self.output_blocks = nn.ModuleList()
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                skip_ch = chans.pop()
                mods = [VideoResBlock(ch + skip_ch, ted, mult * mc)]
                ch = mult * mc
                if ds in attention_resolutions:
                    mods.append(attn(ch))
                if level and i == num_res_blocks:
                    mods.append(Upsample(ch))
                    ds //= 2
                self.output_blocks.append(nn.ModuleList(mods))

        self.out = nn.Sequential(norm32(ch), nn.SiLU(),
                                 zero_(nn.Conv2d(ch, out_channels, 3,
                                                 padding=1)))

    def forward(self, x, timesteps, context, y, num_frames, cond_mask=None,
                guidance_input=None, guidance_scale=None):
        mc = self.model_channels
        t_emb = timestep_embedding(timesteps, mc)
        if cond_mask is not None:
            cm = cond_mask.float()[:, None]
            emb = self.cond_time_stack_embed(t_emb) * cm + \
                self.time_embed(t_emb) * (1 - cm)
        else:
            emb = self.time_embed(t_emb)
        if context.shape[0] != x.shape[0]:
            context = context.repeat_interleave(num_frames, dim=0)
        if y.shape[0] != x.shape[0]:
            y = y.repeat_interleave(num_frames, dim=0)
        emb = emb + self.label_emb(y)

        def run(mods, h):
            for m in mods:
                if isinstance(m, VideoResBlock):
                    h = m(h, emb, num_frames)
                elif isinstance(m, SpatialVideoTransformer):
                    h = m(h, context, num_frames)
                else:
                    h = m(h)
            return h

        hs = []
        h = run(self.input_blocks[0], x)
        if guidance_input is not None:
            g = self.condition_input_blocks[0][0](guidance_input)
            g = self.condition_input_blocks[1][0](g)
            scale = guidance_scale if guidance_scale is not None else 1.0
            if torch.is_tensor(scale):
                while scale.dim() < g.dim():
                    scale = scale[..., None]
            h = h + g * scale
        hs.append(h)
        for mods in list(self.input_blocks)[1:]:
            h = run(mods, h)
            hs.append(h)
        h = run(self.middle_block, h)
        for mods in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = run(mods, h)
        return self.out(h)
