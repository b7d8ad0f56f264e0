"""Torch reference SD-VAE (Encoder + temporal VideoDecoder) fixture.

Our own torch implementation of the published SD-VAE f8 architecture with
vwm's temporal decoder deltas (model.py:445-694, temporal_ae.py), named so
``state_dict()`` keys match the reference exactly (``encoder.down.0.block.0
.norm1.weight``, ``decoder.mid.block_1.time_stack.in_layers.0.weight``,
``decoder.conv_out.time_mix_conv.weight``, ...). Test fixture only.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def norm6(ch):
    return nn.GroupNorm(min(32, ch), ch, eps=1e-6)


class ResnetBlock(nn.Module):
    def __init__(self, ch, out_ch=None):
        super().__init__()
        out_ch = out_ch or ch
        self.norm1 = norm6(ch)
        self.conv1 = nn.Conv2d(ch, out_ch, 3, padding=1)
        self.norm2 = norm6(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if out_ch != ch:
            self.nin_shortcut = nn.Conv2d(ch, out_ch, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TemporalResBlock3D(nn.Module):
    """openaimodel ResBlock dims=3 skip_t_emb (Sequential indices match:
    in_layers.{0,2}, out_layers.{0,3})."""

    def __init__(self, ch, kernel_size=(3, 1, 1)):
        super().__init__()
        pad = tuple(k // 2 for k in kernel_size)
        self.in_layers = nn.Sequential(
            nn.GroupNorm(min(32, ch), ch), nn.SiLU(),
            nn.Conv3d(ch, ch, kernel_size, padding=pad))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(min(32, ch), ch), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv3d(ch, ch, kernel_size, padding=pad))
        for p in self.out_layers[3].parameters():
            nn.init.zeros_(p)

    def forward(self, x):
        return x + self.out_layers(self.in_layers(x))


class VideoResBlock(ResnetBlock):
    def __init__(self, ch, out_ch=None, video_kernel_size=(3, 1, 1),
                 alpha=0.0):
        super().__init__(ch, out_ch)
        oc = out_ch or ch
        self.time_stack = TemporalResBlock3D(oc, video_kernel_size)
        self.mix_factor = nn.Parameter(torch.full((1,), float(alpha)))

    def forward(self, x, num_frames):
        x = super().forward(x)
        bt, c, h, w = x.shape
        b = bt // num_frames
        x5 = x.reshape(b, num_frames, c, h, w).movedim(1, 2)  # B C T H W
        h5 = self.time_stack(x5)
        a = torch.sigmoid(self.mix_factor)[0]
        out = a * h5 + (1 - a) * x5
        return out.movedim(2, 1).reshape(bt, c, h, w)


class AttnBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.norm = norm6(ch)
        self.q = nn.Conv2d(ch, ch, 1)
        self.k = nn.Conv2d(ch, ch, 1)
        self.v = nn.Conv2d(ch, ch, 1)
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x):
        n, c, H, W = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(n, c, H * W)
        k = self.k(h).reshape(n, c, H * W)
        v = self.v(h).reshape(n, c, H * W)
        attn = torch.einsum("ncq,nck->nqk", q, k) * (c ** -0.5)
        attn = attn.softmax(dim=-1)
        h = torch.einsum("nqk,nck->ncq", attn, v).reshape(n, c, H, W)
        return x + self.proj_out(h)


class _Level(nn.Module):
    def __init__(self):
        super().__init__()
        self.block = nn.ModuleList()


class TorchEncoder(nn.Module):
    def __init__(self, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                 z_channels=4, double_z=True):
        super().__init__()
        self.conv_in = nn.Conv2d(3, ch, 3, padding=1)
        self.down = nn.ModuleList()
        c = ch
        for lv, mult in enumerate(ch_mult):
            level = _Level()
            for _ in range(num_res_blocks):
                level.block.append(ResnetBlock(c, ch * mult))
                c = ch * mult
            if lv != len(ch_mult) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)
                level.downsample = ds
            self.down.append(level)
        self.mid = nn.ModuleDict({"block_1": ResnetBlock(c),
                                  "attn_1": AttnBlock(c),
                                  "block_2": ResnetBlock(c)})
        self.norm_out = norm6(c)
        out_c = 2 * z_channels if double_z else z_channels
        self.conv_out = nn.Conv2d(c, out_c, 3, padding=1)
        self._nlevels = len(ch_mult)

    def forward(self, x):
        h = self.conv_in(x)
        for lv, level in enumerate(self.down):
            for blk in level.block:
                h = blk(h)
            if lv != self._nlevels - 1:
                h = F.pad(h, (0, 1, 0, 1))
                h = level.downsample.conv(h)
        h = self.mid["block_1"](h)
        h = self.mid["attn_1"](h)
        h = self.mid["block_2"](h)
        return self.conv_out(F.silu(self.norm_out(h)))


class AE3DConv(nn.Conv2d):
    def __init__(self, in_ch, out_ch, video_kernel_size=(3, 1, 1)):
        super().__init__(in_ch, out_ch, 3, padding=1)
        pad = tuple(k // 2 for k in video_kernel_size)
        self.time_mix_conv = nn.Conv3d(out_ch, out_ch, video_kernel_size,
                                       padding=pad)

    def forward(self, x, num_frames):
        x = super().forward(x)
        bt, c, h, w = x.shape
        b = bt // num_frames
        x5 = x.reshape(b, num_frames, c, h, w).movedim(1, 2)
        x5 = self.time_mix_conv(x5)
        return x5.movedim(2, 1).reshape(bt, c, h, w)


class TorchVideoDecoder(nn.Module):
    def __init__(self, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                 z_channels=4, out_ch=3, video_kernel_size=(3, 1, 1)):
        super().__init__()
        c = ch * ch_mult[-1]
        self.conv_in = nn.Conv2d(z_channels, c, 3, padding=1)
        self.mid = nn.ModuleDict({
            "block_1": VideoResBlock(c, video_kernel_size=video_kernel_size),
            "attn_1": AttnBlock(c),
            "block_2": VideoResBlock(c, video_kernel_size=video_kernel_size),
        })
        self.up = nn.ModuleList()
        ups = []
        for lv, mult in list(enumerate(ch_mult))[::-1]:
            level = _Level()
            for _ in range(num_res_blocks + 1):
                level.block.append(VideoResBlock(
                    c, ch * mult, video_kernel_size=video_kernel_size))
                c = ch * mult
            if lv != 0:
                us = nn.Module()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                level.upsample = us
            ups.insert(0, level)
        for level in ups:
            self.up.append(level)
        self.norm_out = norm6(c)
        self.conv_out = AE3DConv(c, out_ch, video_kernel_size)
        self._nlevels = len(ch_mult)

    def forward(self, z, num_frames):
        h = self.conv_in(z)
        h = self.mid["block_1"](h, num_frames)
        h = self.mid["attn_1"](h)
        h = self.mid["block_2"](h, num_frames)
        for lv in reversed(range(self._nlevels)):
            level = self.up[lv]
            for blk in level.block:
                h = blk(h, num_frames)
            if lv != 0:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = level.upsample.conv(h)
        h = F.silu(self.norm_out(h))
        return self.conv_out(h, num_frames)


class TorchVAE(nn.Module):
    """first_stage_model fixture: encoder + video decoder."""

    def __init__(self, **kw):
        super().__init__()
        self.encoder = TorchEncoder(**{k: v for k, v in kw.items()
                                       if k != "out_ch"})
        self.decoder = TorchVideoDecoder(**kw)
