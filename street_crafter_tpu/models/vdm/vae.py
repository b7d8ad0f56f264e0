"""SD VAE (f8, z=4) encoder/decoder + temporal VideoDecoder.

flax.linen counterparts of vwm/modules/diffusionmodules/model.py:445-694
(Encoder/Decoder, ch=128, ch_mult [1,2,4,4], 2 res blocks, mid attention)
and vwm/modules/autoencoding/temporal_ae.py (VideoDecoder: every ResnetBlock
gains a 3D temporal ResBlock mixed by a learned alpha, conv_out gains a
time_mix 3D conv). DiagonalGaussian regularizer matches
vwm/modules/autoencoding/regularizers + distributions.

Layout: [N, H, W, C] (N = B*T); temporal ops reshape to [B, T, H, W, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    double_z: bool = True
    video_kernel_size: Sequence[int] = (3, 1, 1)
    scale_factor: float = 0.18215
    # compute dtype; None = flax promotion (see models/vdm/layers.py header)
    dtype: Optional[str] = None

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


def _norm(name, dtype=None):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name, dtype=dtype)


def _norm_small(name, ch, dtype=None):
    groups = min(32, ch)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name,
                        dtype=dtype)


class ResnetBlock(nn.Module):
    """model.py ResnetBlock (no temb in the autoencoder path)."""
    out_channels: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        ch_in = x.shape[-1]
        out_ch = self.out_channels or ch_in
        h = nn.silu(_norm_small("norm1", ch_in, dt)(x))
        h = nn.Conv(out_ch, (3, 3), padding="SAME", name="conv1", dtype=dt)(h)
        h = nn.silu(_norm_small("norm2", out_ch, dt)(h))
        h = nn.Conv(out_ch, (3, 3), padding="SAME", name="conv2", dtype=dt)(h)
        if out_ch != ch_in:
            x = nn.Conv(out_ch, (1, 1), name="nin_shortcut", dtype=dt)(x)
        return x + h


class TemporalResBlock(nn.Module):
    """3D ResBlock with skip_t_emb (openaimodel ResBlock dims=3) used as the
    VideoResBlock time_stack (temporal_ae.py:25-37). Input [B,T,H,W,C]."""
    kernel_size: Sequence[int] = (3, 1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        ch = x.shape[-1]
        ks = tuple(self.kernel_size)
        h = nn.silu(_norm_small("in_norm", ch, dt)(x))
        h = nn.Conv(ch, ks, padding="SAME", name="in_conv", dtype=dt)(h)
        h = nn.silu(_norm_small("out_norm", ch, dt)(h))
        h = nn.Conv(ch, ks, padding="SAME", name="out_conv", dtype=dt,
                    kernel_init=nn.initializers.zeros)(h)
        return x + h


class VideoResnetBlock(nn.Module):
    """ResnetBlock + temporal mixer (temporal_ae.py VideoResBlock)."""
    out_channels: Optional[int] = None
    video_kernel_size: Sequence[int] = (3, 1, 1)
    alpha: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, num_frames: int):
        x = ResnetBlock(self.out_channels, name="spatial",
                        dtype=self.dtype)(x)
        bt, H, W, C = x.shape
        b = bt // num_frames
        x5 = x.reshape(b, num_frames, H, W, C)
        h = TemporalResBlock(tuple(self.video_kernel_size),
                             name="time_stack", dtype=self.dtype)(x5)
        mix = self.param("mix_factor", lambda k: jnp.full((1,), self.alpha))
        a = jax.nn.sigmoid(mix)[0].astype(h.dtype)
        out = a * h + (1.0 - a) * x5.astype(h.dtype)
        return out.reshape(bt, H, W, C)


class AttnBlock(nn.Module):
    """Single-head bottleneck attention (model.py AttnBlock, vanilla)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        N, H, W, C = x.shape
        h = _norm_small("norm", C, dt)(x)
        q = nn.Conv(C, (1, 1), name="q", dtype=dt)(h).reshape(N, H * W, C)
        k = nn.Conv(C, (1, 1), name="k", dtype=dt)(h).reshape(N, H * W, C)
        v = nn.Conv(C, (1, 1), name="v", dtype=dt)(h).reshape(N, H * W, C)
        attn = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", q, k,
                       preferred_element_type=jnp.float32) * (C ** -0.5), -1)
        h = jnp.einsum("nqk,nkc->nqc", attn.astype(v.dtype), v)
        h = h.reshape(N, H, W, C)
        h = nn.Conv(C, (1, 1), name="proj_out", dtype=dt)(h)
        return x.astype(h.dtype) + h


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype) if cfg.dtype else None
        h = nn.Conv(cfg.ch, (3, 3), padding="SAME", name="conv_in",
                    dtype=dt)(x)
        for level, mult in enumerate(cfg.ch_mult):
            for i in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, name=f"down_{level}_block_{i}",
                                dtype=dt)(h)
            if level != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1) then stride-2 conv (model.py Downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), dtype=dt,
                            padding="VALID", name=f"down_{level}_downsample")(h)
        h = ResnetBlock(name="mid_block_1", dtype=dt)(h)
        h = AttnBlock(name="mid_attn_1", dtype=dt)(h)
        h = ResnetBlock(name="mid_block_2", dtype=dt)(h)
        h = nn.silu(_norm_small("norm_out", h.shape[-1], dt)(h))
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding="SAME", name="conv_out",
                       dtype=dt)(h)


class Decoder(nn.Module):
    """Spatial decoder; ``video`` switches in the temporal variant."""
    cfg: VAEConfig = VAEConfig()
    video: bool = False

    @nn.compact
    def __call__(self, z, num_frames: int = 1):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype) if cfg.dtype else None

        def res(out_ch, name):
            if self.video:
                blk = VideoResnetBlock(out_ch, tuple(cfg.video_kernel_size),
                                       name=name, dtype=dt)
                return lambda h: blk(h, num_frames)
            blk = ResnetBlock(out_ch, name=name, dtype=dt)
            return blk

        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", name="conv_in",
                    dtype=dt)(z)
        h = res(block_in, "mid_block_1")(h)
        h = AttnBlock(name="mid_attn_1", dtype=dt)(h)
        h = res(block_in, "mid_block_2")(h)
        for level, mult in list(enumerate(cfg.ch_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                h = res(cfg.ch * mult, f"up_{level}_block_{i}")(h)
            if level != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(h.shape[-1], (3, 3), padding="SAME", dtype=dt,
                            name=f"up_{level}_upsample")(h)
        h = nn.silu(_norm_small("norm_out", h.shape[-1], dt)(h))
        h = nn.Conv(cfg.out_ch, (3, 3), padding="SAME", name="conv_out",
                    dtype=dt)(h)
        if self.video:
            bt, H, W, C = h.shape
            b = bt // num_frames
            h5 = h.reshape(b, num_frames, H, W, C)
            h5 = nn.Conv(cfg.out_ch, tuple(cfg.video_kernel_size),
                         padding="SAME", name="conv_out_time_mix", dtype=dt)(h5)
            h = h5.reshape(bt, H, W, C)
        return h


def diagonal_gaussian_sample(moments: jax.Array, key: jax.Array | None = None
                             ) -> jax.Array:
    """DiagonalGaussianRegularizer: sample (or mode when key is None)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape)


class VAE(nn.Module):
    """AutoencodingEngine analog: encoder + (video) decoder + scale factor."""
    cfg: VAEConfig = VAEConfig()
    video_decoder: bool = True

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, video=self.video_decoder,
                               name="decoder")

    def encode(self, x, key=None):
        """images [N,H,W,3] in [-1,1] -> scaled latents [N,h,w,z]."""
        moments = self.encoder(x)
        z = diagonal_gaussian_sample(moments, key)
        return z * self.cfg.scale_factor

    def decode(self, z, num_frames: int = 1):
        return self.decoder(z / self.cfg.scale_factor, num_frames=num_frames)

    def __call__(self, x, num_frames: int = 1, key=None):
        return self.decode(self.encode(x, key), num_frames)
