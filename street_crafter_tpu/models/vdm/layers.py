"""Shared building blocks of the video diffusion stack.

flax.linen counterparts of vwm/modules/diffusionmodules/{openaimodel,util}.py
and vwm/modules/attention.py — ResBlock, VideoResBlock, up/downsampling,
AlphaBlender, sinusoidal timestep embeddings, transformer blocks. Data layout
is channels-last ([B, H, W, C] spatial / [B, T, H, W, C] temporal) for TPU
convs; the weight converter transposes torch kernels accordingly.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ...ops.attention import multi_head_attention

# Mixed precision: every module takes a ``dtype`` (compute dtype) threaded
# from the top-level config. dtype=None keeps flax promotion semantics
# (f32 when params are f32); dtype=bf16 casts params+inputs to bf16 at each
# layer, so f32 master params (training) and f32 side inputs (timestep
# embeddings, cond masks) cannot silently promote the whole chain to f32 —
# the round-1 bf16 eval leaked to f32 downstream of `h + emb` exactly this
# way and ran the MXU at the f32 rate. Norm statistics stay f32 inside flax
# regardless (normalization._compute_stats force_float32_reductions).


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: int = 10000) -> jax.Array:
    """Sinusoidal embeddings (util.py:141-168): [N] -> [N, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class MLPEmbed(nn.Module):
    """linear -> SiLU -> linear (time_embed / label_emb / time_pos_embed)."""
    out_dim: int
    hidden_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_dim or self.out_dim
        x = nn.Dense(hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, name="fc2", dtype=self.dtype)(x)


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mixing (util.py:277-318)."""
    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        if self.merge_strategy == "fixed":
            a = jnp.asarray(self.alpha, x_spatial.dtype)
        else:
            mix = self.param("mix_factor", lambda k: jnp.full((1,), self.alpha))
            a = jax.nn.sigmoid(mix)[0].astype(x_spatial.dtype)
        return a * x_spatial + (1.0 - a) * x_temporal


class Int8Conv(nn.Module):
    """Drop-in W8A8 convolution for the EVAL path (same param tree as
    nn.Conv: "kernel" [*ks, in, out] + "bias" [out], so converted
    checkpoints load unchanged).

    Dynamic symmetric quantization: per-output-channel weight scales,
    per-tensor activation scale from the live max — no calibration pass.
    The int8 conv hits the v5e MXU's int8 path, measured 1.69x the bf16
    conv rate (179.6 vs 106.6 TOPS at the UNet level-0 shape — ABOVE the
    ~110 TF/s bf16 ceiling, unlike int8 matmul which XLA runs at bf16
    rate). Accumulation in int32, dequant + bias in f32.

    Eval-only: round() has zero gradient — never enable for fine-tuning.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] | None = None
    padding: Any = "SAME"
    kernel_init: Any = nn.initializers.lecun_normal()
    out_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        nd = len(ks)
        kernel = self.param("kernel", self.kernel_init,
                            ks + (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k32 = kernel.astype(jnp.float32)
        wamax = jnp.max(jnp.abs(k32), axis=tuple(range(nd + 1)))  # [out]
        wscale = jnp.maximum(wamax, 1e-12) / 127.0
        wq = jnp.clip(jnp.round(k32 / wscale), -127, 127).astype(jnp.int8)
        x32 = x.astype(jnp.float32)
        xscale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x32 / xscale), -127, 127).astype(jnp.int8)
        lead = x.shape[:-(nd + 1)]
        xq = xq.reshape((-1,) + x.shape[-(nd + 1):])
        pad = self.padding
        if isinstance(pad, str):
            pad = pad
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape,
            ("N" + "DHW"[3 - nd:] + "C", "DHW"[3 - nd:] + "IO",
             "N" + "DHW"[3 - nd:] + "C"))
        o = jax.lax.conv_general_dilated(
            xq, wq, self.strides or (1,) * nd, pad,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        o = o.astype(jnp.float32) * (wscale * xscale) + bias.astype(jnp.float32)
        o = o.reshape(lead + o.shape[1:])
        return o.astype(self.out_dtype)


def _norm(name="norm", dtype=None):
    """openaimodel GroupNorm32: torch nn.GroupNorm default eps=1e-5."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name, dtype=dtype)


def _norm_attn(name="norm", dtype=None):
    """attention.py Normalize: GroupNorm with eps=1e-6 (:141-142) — used by
    the (Spatial)Transformer's input norm, NOT by ResBlocks."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name, dtype=dtype)


class ResBlock(nn.Module):
    """GN -> SiLU -> conv, +t-emb, GN -> SiLU -> conv(zero-init), +skip
    (openaimodel.py:146-284). dims=3 uses a [kt,1,1]-style kernel over
    [B, T, H, W, C]."""
    out_channels: Optional[int] = None
    dims: int = 2
    kernel_size: Sequence[int] | int = 3
    use_scale_shift_norm: bool = False
    exchange_temb_dims: bool = False  # temporal block gets [B, T, emb]
    up: bool = False
    down: bool = False
    dtype: Any = None
    quant_convs: bool = False  # W8A8 int8 for the 2D 3x3 convs (eval only)

    @nn.compact
    def __call__(self, x, emb):
        ch_in = x.shape[-1]
        out_ch = self.out_channels or ch_in
        if isinstance(self.kernel_size, int):
            ks = (self.kernel_size,) * self.dims
        else:
            ks = tuple(self.kernel_size)
        # int8 only for the heavy 2D 3x3 convs; the (3,1,1) temporal stack
        # and 1x1 skip are matmul-shaped (no int8 MXU win, see Int8Conv)
        if self.quant_convs and self.dims == 2 and max(ks) > 1:
            conv = lambda c, name: Int8Conv(
                c, ks, name=name,
                out_dtype=self.dtype or jnp.float32)
        else:
            conv = lambda c, name: nn.Conv(c, ks, padding="SAME", name=name,
                                           dtype=self.dtype)

        h = nn.silu(_norm("in_norm", self.dtype)(x))
        if self.up:
            h = upsample_nearest(h)
            x = upsample_nearest(x)
        elif self.down:
            h = avg_pool_nd(h)
            x = avg_pool_nd(x)
        h = conv(out_ch, "in_conv")(h)

        emb_dim = 2 * out_ch if self.use_scale_shift_norm else out_ch
        emb_out = nn.Dense(emb_dim, name="emb_proj",
                           dtype=self.dtype)(nn.silu(emb))
        # broadcast emb over spatial dims: [B(,T),C] -> [B(,T),1,..,C].
        # torch's exchange_temb_dims moves T before C in NCTHW; in channels-
        # last layout a per-(batch, frame) emb broadcasts naturally.
        while emb_out.ndim < h.ndim:
            emb_out = jnp.expand_dims(emb_out, -2)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _norm("out_norm", self.dtype)(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = _norm("out_norm", self.dtype)(h)
        h = nn.silu(h)
        if self.quant_convs and self.dims == 2 and max(ks) > 1:
            h = Int8Conv(out_ch, ks, name="out_conv",
                         kernel_init=nn.initializers.zeros,
                         out_dtype=self.dtype or jnp.float32)(h)
        else:
            h = nn.Conv(out_ch, ks, padding="SAME", name="out_conv",
                        kernel_init=nn.initializers.zeros, dtype=self.dtype)(h)

        if out_ch == ch_in:
            skip = x
        else:
            skip = nn.Conv(out_ch, (1,) * self.dims, name="skip_conv",
                           dtype=self.dtype)(x)
        return skip + h


def upsample_nearest(x):
    """2x nearest-neighbor upsample on the two spatial dims (last two before C)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-3), 2, axis=-2)


def avg_pool_nd(x):
    """2x average pool over the two spatial dims before C."""
    lead = x.shape[:-3]
    xr = x.reshape((-1,) + x.shape[-3:])
    out = nn.avg_pool(xr, (2, 2), strides=(2, 2))
    return out.reshape(lead + out.shape[1:])


class Downsample(nn.Module):
    """Strided conv downsample (openaimodel.py Downsample, conv path)."""
    out_channels: Optional[int] = None
    dtype: Any = None
    quant_convs: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        if self.quant_convs:
            return Int8Conv(out_ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="conv",
                            out_dtype=self.dtype or jnp.float32)(x)
        return nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       name="conv", dtype=self.dtype)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (openaimodel.py Upsample)."""
    out_channels: Optional[int] = None
    dtype: Any = None
    quant_convs: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        x = upsample_nearest(x)
        if self.quant_convs:
            return Int8Conv(out_ch, (3, 3), name="conv",
                            out_dtype=self.dtype or jnp.float32)(x)
        return nn.Conv(out_ch, (3, 3), padding="SAME", name="conv",
                       dtype=self.dtype)(x)


class VideoResBlock(nn.Module):
    """2D ResBlock + 3D temporal ResBlock mixed by AlphaBlender
    (video_model.py:14-80). Input [B*T, H, W, C]."""
    out_channels: Optional[int] = None
    video_kernel_size: Sequence[int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    up: bool = False
    down: bool = False
    dtype: Any = None
    quant_convs: bool = False

    @nn.compact
    def __call__(self, x, emb, num_frames: int):
        x = ResBlock(out_channels=self.out_channels, dims=2,
                     up=self.up, down=self.down, name="spatial",
                     dtype=self.dtype, quant_convs=self.quant_convs)(x, emb)
        bt, H, W, C = x.shape
        b = bt // num_frames
        x_5d = x.reshape(b, num_frames, H, W, C)
        emb_5d = emb.reshape(b, num_frames, -1)
        h = ResBlock(out_channels=C, dims=3,
                     kernel_size=tuple(self.video_kernel_size),
                     exchange_temb_dims=True, name="time_stack",
                     dtype=self.dtype)(x_5d, emb_5d)
        x_mix = AlphaBlender(self.merge_factor, self.merge_strategy,
                             name="time_mixer")(x_5d, h)
        return x_mix.reshape(bt, H, W, C)


class CrossAttention(nn.Module):
    """Multi-head (self/cross) attention (attention.py:326-421), with the
    reference's optional rank-decomposed LoRA adapters (attention.py:294-316:
    down init N(0, 1/rank), up zero-init => adapters start as a no-op; the
    PEFT fine-tune group trains only these + cond_time_stack_embed,
    diffusion_condition.py:320-330). Converted checkpoints arrive with LoRA
    already merged (bin_to_st semantics), so adapters always init fresh."""
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    add_lora: bool = False
    lora_rank: int = 16
    lora_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        to_q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)
        to_k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)
        to_v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)
        to_out = nn.Dense(x.shape[-1] if self.context_dim is None else inner,
                          name="to_out", dtype=self.dtype)

        if self.add_lora:
            r = self.lora_rank

            def lora(name, out_dim):
                down = nn.Dense(r, use_bias=False, dtype=self.dtype,
                                name=f"{name}_adapter_down",
                                kernel_init=nn.initializers.normal(1.0 / r))
                up = nn.Dense(out_dim, use_bias=False, dtype=self.dtype,
                              name=f"{name}_adapter_up",
                              kernel_init=nn.initializers.zeros)
                return lambda t: self.lora_scale * up(down(t))

            lq = lora("q", inner)
            lk = lora("k", inner)
            lv = lora("v", inner)
            lo = lora("out", x.shape[-1] if self.context_dim is None
                      else inner)
        else:
            lq = lk = lv = lo = lambda t: 0.0
        if context is not None and context.shape[1] == 1:
            # length-1 context (the CLIP image embedding): softmax over a
            # single key is identically 1, so attention reduces EXACTLY to
            # out = to_out(to_v(ctx)) broadcast over queries — skipping the
            # q/k projections and the attention kernel (~7.8 -> ~0.5 ms at
            # [50, 9216, 320] on v5e). q/k are still traced on one token so
            # the parameter tree matches converted checkpoints (XLA DCEs
            # the dead compute).
            _ = to_q(x[:, :1]) + to_k(ctx[:, :1])
            if self.add_lora:
                _ = lq(x[:, :1]) + lk(ctx[:, :1])
            v = to_v(ctx) + lv(ctx)
            out = to_out(v) + lo(v)                       # [B, 1, C]
            return jnp.broadcast_to(out, (x.shape[0], x.shape[1],
                                          out.shape[-1]))
        q = to_q(x) + lq(x)
        k = to_k(ctx) + lk(ctx)
        v = to_v(ctx) + lv(ctx)
        B, S, _ = q.shape
        Skv = k.shape[1]
        q = q.reshape(B, S, self.heads, self.dim_head)
        k = k.reshape(B, Skv, self.heads, self.dim_head)
        v = v.reshape(B, Skv, self.heads, self.dim_head)
        out = multi_head_attention(q, k, v)
        out = out.reshape(B, S, inner)
        res = to_out(out) + lo(out)
        # named for remat policies (unet.py "flashx"): lets the backward
        # reuse this block output instead of recomputing the attention —
        # matters for the temporal sites (S = num_frames), whose XLA
        # attention is not covered by the flash_out_s* kernel names
        return checkpoint_name(res, f"attn_out_q{S}_c{res.shape[-1]}")


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward, mult=4 (attention.py FeedForward).

    Stays plain XLA deliberately: a fused Pallas GEGLU (weights VMEM-
    resident, no HBM round-trip for the [tokens, 2*inner] projection) was
    measured SLOWER end-to-end on v5e (1.79 -> 1.95 s/UNet eval) — the
    pallas_call is a fusion barrier that forces the surrounding LayerNorm/
    residual chain to materialize, costing more than the projection
    round-trip saves."""
    mult: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = nn.Dense(inner * 2, name="proj_in", dtype=self.dtype)(x)
        a, b = jnp.split(proj, 2, axis=-1)
        return nn.Dense(dim, name="proj_out", dtype=self.dtype)(a * nn.gelu(b))


class BasicTransformerBlock(nn.Module):
    """self-attn + cross-attn + ff with pre-LN (attention.py:424-524)."""
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    add_lora: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context=None):
        dt = self.dtype
        x = CrossAttention(self.heads, self.dim_head, name="attn1",
                           add_lora=self.add_lora, dtype=dt)(
            nn.LayerNorm(name="norm1", dtype=dt)(x)) + x
        x = CrossAttention(self.heads, self.dim_head,
                           context_dim=self.context_dim, name="attn2",
                           add_lora=self.add_lora, dtype=dt)(
            nn.LayerNorm(name="norm2", dtype=dt)(x), context) + x
        x = GEGLUFeedForward(name="ff", dtype=dt)(
            nn.LayerNorm(name="norm3", dtype=dt)(x)) + x
        return x


class VideoTransformerBlock(nn.Module):
    """Temporal transformer over the frame axis: reshapes
    (b t) s c -> (b s) t c (video_attention.py:111-141). ff_in matches the
    extra_ff_mix_layer=True config."""
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    ff_in: bool = True
    add_lora: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context=None, num_frames: int = 1):
        BT, S, C = x.shape
        b = BT // num_frames
        x = x.reshape(b, num_frames, S, C).transpose(0, 2, 1, 3)
        x = x.reshape(b * S, num_frames, C)
        if context is not None and context.shape[0] != x.shape[0]:
            # time context arrives per (b t); take frame 0 and repeat per token
            ctx = context.reshape(b, num_frames, *context.shape[1:])[:, 0]
            context = jnp.repeat(ctx, S, axis=0)

        dt = self.dtype
        if self.ff_in:
            x = GEGLUFeedForward(name="ff_in", dtype=dt)(
                nn.LayerNorm(name="norm_in", dtype=dt)(x)) + x
        x = CrossAttention(self.heads, self.dim_head, name="attn1",
                           add_lora=self.add_lora, dtype=dt)(
            nn.LayerNorm(name="norm1", dtype=dt)(x)) + x
        x = CrossAttention(self.heads, self.dim_head,
                           context_dim=self.context_dim, name="attn2",
                           add_lora=self.add_lora, dtype=dt)(
            nn.LayerNorm(name="norm2", dtype=dt)(x), context) + x
        x = GEGLUFeedForward(name="ff", dtype=dt)(
            nn.LayerNorm(name="norm3", dtype=dt)(x)) + x

        x = x.reshape(b, S, num_frames, C).transpose(0, 2, 1, 3)
        return x.reshape(BT, S, C)


class SpatialVideoTransformer(nn.Module):
    """Spatial transformer paired with temporal mix blocks + frame-index
    positional embedding + AlphaBlender (video_attention.py:239-296)."""
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_spatial_context: bool = True
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    max_time_embed_period: int = 10000
    add_lora: bool = False
    # Fuse the whole temporal stage (+emb, VideoTransformerBlock,
    # AlphaBlender) into one Pallas kernel (ops/temporal_block.py).
    # Eval-only (forward, bf16); falls back to the XLA modules whenever the
    # kernel's structural conditions don't hold. Param tree is identical
    # either way (the XLA path builds it at init).
    fused_temporal: bool = False
    dtype: Any = None

    def _fused_ok(self, C, num_frames, S, time_context):
        return (self._fused_common(num_frames, S, time_context)
                and C <= 384)                     # full weight VMEM residency

    def _fused_ok_large(self, C, num_frames, S, time_context):
        # attention-only kernel: qkv+out weights fit VMEM up to C=1280
        return (self._fused_common(num_frames, S, time_context)
                and 384 < C <= 1280)

    def _fused_common(self, num_frames, S, time_context):
        return (self.fused_temporal
                and not self.is_initializing()
                and not self.add_lora
                and self.dtype is not None
                and jnp.dtype(self.dtype) == jnp.bfloat16
                and num_frames > 1
                and time_context is not None
                and time_context.shape[1] == 1
                and S % 16 == 0)

    def _alpha_and_bias(self, p, h, time_context, num_frames):
        """AlphaBlender coefficient + the length-1 cross-attention bias
        (softmax over one key is exactly 1, so attn2's output is
        to_out(to_v(ctx)) — independent of x)."""
        if self.merge_strategy == "fixed":
            alpha = jnp.asarray(self.merge_factor, jnp.float32)
        else:
            mix = self.variables["params"]["time_mixer"]["mix_factor"]
            alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0]
        b = h.shape[0] // num_frames
        if time_context.shape[0] == b:
            ctx = time_context[:, 0]
        else:
            ctx = time_context.reshape(
                b, num_frames, *time_context.shape[1:])[:, 0, 0]
        a2 = p["attn2"]
        bias = ctx.astype(jnp.bfloat16) @ a2["to_v"]["kernel"] \
            .astype(jnp.bfloat16)
        bias = bias @ a2["to_out"]["kernel"].astype(jnp.bfloat16) \
            + a2["to_out"]["bias"].astype(jnp.bfloat16)
        return alpha, bias

    def _fused_temporal_stage_large(self, h, time_context, num_frames,
                                    emb, d):
        """C in (384, 1280]: the temporal attention runs in a Pallas
        kernel straight off the (b t) s c layout (ops/temporal_block.py
        _attn_kernel) — no transposes — while the per-token ff_in/ff/LN
        stay XLA (layout-agnostic, well fused; full-stage weights exceed
        VMEM at these widths)."""
        from ...ops.temporal_block import temporal_attention_fused
        p = self.variables["params"][f"time_block_{d}"]
        alpha, bias = self._alpha_and_bias(p, h, time_context, num_frames)
        a1 = p["attn1"]
        wqkv = jnp.concatenate(
            [a1["to_q"]["kernel"], a1["to_k"]["kernel"],
             a1["to_v"]["kernel"]], axis=1)
        dt = self.dtype
        C = h.shape[-1]
        x = h + emb
        x = GEGLUFeedForward(dtype=dt).apply(
            {"params": p["ff_in"]},
            nn.LayerNorm(dtype=dt).apply({"params": p["norm_in"]}, x)) + x
        x = temporal_attention_fused(
            x, bias, p["norm1"]["scale"], p["norm1"]["bias"],
            wqkv, a1["to_out"]["kernel"], a1["to_out"]["bias"],
            num_frames=num_frames, heads=self.heads,
            dim_head=self.dim_head,
            rows_per_block=16 if C <= 1024 else 8)
        x = GEGLUFeedForward(dtype=dt).apply(
            {"params": p["ff"]},
            nn.LayerNorm(dtype=dt).apply({"params": p["norm3"]}, x)) + x
        a = alpha.astype(jnp.float32)
        return (a * h.astype(jnp.float32)
                + (1.0 - a) * x.astype(jnp.float32)).astype(h.dtype)

    def _fused_temporal_stage(self, h, time_context, num_frames, emb_flat,
                              d):
        from ...ops.temporal_block import temporal_block_fused
        p = self.variables["params"][f"time_block_{d}"]
        alpha, bias = self._alpha_and_bias(p, h, time_context, num_frames)
        a1 = p["attn1"]
        wqkv = jnp.concatenate(
            [a1["to_q"]["kernel"], a1["to_k"]["kernel"],
             a1["to_v"]["kernel"]], axis=1)
        return temporal_block_fused(
            h, emb_flat, alpha, bias,
            p["norm_in"]["scale"], p["norm_in"]["bias"],
            p["ff_in"]["proj_in"]["kernel"], p["ff_in"]["proj_in"]["bias"],
            p["ff_in"]["proj_out"]["kernel"], p["ff_in"]["proj_out"]["bias"],
            p["norm1"]["scale"], p["norm1"]["bias"],
            wqkv, a1["to_out"]["kernel"], a1["to_out"]["bias"],
            p["norm3"]["scale"], p["norm3"]["bias"],
            p["ff"]["proj_in"]["kernel"], p["ff"]["proj_in"]["bias"],
            p["ff"]["proj_out"]["kernel"], p["ff"]["proj_out"]["bias"],
            num_frames=num_frames, heads=self.heads, dim_head=self.dim_head,
            rows_per_block=8)

    @nn.compact
    def __call__(self, x, context=None, num_frames: int = 1):
        BT, H, W, C = x.shape
        x_in = x
        inner = self.heads * self.dim_head

        time_context = None
        if self.use_spatial_context and context is not None:
            time_context = context  # handled per-block (frame-0 slice)

        h = _norm_attn("norm", self.dtype)(x)
        h = h.reshape(BT, H * W, C)
        # use_linear_in_transformer
        h = nn.Dense(inner, name="proj_in", dtype=self.dtype)(h)

        frames = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32),
                          BT // num_frames)
        t_emb = timestep_embedding(frames, C, self.max_time_embed_period)
        emb_flat = MLPEmbed(C, hidden_dim=C * 4, name="time_pos_embed",
                            dtype=self.dtype)(t_emb)
        emb = emb_flat[:, None]
        use_fused = self._fused_ok(inner, num_frames, H * W, time_context)
        use_fused_large = self._fused_ok_large(inner, num_frames, H * W,
                                               time_context)

        for d in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, context_dim=self.context_dim,
                add_lora=self.add_lora,
                name=f"block_{d}", dtype=self.dtype)(h, context)
            if use_fused:
                h = self._fused_temporal_stage(h, time_context, num_frames,
                                               emb_flat, d)
                continue
            if use_fused_large:
                h = self._fused_temporal_stage_large(
                    h, time_context, num_frames, emb, d)
                continue
            h_mix = h + emb
            h_mix = VideoTransformerBlock(
                self.heads, self.dim_head, context_dim=self.context_dim,
                add_lora=self.add_lora,
                name=f"time_block_{d}", dtype=self.dtype)(
                h_mix, time_context, num_frames)
            h = AlphaBlender(self.merge_factor, self.merge_strategy,
                             name="time_mixer")(h, h_mix)

        h = nn.Dense(C, name="proj_out", dtype=self.dtype,
                     kernel_init=nn.initializers.zeros)(h)
        h = h.reshape(BT, H, W, C)
        return h + x_in
