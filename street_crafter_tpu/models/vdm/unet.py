"""SVD/Vista VideoUNet with the StreetCrafter conditioning deltas.

flax.linen redesign of vwm/modules/diffusionmodules/video_model.py:83-535:
the SVD U-Net (channels 320x[1,2,4,4], attention at ds 1/2/4, head_dim 64,
context 1024, in 8 = 4 noise + 4 concat cond-frame channels) plus the two
StreetCrafter additions —

- ``cond_time_stack_embed``: a second timestep MLP selected per frame by
  cond_mask (video_model.py:157-162, 473-477);
- ``condition_input_blocks``: 2 convs (2nd zero-init) injecting the
  VAE-encoded LiDAR-condition latents, scaled by guidance['scale'], into the
  first input block's output (video_model.py:198-206, 500-512).

Input layout is [B*T, H, W, C] channels-last.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    BasicTransformerBlock, Downsample, MLPEmbed, ResBlock,
    SpatialVideoTransformer, Upsample, VideoResBlock, _norm,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Hyper-parameters (configs/inference/waymo_high_res.yaml:20-41)."""
    in_channels: int = 8
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    adm_in_channels: int = 768
    video_kernel_size: Sequence[int] = (3, 1, 1)
    merge_strategy: str = "learned_with_images"
    merge_factor: float = 0.5
    use_spatial_context: bool = True
    # LoRA adapters on every attention block (attention.py:294-316; the
    # train_peft_adapters fine-tune group). Fresh-initialized (no-op at
    # init); converted checkpoints arrive with LoRA merged.
    add_lora: bool = False
    lora_rank: int = 16
    # activation checkpointing of res/attention blocks (the reference trains
    # with use_checkpoint: True, waymo_high_res_mix.yaml:35); jax.checkpoint
    # rematerializes block activations in the backward pass
    remat: bool = True
    # remat policy: "nothing" = full recompute (jax.checkpoint default);
    # "dots" = save matmul/conv outputs with no batch dims, recompute only
    # the elementwise chains (jax.checkpoint_policies
    # .dots_with_no_batch_dims_saveable) — trades HBM for backward time
    # (measured: needs 47.5 GB, OOMs on v5e); "flash" = save ONLY the flash
    # attention outputs + logsumexp (checkpoint_name'd per width in
    # ops/flash_attention.py) so the backward skips re-running the O(S^2)
    # kernel (~1.3 GB extra at B=1x25f full size — OOMs on v5e);
    # "flash0" = save just the level-0 (longest-sequence) flash sites —
    # measured on v5e at full size: 2913 ms/step vs 3008 ("nothing") AND
    # lower peak HBM (13.95 vs 14.37 GB XLA memory_analysis) — default
    remat_policy: str = "flash0"
    # compute dtype ("bfloat16" for the TPU runtime paths; None = flax
    # promotion, i.e. f32 with f32 params — used by the numerics tests).
    # Params are stored f32 either way; see layers.py header.
    dtype: Optional[str] = None
    # fuse the temporal transformer stage into one Pallas kernel at eval
    # (ops/temporal_block.py; forward-only — leave False for fine-tuning)
    fused_temporal: bool = False
    # W8A8 int8 for the 2D 3x3 ResBlock/Down/Upsample convs (layers.py
    # Int8Conv): dynamic symmetric quantization hitting the v5e int8 MXU
    # path (1.69x the bf16 conv rate standalone). EVAL ONLY (round() kills
    # grads). Validated round 3 and NOT adopted as default: end-to-end CFG
    # eval gain is only 1.06x (convs are ~25% of eval FLOPs) at 59.8 dB
    # min per-frame PSNR vs bf16 / 1.0% rel-err vs the reference oracle —
    # see BASELINE.md int8 row and scripts/validate_int8_eval.py
    quant_convs: bool = False

    @staticmethod
    def tiny() -> "UNetConfig":
        """Small config for tests."""
        return UNetConfig(model_channels=32, num_head_channels=16,
                          channel_mult=(1, 2), attention_resolutions=(2,),
                          context_dim=48, adm_in_channels=24)


class VideoUNet(nn.Module):
    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                    # [B*T, H, W, in_channels]
        timesteps: jax.Array,            # [B*T]
        context: jax.Array,              # [B or B*T, S_ctx, context_dim]
        y: jax.Array,                    # [B or B*T, adm_in_channels]
        num_frames: int,
        cond_mask: Optional[jax.Array] = None,      # [B*T]
        guidance_input: Optional[jax.Array] = None,  # [B*T, H, W, in/2]
        guidance_scale: Optional[jax.Array] = None,  # [B*T] or scalar
    ) -> jax.Array:
        cfg = self.cfg
        mc = cfg.model_channels
        ted = mc * 4
        dt = jnp.dtype(cfg.dtype) if cfg.dtype else None

        t_emb = timestep_embedding(timesteps, mc)
        emb_plain = MLPEmbed(ted, hidden_dim=ted, name="time_embed",
                             dtype=dt)(t_emb)
        emb_cond = MLPEmbed(ted, hidden_dim=ted, dtype=dt,
                            name="cond_time_stack_embed")(t_emb)
        if cond_mask is not None:
            cm = cond_mask.astype(emb_plain.dtype)[:, None]
            emb = emb_cond * cm + emb_plain * (1 - cm)
        else:
            emb = emb_plain

        if context.shape[0] != x.shape[0]:
            context = jnp.repeat(context, num_frames, axis=0)
        if y.shape[0] != x.shape[0]:
            y = jnp.repeat(y, num_frames, axis=0)
        emb = emb + MLPEmbed(ted, hidden_dim=ted, name="label_emb",
                             dtype=dt)(y)

        # flash sites are named by sequence length (ops/flash_attention.py);
        # spatial attention at level L runs at S = (H/2^L) * (W/2^L)
        lvl_s = [(-(-x.shape[1] // (1 << lv))) * (-(-x.shape[2] // (1 << lv)))
                 for lv in range(3)]
        if cfg.remat_policy == "dots":
            pol = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif cfg.remat_policy == "flash":
            # save every flash site (~1.3 GB at B=1x25f full size — OOMs
            # next to the 15.75 GB budget; kept for bigger-HBM parts)
            names = [f"flash_{w}_s{s}" for w in ("out", "lse")
                     for s in lvl_s]
            pol = jax.checkpoint_policies.save_only_these_names(*names)
        elif cfg.remat_policy == "flash0":
            # save only the level-0 (longest-sequence) flash sites — where
            # fwd recompute is most expensive (~740 MB / ~230 ms of skipped
            # recompute at full size)
            pol = jax.checkpoint_policies.save_only_these_names(
                f"flash_out_s{lvl_s[0]}", f"flash_lse_s{lvl_s[0]}")
        elif cfg.remat_policy in ("flash01", "flashx"):
            # flash01: level-0 + level-1 flash sites (~1.1 GB at full size).
            # flashx: additionally the level-0 temporal-attention block
            # outputs (attn_out names in layers.py CrossAttention) —
            # ~1.8 GB at full size; AOT-probe HBM before trusting on v5e
            names = [f"flash_{w}_s{s}" for w in ("out", "lse")
                     for s in lvl_s[:2]]
            if cfg.remat_policy == "flashx":
                names.append(f"attn_out_q{num_frames}_c{mc}")
            pol = jax.checkpoint_policies.save_only_these_names(*names)
        else:
            pol = None
        AttnCls = nn.remat(SpatialVideoTransformer, static_argnums=(3,),
                           policy=pol) \
            if cfg.remat else SpatialVideoTransformer
        ResCls = nn.remat(VideoResBlock, static_argnums=(3,), policy=pol) \
            if cfg.remat else VideoResBlock

        def attn(ch, depth, name):
            heads = ch // cfg.num_head_channels
            return AttnCls(
                heads=heads, dim_head=cfg.num_head_channels, depth=depth,
                context_dim=cfg.context_dim,
                use_spatial_context=cfg.use_spatial_context,
                merge_strategy=cfg.merge_strategy,
                merge_factor=cfg.merge_factor, add_lora=cfg.add_lora,
                fused_temporal=cfg.fused_temporal, name=name, dtype=dt)

        def res(out_ch, name):
            return ResCls(
                out_channels=out_ch,
                video_kernel_size=tuple(cfg.video_kernel_size),
                merge_strategy=cfg.merge_strategy,
                merge_factor=cfg.merge_factor, name=name, dtype=dt,
                quant_convs=cfg.quant_convs)

        # ---- input blocks ------------------------------------------------
        hs = []
        h = nn.Conv(mc, (3, 3), padding="SAME", name="input_conv",
                    dtype=dt)(x)

        if guidance_input is not None:
            g = nn.Conv(mc, (3, 3), padding="SAME", dtype=dt,
                        name="condition_conv_0")(guidance_input)
            g = nn.Conv(mc, (3, 3), padding="SAME", name="condition_conv_1",
                        kernel_init=nn.initializers.zeros, dtype=dt)(g)
            if guidance_scale is None:
                scale = jnp.ones((), h.dtype)
            else:
                scale = jnp.asarray(guidance_scale, h.dtype)
            while scale.ndim < g.ndim:
                scale = scale[..., None]
            h = h + g * scale

        hs.append(h)
        ch = mc
        ds = 1
        block_chans = [mc]
        for level, mult in enumerate(cfg.channel_mult):
            for i in range(cfg.num_res_blocks):
                ch = mult * mc
                h = res(ch, f"in_{level}_{i}_res")(h, emb, num_frames)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, cfg.transformer_depth,
                             f"in_{level}_{i}_attn")(h, context, num_frames)
                hs.append(h)
                block_chans.append(ch)
            if level != len(cfg.channel_mult) - 1:
                ds *= 2
                h = Downsample(ch, name=f"down_{level}", dtype=dt,
                               quant_convs=cfg.quant_convs)(h)
                hs.append(h)
                block_chans.append(ch)

        # ---- middle --------------------------------------------------------
        h = res(None, "mid_res_0")(h, emb, num_frames)
        h = attn(ch, cfg.transformer_depth, "mid_attn")(h, context, num_frames)
        h = res(None, "mid_res_1")(h, emb, num_frames)

        # ---- output blocks ---------------------------------------------------
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                block_chans.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * mc
                h = res(ch, f"out_{level}_{i}_res")(h, emb, num_frames)
                if ds in cfg.attention_resolutions:
                    h = attn(ch, cfg.transformer_depth,
                             f"out_{level}_{i}_attn")(h, context, num_frames)
                if level and i == cfg.num_res_blocks:
                    ds //= 2
                    h = Upsample(ch, name=f"up_{level}", dtype=dt,
                                 quant_convs=cfg.quant_convs)(h)

        h = nn.silu(_norm("out_norm", dt)(h))
        return nn.Conv(cfg.out_channels, (3, 3), padding="SAME", dtype=dt,
                       name="out_conv", kernel_init=nn.initializers.zeros)(h)
