"""Video diffusion engine: the VideoDiffusionModel / DiffusionEngine analog.

Ties UNet + VAE + CLIP + conditioner + denoiser + sampler into the API the
distillation pipeline consumes (sample_condition.py:331-473,
diffusion_condition.py:19-229):

- ``sample(...)``: LiDAR-conditioned 25-frame sampling with CFG batch
  doubling, cond-frame replacement, and optionally the SDS partial-denoise
  initialization from the current 3DGS render;
- ``encode_images`` / ``decode_latents``: scaled first-stage with the
  VideoDecoder temporal context (overlap blending of long clips happens in
  the runner's sliding windows);
- ``training_denoise_fn``: closure for the diffusion fine-tune loss.

Parameters are plain pytrees; every method is jit-compatible.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import diffusion as D
from .clip import CLIPVisual, CLIPVisualConfig, clip_preprocess
from .conditioner import Conditioning, get_conditioning
from .samplers import euler_edm_sample, euler_edm_sample_sds
from .unet import UNetConfig, VideoUNet
from .vae import VAE, VAEConfig


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    clip: CLIPVisualConfig = CLIPVisualConfig()
    num_frames: int = 25
    num_steps: int = 50
    cfg_scale: float = 2.5       # sample_condition.py:122 (CFG 2.5)
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    fps_id: float = 10.0
    motion_bucket_id: float = 127.0
    cond_aug: float = 0.0
    decode_chunk: int = 0     # >0: chunked VAE decode with 3-frame overlap
    low_vram: bool = False    # sample(): offload non-UNet subtrees to host
    # during the denoise loop (the reference's --low_vram submodule
    # offload, sample_condition.py:52-77)
    cfg_sequential: bool = False  # CFG as two T-frame UNet evals instead
    # of one 2T batch: identical math, half the activation working set
    # (see make_cfg_denoise_fn)
    encode_chunk: int = 0     # >0: encoder chunk (else decode_chunk). The
    # encoder needs no temporal context, so this can go below the decode's
    # overlap+1 floor — at 576x1024 the encode of a 25f window at chunk=8
    # was the r5 flagship rehearsal's OOM site (2257M-param engine + GS
    # training state resident; BASELINE.md round-5 rows)

    @staticmethod
    def tiny(num_frames: int = 3, num_steps: int = 4) -> "EngineConfig":
        return EngineConfig(
            unet=UNetConfig.tiny(), vae=VAEConfig.tiny(),
            clip=CLIPVisualConfig.tiny(), num_frames=num_frames,
            num_steps=num_steps)


class VideoDiffusionEngine:
    """Stateless module bundle; params are provided per call."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        # context_dim must match the CLIP output for crossattn
        self.unet = VideoUNet(cfg.unet)
        self.vae = VAE(cfg.vae, video_decoder=True)
        self.clip = CLIPVisual(cfg.clip)

    # -- initialization ------------------------------------------------------
    def init_params(self, key: jax.Array, height: int = 64, width: int = 64
                    ) -> dict[str, Any]:
        ku, kv, kc = jax.random.split(key, 3)
        T = self.cfg.num_frames
        f = 2 ** (len(self.cfg.vae.ch_mult) - 1)
        h, w = height // f, width // f
        zc = self.cfg.vae.z_channels
        x = jnp.zeros((T, h, w, self.cfg.unet.in_channels))
        guide = jnp.zeros((T, h, w, self.cfg.unet.in_channels // 2))
        unet_params = self.unet.init(
            ku, x, jnp.zeros((T,)),
            jnp.zeros((1, 1, self.cfg.unet.context_dim)),
            jnp.zeros((1, self.cfg.unet.adm_in_channels)), num_frames=T,
            cond_mask=jnp.zeros((T,)), guidance_input=guide,
            guidance_scale=jnp.ones((T,)))
        vae_params = self.vae.init(kv, jnp.zeros((1, height, width, 3)),
                                   num_frames=1)
        clip_params = self.clip.init(
            kc, jnp.zeros((1, self.cfg.clip.image_size,
                           self.cfg.clip.image_size, 3)))
        return {"unet": unet_params, "vae": vae_params, "clip": clip_params}

    # -- first stage -----------------------------------------------------------
    def encode_images(self, params, images: jax.Array,
                      key: jax.Array | None = None) -> jax.Array:
        """[N, H, W, 3] in [-1,1] -> scaled latents (sample: train, mode: eval)."""
        return self.vae.apply(params["vae"], images, key,
                              method=VAE.encode)

    def decode_latents(self, params, z: jax.Array,
                       num_frames: Optional[int] = None) -> jax.Array:
        t = num_frames or self.cfg.num_frames
        return self.vae.apply(params["vae"], z, num_frames=t,
                              method=VAE.decode)

    def decode_latents_chunked(self, params, z: jax.Array,
                               chunk: int = 8, overlap: int = 3) -> jax.Array:
        """Memory-bounded decode: overlapping temporal chunks, averaged in
        the overlap region (decode_first_stage, diffusion_condition.py:
        183-214). The VideoDecoder's temporal conv sees chunk+overlap frames
        of context; each chunk is one fixed-shape jitted decode."""
        n = z.shape[0]
        if n <= chunk or overlap >= chunk:
            return self.decode_latents(params, z, num_frames=n)
        res = None
        prev = z[:overlap]
        pos = overlap
        step = chunk - overlap
        while pos < n:
            cur = z[pos: pos + step]
            ctx_z = jnp.concatenate([prev, cur])
            out = self.decode_latents(params, ctx_z,
                                      num_frames=ctx_z.shape[0])
            if res is None:
                res = out
            else:
                # blend on the ACCUMULATED tensor, not the last chunk:
                # with step < overlap (memory-tight chunks, e.g. 4/3 at
                # 576x1024 — r5 flagship) the last appended piece is
                # shorter than the overlap and per-chunk blending breaks
                res = jnp.concatenate([
                    res[:-overlap],
                    (res[-overlap:] + out[:overlap]) / 2.0,
                    out[overlap:]])
            # last `overlap` frames of the PROCESSED stream — cur alone is
            # shorter than the overlap whenever step < overlap
            prev = ctx_z[-overlap:]
            pos += step
        return res

    def encode_images_chunked(self, params, images: jax.Array,
                              chunk: int = 8) -> jax.Array:
        """Per-frame encoder needs no temporal context; plain chunking
        (encode_first_stage, diffusion_condition.py:216-229)."""
        outs = [self.encode_images(params, images[i: i + chunk])
                for i in range(0, images.shape[0], chunk)]
        return jnp.concatenate(outs)

    def clip_embed(self, params, images: jax.Array) -> jax.Array:
        pre = clip_preprocess(images, self.cfg.clip.image_size)
        return self.clip.apply(params["clip"], pre)

    # -- conditioning -----------------------------------------------------------
    def build_conditioning(self, params, cond_frame: jax.Array
                           ) -> tuple[Conditioning, Conditioning]:
        """cond_frame: [1, H, W, 3] in [-1, 1] (frame 0 of the window)."""
        return get_conditioning(
            clip_embed_fn=lambda im: self.clip_embed(params, im),
            vae_encode_fn=lambda im: self.encode_images(params, im),
            cond_frame_without_noise=cond_frame,
            cond_frame=cond_frame,
            num_frames=self.cfg.num_frames,
            fps_id=self.cfg.fps_id,
            motion_bucket_id=self.cfg.motion_bucket_id,
            cond_aug=self.cfg.cond_aug,
            vector_outdim=self.cfg.unet.adm_in_channels // 3)

    # -- denoising -----------------------------------------------------------
    def make_cfg_denoise_fn(
        self,
        params,
        cond: Conditioning,
        uc: Conditioning,
        guidance_latents: jax.Array | None,   # [T, h, w, 4] LiDAR condition
        cond_mask: jax.Array,                 # [T]
        cfg_scale: float | None = None,
    ) -> Callable:
        """CFG batch-doubling denoiser (guiders.py:28-41 + denoiser wrap +
        OpenAIWrapper concat, wrappers.py:25-41). Conditioned half gets
        guidance scale 1, unconditioned half 0
        (sample_condition.py:282-290).

        ``cfg_sequential`` (EngineConfig): run the unconditioned and
        conditioned halves as two T-frame UNet evaluations instead of one
        2T batch — mathematically identical (the temporal blocks group by
        frame chunks of T, norms are per-sample, the halves never
        interact) but HALF the activation working set, for memory-tight
        chips. ~2x dispatch, near-equal device time at flagship shapes
        (the level-0 seq is 9216 either way)."""
        T = self.cfg.num_frames
        scale = self.cfg.cfg_scale if cfg_scale is None else cfg_scale

        def half_fn(c: Conditioning, gscale_val: float):
            g = guidance_latents
            gs = (None if g is None
                  else jnp.full((T,), gscale_val))

            def model_fn(scaled_x, c_noise):
                net_in = jnp.concatenate([scaled_x, c.concat], axis=-1)
                return self.unet.apply(
                    params["unet"], net_in, c_noise, c.crossattn, c.vector,
                    num_frames=T, cond_mask=cond_mask,
                    guidance_input=g, guidance_scale=gs)

            return model_fn

        if self.cfg.cfg_sequential:
            def denoise_fn(x: jax.Array, sigma: jax.Array) -> jax.Array:
                uncond_out = D.denoise(half_fn(uc, 0.0), x, sigma)
                cond_out = D.denoise(half_fn(cond, 1.0), x, sigma)
                return D.vanilla_cfg(uncond_out, cond_out, scale)

            return denoise_fn

        def denoise_fn(x: jax.Array, sigma: jax.Array) -> jax.Array:
            x2 = jnp.concatenate([x, x])
            sig2 = jnp.concatenate([sigma, sigma])
            cm2 = jnp.concatenate([cond_mask, cond_mask])
            concat2 = jnp.concatenate([uc.concat, cond.concat])
            ctx2 = jnp.concatenate([uc.crossattn, cond.crossattn])
            vec2 = jnp.concatenate([uc.vector, cond.vector])
            if guidance_latents is not None:
                g2 = jnp.concatenate([guidance_latents, guidance_latents])
                gs2 = jnp.concatenate(
                    [jnp.zeros((x.shape[0],)), jnp.ones((x.shape[0],))])
            else:
                g2, gs2 = None, None

            def model_fn(scaled_x, c_noise):
                net_in = jnp.concatenate([scaled_x, concat2], axis=-1)
                return self.unet.apply(
                    params["unet"], net_in, c_noise, ctx2, vec2,
                    num_frames=T, cond_mask=cm2,
                    guidance_input=g2, guidance_scale=gs2)

            den = D.denoise(model_fn, x2, sig2)
            uncond_out, cond_out = jnp.split(den, 2)
            return D.vanilla_cfg(uncond_out, cond_out, scale)

        return denoise_fn

    # -- sampling ---------------------------------------------------------------
    def sample(
        self,
        params,
        key: jax.Array,
        guide_images: jax.Array,            # [T, H, W, 3] LiDAR renders [-1,1]
        cond_image: jax.Array,              # [1, H, W, 3] conditioning frame
        render_images: jax.Array | None = None,  # current 3DGS renders (SDS)
        sds_scale: float | None = None,
        cfg_scale: float | None = None,
        num_steps: int | None = None,
        cond_indices: tuple[int, ...] = (0,),
    ) -> jax.Array:
        """Full conditioned sampling of one window. Returns [T, H, W, 3] in
        [-1, 1] (sample_condition.py:418-473). ``cond_image`` holds the
        frames at ``cond_indices`` (interleaved conditioning uses several,
        diffusion_utils.py:137-226); the first one drives the CLIP/concat
        conditioning."""
        cfgc = self.cfg
        T = cfgc.num_frames
        steps = num_steps or cfgc.num_steps

        # memory-bounded encode whenever chunked decode is on (the
        # reference's low_vram chunks BOTH directions, encode_first_stage /
        # decode_first_stage, diffusion_condition.py:183-229): one [T, H, W]
        # encoder pass at 25f 576x1024 OOMs a 16 GB chip mid-distillation
        # (round-4 flagship rehearsal), and the per-frame encoder needs no
        # temporal context so chunking is exact
        enc_chunk = cfgc.encode_chunk or cfgc.decode_chunk
        encode = (functools.partial(self.encode_images_chunked,
                                    chunk=enc_chunk)
                  if enc_chunk else self.encode_images)
        guidance_latents = encode(params, guide_images)
        cond, uc = self.build_conditioning(params, cond_image[:1])
        cond_latent = self.encode_images(params, cond_image)
        cond_frame = jnp.zeros((T,) + cond_latent.shape[1:])
        cond_mask = jnp.zeros((T,))
        for j, idx in enumerate(cond_indices):
            cond_frame = cond_frame.at[idx].set(cond_latent[j])
            cond_mask = cond_mask.at[idx].set(1.0)

        sigmas = D.edm_sigmas(steps, cfgc.sigma_min, cfgc.sigma_max, cfgc.rho)
        noise = jax.random.normal(key, guidance_latents.shape)

        # SDS init latents BEFORE the offload: the encode needs the VAE
        if render_images is not None and sds_scale is not None:
            render_latents = encode(params, render_images)
        else:
            render_latents = None

        # low_vram (the reference's sample_condition.py:52-77 submodule
        # offload, TPU form): the denoise loop reads ONLY params["unet"],
        # and on a 15.75 GB v5e the 50-step CFG eval at 25x72x128 plus the
        # full resident engine (4.5 GB bf16 at 320ch) plus GS training
        # state brushes the ceiling (r5 flagship rehearsal OOMed here).
        # Device-drop every non-UNet subtree for the loop's duration and
        # re-push for the decode; params is mutated IN PLACE so callers
        # holding the same dict (the window loop, EngineParamStore
        # cleanup) stay consistent.
        lv = bool(cfgc.low_vram)
        if lv:
            off = {k: v for k, v in params.items() if k != "unet"}
            host_off = jax.device_get(off)
            for leaf in jax.tree.leaves(off):
                leaf.delete()

        denoise_fn = self.make_cfg_denoise_fn(
            params, cond, uc, guidance_latents, cond_mask, cfg_scale)

        if render_latents is not None:
            z = euler_edm_sample_sds(
                denoise_fn, noise, sigmas, render_latents, sds_scale,
                cond_frame=cond_frame, cond_mask=cond_mask)
        else:
            z = euler_edm_sample(denoise_fn, noise, sigmas,
                                 cond_frame=cond_frame, cond_mask=cond_mask)
        if lv:
            z = jax.block_until_ready(z)   # loop done before re-pushing
            for k, v in jax.device_put(host_off).items():
                params[k] = v

        if cfgc.decode_chunk:
            frames = self.decode_latents_chunked(params, z,
                                                 chunk=cfgc.decode_chunk)
        else:
            frames = self.decode_latents(params, z, num_frames=T)
        return jnp.clip(frames, -1.0, 1.0)

    # -- training ---------------------------------------------------------------
    def training_denoise_fn(self, params, cond: Conditioning,
                            guidance_latents: jax.Array | None,
                            guidance_scale: jax.Array | None) -> Callable:
        """(noised, sigma, cond_mask) -> D(x) for loss.diffusion_loss."""
        T = self.cfg.num_frames

        def fn(noised, sigma, cond_mask):
            def model_fn(scaled_x, c_noise):
                net_in = jnp.concatenate([scaled_x, cond.concat], axis=-1)
                return self.unet.apply(
                    params["unet"], net_in, c_noise, cond.crossattn,
                    cond.vector, num_frames=T, cond_mask=cond_mask,
                    guidance_input=guidance_latents,
                    guidance_scale=guidance_scale)
            return D.denoise(model_fn, noised, sigma)

        return fn
