"""Parity vs the reference's ACTUAL code (loaded from /root/reference).

Round-2 VERDICT #1: the converter/numerics tests compared against
self-authored torch mirrors, which cannot catch a shared misreading of the
architecture. These tests import the reference's own modules (via
tests/torch_ref/reference_loader.py, CPU + SDP-fallback attention) and check:

  (a) VideoUNet tiny-config forward — incl. cond_mask time-embedding mixing
      and the condition_input_blocks guidance injection
      (vwm/modules/diffusionmodules/video_model.py:457-535);
  (b) VAE Encoder + VideoDecoder (model.py:445-694, temporal_ae.py:75-151);
  (c) EDM denoiser / scaling / discretizer / guiders
      (denoiser.py, denoiser_scaling.py, discretizer.py, guiders.py);
  (d) full Euler-EDM + SDS sampling loops vs a shared toy denoiser
      (sampling.py:94-126, 167-217);
  (e) StandardDiffusionLoss.get_loss incl. temporal-diff re-weighting and
      the fourier high-frequency term (loss.py:104-148, util.py:20-43);
  (f) GS-side math goldens: SH eval / IDFT, SSIM/PSNR/L1, camera matrices,
      quaternion algebra + slerp (street_gaussian/utils/*);
  (g) lane-shift novel-view camera generation — shift direction,
      LANE_SHIFT_SIGN, ego-pose shift, w2c inversion, actor-proximity skip
      (novel_view_utils.py:30-122 run with its heavy imports stubbed).

The self-authored mirrors remain only for surfaces the reference cannot run
in this environment (the open_clip tower, LPIPS VGG weights).

First finding of this oracle: the round-2 fourier_filter used a 9x9 DC box;
the reference uses a normalized radial disk (2h/H-1)^2+(2w/W-1)^2 <= 2*d_s
(util.py:30-34). Fixed in models/vdm/loss.py.
"""

import contextlib
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_ref import reference_loader as refload

pytestmark = pytest.mark.filterwarnings("ignore")


def rel_err(a, b):
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def randomize_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    return model


@contextlib.contextmanager
def cuda_tensors_on_cpu():
    """Route .to('cuda') to CPU (fourier_filter hardcodes a cuda mask,
    util.py:28)."""
    orig = torch.Tensor.to

    def patched(self, *args, **kwargs):
        args = tuple(
            "cpu" if (a == "cuda" or
                      (isinstance(a, torch.device) and a.type == "cuda"))
            else a for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig(self, *args, **kwargs)

    torch.Tensor.to = patched
    try:
        yield
    finally:
        torch.Tensor.to = orig


# ===================================================================== UNet


def _real_unet(**over):
    vm = refload.load_vwm("vwm.modules.diffusionmodules.video_model")
    kw = dict(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=2,
        attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=48, adm_in_channels=24,
        num_classes="sequential", use_linear_in_transformer=True,
        extra_ff_mix_layer=True, use_spatial_context=True,
        merge_strategy="learned_with_images", video_kernel_size=[3, 1, 1],
        spatial_transformer_attn_type="softmax")
    kw.update(over)
    return vm.VideoUNet(**kw)


def test_unet_forward_vs_reference():
    """Real VideoUNet forward (B=2 videos x T=2 frames — catches
    tile-vs-interleave bugs in context/y broadcast and the temporal
    reshape) with cond_mask mixing + guidance injection."""
    from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
    from street_crafter_tpu.models.vdm.weights import convert_torch_state_dict

    real = randomize_(_real_unet(), seed=3)
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in real.state_dict().items()}

    cfg = UNetConfig.tiny()
    unet = VideoUNet(cfg)
    B, T, H, W = 2, 2, 8, 8
    N = B * T
    rng = np.random.default_rng(2)
    x = rng.normal(size=(N, H, W, 8)).astype(np.float32)
    ts = np.array([3.7, 3.7, 1.2, 1.2], np.float32)
    ctx = rng.normal(size=(B, 2, 48)).astype(np.float32)
    y = rng.normal(size=(B, 24)).astype(np.float32)
    cm = np.array([1.0, 0.0, 1.0, 0.0], np.float32)
    gin = rng.normal(size=(N, H, W, 4)).astype(np.float32)
    gs = np.array([1.0, 0.7, 0.3, 0.0], np.float32)

    params = unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y),
                       num_frames=T, cond_mask=jnp.asarray(cm),
                       guidance_input=jnp.asarray(gin),
                       guidance_scale=jnp.asarray(gs))
    new_params, unmatched = convert_torch_state_dict(sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    with torch.no_grad():
        # perturb the zero-init 2nd condition conv so injection is active
        real.condition_input_blocks[1][0].weight.add_(0.05)
        sd2 = {f"model.diffusion_model.{k}": v.numpy()
               for k, v in real.state_dict().items()}
        t_out = real(
            nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx),
            torch.from_numpy(y), num_frames=T,
            cond_mask=torch.from_numpy(cm),
            guidance={"input": nchw(gin),
                      "scale": torch.from_numpy(gs)}).numpy()
    new_params, unmatched = convert_torch_state_dict(sd2, cfg, params)
    assert unmatched == []
    j_out = np.asarray(unet.apply(
        new_params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx),
        jnp.asarray(y), num_frames=T, cond_mask=jnp.asarray(cm),
        guidance_input=jnp.asarray(gin), guidance_scale=jnp.asarray(gs)))
    assert rel_err(j_out, np.moveaxis(t_out, 1, -1)) < 3e-4


def test_unet_no_cond_mask_vs_reference():
    """cond_mask=None path: reference uses time_embed only
    (video_model.py:473-478)."""
    from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
    from street_crafter_tpu.models.vdm.weights import convert_torch_state_dict

    real = randomize_(_real_unet(), seed=7)
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in real.state_dict().items()}
    cfg = UNetConfig.tiny()
    unet = VideoUNet(cfg)
    T, H, W = 2, 8, 8
    rng = np.random.default_rng(5)
    x = rng.normal(size=(T, H, W, 8)).astype(np.float32)
    ts = np.array([0.5, 0.5], np.float32)
    ctx = rng.normal(size=(1, 2, 48)).astype(np.float32)
    y = rng.normal(size=(1, 24)).astype(np.float32)

    # init WITH guidance so the condition-conv params exist for conversion;
    # the compared forward below runs without guidance
    params = unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y),
                       num_frames=T,
                       guidance_input=jnp.zeros((T, H, W, 4)),
                       guidance_scale=jnp.zeros((T,)))
    new_params, unmatched = convert_torch_state_dict(sd, cfg, params)
    assert unmatched == []
    with torch.no_grad():
        t_out = real(nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx),
                     torch.from_numpy(y), num_frames=T).numpy()
    j_out = np.asarray(unet.apply(new_params, jnp.asarray(x),
                                  jnp.asarray(ts), jnp.asarray(ctx),
                                  jnp.asarray(y), num_frames=T))
    assert rel_err(j_out, np.moveaxis(t_out, 1, -1)) < 3e-4


def test_unet_int8_vs_reference():
    """W8A8 quant_convs eval path vs the reference's f32 forward (VERDICT
    r2 #2): the int8 path must stay within a few percent of the REAL
    architecture's output — not merely of our own f32 model — on converted
    reference weights. Also records the f32 path's error for scale."""
    import dataclasses

    from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
    from street_crafter_tpu.models.vdm.weights import convert_torch_state_dict

    real = randomize_(_real_unet(), seed=11)
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in real.state_dict().items()}
    cfg = UNetConfig.tiny()
    T, H, W = 2, 8, 8
    rng = np.random.default_rng(9)
    x = rng.normal(size=(T, H, W, 8)).astype(np.float32)
    ts = np.array([0.5, 0.5], np.float32)
    ctx = rng.normal(size=(1, 2, 48)).astype(np.float32)
    y = rng.normal(size=(1, 24)).astype(np.float32)

    unet = VideoUNet(cfg)
    params = unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y),
                       num_frames=T,
                       guidance_input=jnp.zeros((T, H, W, 4)),
                       guidance_scale=jnp.zeros((T,)))
    new_params, unmatched = convert_torch_state_dict(sd, cfg, params)
    assert unmatched == []
    with torch.no_grad():
        t_out = np.moveaxis(
            real(nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx),
                 torch.from_numpy(y), num_frames=T).numpy(), 1, -1)

    def run(**over):
        m = VideoUNet(dataclasses.replace(cfg, **over))
        return np.asarray(m.apply(
            new_params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx),
            jnp.asarray(y), num_frames=T).astype(jnp.float32))

    e_f32 = rel_err(run(), t_out)
    e_int8 = rel_err(run(quant_convs=True), t_out)
    assert e_f32 < 3e-4, e_f32
    assert e_int8 < 0.03, (e_int8, e_f32)


# ====================================================================== VAE


def test_vae_vs_reference():
    """Real SD-VAE Encoder + temporal VideoDecoder (ch=32 — the reference
    hardcodes GroupNorm(32), model.py:52)."""
    from street_crafter_tpu.models.vdm.convert import convert_vae_state_dict
    from street_crafter_tpu.models.vdm.vae import VAE, VAEConfig

    mdl = refload.load_vwm("vwm.modules.diffusionmodules.model")
    tae = refload.load_vwm("vwm.modules.autoencoding.temporal_ae")
    import torch.nn as nn

    class RealVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = mdl.Encoder(
                attn_type="vanilla", double_z=True, z_channels=4,
                resolution=64, in_channels=3, out_ch=3, ch=32,
                ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                dropout=0.0)
            self.decoder = tae.VideoDecoder(
                attn_type="vanilla", double_z=True, z_channels=4,
                resolution=64, in_channels=3, out_ch=3, ch=32,
                ch_mult=[1, 2], num_res_blocks=1, attn_resolutions=[],
                dropout=0.0, video_kernel_size=[3, 1, 1])

    real = randomize_(RealVAE(), seed=11)
    sd = {f"first_stage_model.{k}": v.numpy()
          for k, v in real.state_dict().items()}

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    vae = VAE(cfg, video_decoder=True)
    T = 2
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((T, 16, 16, 3)),
                      num_frames=T)
    new_params, unmatched = convert_vae_state_dict(sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(T, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_mom = real.encoder(nchw(x)).numpy()
    j_mom = np.asarray(vae.apply(new_params, jnp.asarray(x),
                                 method=lambda m, v: m.encoder(v)))
    assert rel_err(j_mom, np.moveaxis(t_mom, 1, -1)) < 3e-4

    z = rng.normal(size=(T, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        t_dec = real.decoder(nchw(z), timesteps=T).numpy()
    j_dec = np.asarray(vae.apply(
        new_params, jnp.asarray(z), T,
        method=lambda m, v, nf: m.decoder(v, num_frames=nf)))
    assert rel_err(j_dec, np.moveaxis(t_dec, 1, -1)) < 1e-3


# ============================================================ EDM machinery


def test_scaling_and_discretizer_vs_reference():
    from street_crafter_tpu.models.vdm import diffusion as D

    dsc = refload.load_vwm("vwm.modules.diffusionmodules.denoiser_scaling")
    disc = refload.load_vwm("vwm.modules.diffusionmodules.discretizer")

    sig = torch.tensor([0.002, 0.1, 1.0, 20.0, 700.0])
    c_skip, c_out, c_in, c_noise = dsc.VScalingWithEDMcNoise()(sig)
    mine = D.v_scaling_edm_cnoise(jnp.asarray(sig.numpy()))
    np.testing.assert_allclose(np.asarray(mine.c_skip), c_skip.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.c_out), c_out.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.c_in), c_in.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.c_noise), c_noise.numpy(),
                               rtol=1e-6)

    ref_sig = disc.EDMDiscretization(sigma_max=700.0)(
        50, do_append_zero=True).numpy()
    np.testing.assert_allclose(np.asarray(D.edm_sigmas(50)), ref_sig,
                               rtol=1e-5)


def test_denoiser_wiring_vs_reference():
    """Full Denoiser forward with a shared toy network: checks the
    c_in/c_out/c_skip/c_noise plumbing (denoiser.py:22-35)."""
    from street_crafter_tpu.models.vdm import diffusion as D

    den = refload.load_vwm("vwm.modules.diffusionmodules.denoiser")
    import torch.nn as nn

    class ToyNet(nn.Module):
        def forward(self, x, c_noise, cond, cond_mask, num_frames):
            return torch.sin(x) * 0.5 + c_noise.reshape(
                -1, *([1] * (x.ndim - 1))) * 0.01

    denoiser = den.Denoiser(
        {"target": "vwm.modules.diffusionmodules.denoiser_scaling."
                   "VScalingWithEDMcNoise"}, num_frames=2)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 6, 6, 3)).astype(np.float32)
    sig = np.array([0.4, 0.4, 3.0, 3.0], np.float32)
    with torch.no_grad():
        t_out = denoiser(ToyNet(), nchw(x), torch.from_numpy(sig),
                         {}, None).numpy()

    def model_fn(xs, c_noise):
        return jnp.sin(xs) * 0.5 + D.append_dims(c_noise, xs.ndim) * 0.01

    j_out = np.asarray(D.denoise(model_fn, jnp.asarray(x),
                                 jnp.asarray(sig)))
    assert rel_err(j_out, np.moveaxis(t_out, 1, -1)) < 1e-5


def test_guiders_vs_reference():
    from street_crafter_tpu.models.vdm import diffusion as D

    gmod = refload.load_vwm("vwm.modules.diffusionmodules.guiders")
    T = 25
    rng = np.random.default_rng(4)
    xu = rng.normal(size=(T, 4, 4, 2)).astype(np.float32)
    xc = rng.normal(size=(T, 4, 4, 2)).astype(np.float32)
    both = torch.cat([nchw(xu), nchw(xc)], 0)

    ref = gmod.VanillaCFG(scale=2.5)(both, None).numpy()
    mine = np.asarray(D.vanilla_cfg(jnp.asarray(xu), jnp.asarray(xc), 2.5))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-6

    ref = gmod.LinearPredictionGuider(
        num_frames=T, max_scale=2.5, min_scale=1.0)(both, None).numpy()
    mine = np.asarray(D.linear_cfg(jnp.asarray(xu), jnp.asarray(xc),
                                   max_scale=2.5, min_scale=1.0,
                                   num_frames=T))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-6

    ref = gmod.TrianglePredictionGuider(
        num_frames=T, max_scale=2.5, min_scale=1.0)(both, None).numpy()
    mine = np.asarray(D.triangle_cfg(jnp.asarray(xu), jnp.asarray(xc),
                                     max_scale=2.5, min_scale=1.0,
                                     num_frames=T))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-6


# ================================================================= samplers


def _toy_denoisers(T):
    """A toy conditioned denoiser implemented on both sides.

    torch side matches the reference call contract denoiser(x, s, c, cm)
    where c = {"vector": [N]} distinguishes cond (1) from uncond (0)."""
    def torch_denoiser(x, s, c, cond_mask):
        v = c["vector"].reshape(-1, *([1] * (x.ndim - 1)))
        s = s.reshape(-1, *([1] * (x.ndim - 1)))
        return x / (1.0 + s ** 2) * 0.9 + v * 0.1

    def jax_branch(x, s, v):
        from street_crafter_tpu.models.vdm.diffusion import append_dims
        sb = append_dims(s, x.ndim)
        return x / (1.0 + sb ** 2) * 0.9 + v * 0.1

    return torch_denoiser, jax_branch


def test_euler_edm_sampler_vs_reference():
    from street_crafter_tpu.models.vdm import diffusion as D
    from street_crafter_tpu.models.vdm import samplers as S

    smp = refload.load_vwm("vwm.modules.diffusionmodules.sampling")
    T, steps, cfg_scale = 5, 8, 2.0
    torch_den, jax_branch = _toy_denoisers(T)

    sampler = smp.EulerEDMSampler(
        discretization_config={
            "target": "vwm.modules.diffusionmodules.discretizer."
                      "EDMDiscretization",
            "params": {"sigma_max": 700.0}},
        guider_config={
            "target": "vwm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": cfg_scale}},
        num_steps=steps, device="cpu")

    rng = np.random.default_rng(6)
    noise = rng.normal(size=(T, 6, 6, 4)).astype(np.float32)
    cond_frame = rng.normal(size=(T, 6, 6, 4)).astype(np.float32)
    cm = np.array([1, 0, 0, 0, 0], np.float32)
    c = {"vector": torch.ones(T)}
    uc = {"vector": torch.zeros(T)}
    with torch.no_grad():
        ref = sampler(torch_den, nchw(noise).clone(), c, uc=uc,
                      cond_frame=nchw(cond_frame),
                      cond_mask=torch.from_numpy(cm)).numpy()

    sigmas = D.edm_sigmas(steps)

    def denoise_fn(x, svec):
        return D.vanilla_cfg(jax_branch(x, svec, 0.0),
                             jax_branch(x, svec, 1.0), cfg_scale)

    mine = np.asarray(S.euler_edm_sample(
        denoise_fn, jnp.asarray(noise), sigmas,
        cond_frame=jnp.asarray(cond_frame), cond_mask=jnp.asarray(cm)))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-4


def test_euler_edm_sds_sampler_vs_reference():
    """Partial-denoise SDS loop: start_step = steps*(1-scale), x initialized
    as render_latents + sigma_start * noise (sampling.py:180-194)."""
    from street_crafter_tpu.models.vdm import diffusion as D
    from street_crafter_tpu.models.vdm import samplers as S

    smp = refload.load_vwm("vwm.modules.diffusionmodules.sampling")
    T, steps, cfg_scale, sds_scale = 5, 10, 2.0, 0.4
    torch_den, jax_branch = _toy_denoisers(T)

    sampler = smp.EulerEDMSamplerSDS(
        discretization_config={
            "target": "vwm.modules.diffusionmodules.discretizer."
                      "EDMDiscretization",
            "params": {"sigma_max": 700.0}},
        guider_config={
            "target": "vwm.modules.diffusionmodules.guiders.VanillaCFG",
            "params": {"scale": cfg_scale}},
        num_steps=steps, device="cpu")

    rng = np.random.default_rng(8)
    noise = rng.normal(size=(T, 6, 6, 4)).astype(np.float32)
    render = rng.normal(size=(T, 6, 6, 4)).astype(np.float32)
    cond_frame = rng.normal(size=(T, 6, 6, 4)).astype(np.float32)
    cm = np.array([1, 0, 0, 0, 0], np.float32)
    sg = {"input": nchw(render)}
    c = {"vector": torch.ones(T), "sample_guidance": sg}
    uc = {"vector": torch.zeros(T), "sample_guidance": sg}
    with torch.no_grad():
        ref = sampler(torch_den, nchw(noise).clone(), c, uc=uc,
                      cond_frame=nchw(cond_frame),
                      cond_mask=torch.from_numpy(cm),
                      scale=sds_scale).numpy()

    sigmas = D.edm_sigmas(steps)

    def denoise_fn(x, svec):
        return D.vanilla_cfg(jax_branch(x, svec, 0.0),
                             jax_branch(x, svec, 1.0), cfg_scale)

    mine = np.asarray(S.euler_edm_sample_sds(
        denoise_fn, jnp.asarray(noise), sigmas,
        render_latents=jnp.asarray(render), scale=sds_scale,
        cond_frame=jnp.asarray(cond_frame), cond_mask=jnp.asarray(cm)))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-4


# ===================================================================== loss


def test_fourier_filter_vs_reference():
    from street_crafter_tpu.models.vdm.loss import fourier_filter

    util = refload.load_vwm("vwm.modules.diffusionmodules.util")
    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    with cuda_tensors_on_cpu(), torch.no_grad():
        ref = util.fourier_filter(nchw(x), scale=0.0).numpy()
    mine = np.asarray(fourier_filter(jnp.asarray(x), scale=0.0))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-4

    with cuda_tensors_on_cpu(), torch.no_grad():
        ref = util.fourier_filter(nchw(x), scale=0.3).numpy()
    mine = np.asarray(fourier_filter(jnp.asarray(x), scale=0.3))
    assert rel_err(mine, np.moveaxis(ref, 1, -1)) < 1e-4


def test_diffusion_loss_core_vs_reference():
    """Deterministic loss core given fixed (noise, sigma, cond_mask):
    noising, cond-frame sigma zeroing, V-weighting, prediction replacement,
    temporal-diff re-weighting + HF term (loss.py:63-148) — randomness is
    injected identically on both sides via a shared toy denoiser and fixed
    arrays, so this compares everything downstream of the RNG draws."""
    from street_crafter_tpu.models.vdm import diffusion as D
    from street_crafter_tpu.models.vdm.loss import (diffusion_loss,
                                                    fourier_filter)

    lmod = refload.load_vwm("vwm.modules.diffusionmodules.loss")
    den = refload.load_vwm("vwm.modules.diffusionmodules.denoiser")
    import torch.nn as nn

    B, T, H, W, C = 2, 3, 8, 8, 4
    N = B * T
    rng = np.random.default_rng(10)
    latents = rng.normal(size=(N, H, W, C)).astype(np.float32)
    noise = rng.normal(size=(N, H, W, C)).astype(np.float32)
    sigmas = np.repeat(np.exp(1.0 + 1.6 * rng.normal(size=(B,))
                              ).astype(np.float32), T)
    cond_mask = np.tile(np.array([1, 0, 0], np.float32), B)

    class ToyNet(nn.Module):
        def forward(self, x, c_noise, cond, cm, num_frames):
            return torch.tanh(x) * 0.7

    loss_obj = lmod.StandardDiffusionLoss(
        sigma_sampler_config={
            "target": "vwm.modules.diffusionmodules.sigma_sampling."
                      "EDMSampling",
            "params": {"p_mean": 1.0, "p_std": 1.6, "num_frames": T}},
        loss_weighting_config={
            "target": "vwm.modules.diffusionmodules.loss_weighting."
                      "VWeighting"},
        use_additional_loss=True, offset_noise_level=0.0,
        additional_loss_weight=0.1, num_frames=T,
        replace_cond_frames=True, cond_frames_choices=[[], [0]])

    # reference _forward with the randomness pinned: run its exact math
    # manually (loss.py:63-105), then its real get_loss
    denoiser = den.Denoiser(
        {"target": "vwm.modules.diffusionmodules.denoiser_scaling."
                   "VScalingWithEDMcNoise"}, num_frames=T)
    tl = nchw(latents)
    tn = nchw(noise)
    tsig = torch.from_numpy(sigmas)
    tcm = torch.from_numpy(cond_mask)
    sig_bc = ((1 - tcm) * tsig).reshape(-1, 1, 1, 1)
    noised = tl + tn * sig_bc
    with torch.no_grad():
        model_out = denoiser(ToyNet(), noised, tsig, {}, tcm)
        w = (1.0 + 1.0 / tsig ** 2).reshape(-1, 1, 1, 1)
        predict = (model_out * (1 - tcm).reshape(-1, 1, 1, 1)
                   + tl * tcm.reshape(-1, 1, 1, 1))
        with cuda_tensors_on_cpu():
            ref_loss = float(loss_obj.get_loss(predict, tl, w).mean())

    # my side: same math through diffusion.denoise + the loss internals
    jl = jnp.asarray(latents)
    jn = jnp.asarray(noise)
    jsig = jnp.asarray(sigmas)
    jcm = jnp.asarray(cond_mask)
    sig_bc = D.append_dims((1 - jcm) * jsig, jl.ndim)
    jnoised = jl + jn * sig_bc

    def model_fn(xs, c_noise):
        return jnp.tanh(xs) * 0.7

    j_out = D.denoise(model_fn, jnoised, jsig)
    cm_bc = D.append_dims(jcm, jl.ndim)
    j_pred = j_out * (1 - cm_bc) + jl * cm_bc
    jw = D.append_dims(D.v_weighting(jsig), jl.ndim)

    # replicate my loss tail exactly as diffusion_loss does
    pr = j_pred.reshape(B, T, H, W, C)
    ta = jl.reshape(B, T, H, W, C)
    aux = ((ta[:, 1:] - ta[:, :-1]) - (pr[:, 1:] - pr[:, :-1])) ** 2
    flat = aux.reshape(B, -1, C)
    norm = jnp.sqrt(jnp.sum(flat ** 2, axis=(1,), keepdims=True)) + 1e-12
    aux_w = (flat / norm).reshape(aux.shape)
    aux_w = 1.0 + jnp.concatenate(
        [jnp.zeros_like(aux_w[:, :1]), aux_w], axis=1)
    aux_w = aux_w.reshape(N, -1)
    per_sample = (jw * (j_pred - jl) ** 2).reshape(N, -1) * aux_w
    hf = jnp.mean((jw * (fourier_filter(j_pred) - fourier_filter(jl)) ** 2)
                  .reshape(N, -1), axis=1).mean()
    my_loss = float(per_sample.mean(axis=1).mean() + 0.1 * hf)

    assert abs(my_loss - ref_loss) / (abs(ref_loss) + 1e-12) < 1e-4


def test_sigma_sampling_structure_vs_reference():
    """EDMSampling shares one sigma per video via interleaved repeat
    (sigma_sampling.py:13-19); verify the reference's repeat layout and
    that mine matches it."""
    from street_crafter_tpu.models.vdm.diffusion import edm_sigma_sample

    ss = refload.load_vwm("vwm.modules.diffusionmodules.sigma_sampling")
    T = 4
    samp = ss.EDMSampling(p_mean=1.0, p_std=1.6, num_frames=T)
    torch.manual_seed(42)
    ref = samp(8).numpy()
    # reference: one sigma per video, repeated interleaved over its frames
    assert np.allclose(ref.reshape(2, T), ref.reshape(2, T)[:, :1])
    # and the per-video values equal exp(p_mean + p_std * z) for the drawn z
    torch.manual_seed(42)
    z = torch.randn((2,)).numpy()
    assert np.allclose(ref.reshape(2, T)[:, 0], np.exp(1.0 + 1.6 * z),
                       rtol=1e-6)

    mine = np.asarray(edm_sigma_sample(jax.random.PRNGKey(0), (8,),
                                       num_frames=T))
    assert np.allclose(mine.reshape(2, T), mine.reshape(2, T)[:, :1])


# ============================================================== GS goldens


def test_sh_eval_vs_reference():
    sh_ref = refload.load_street_gaussian_util("sh_utils")
    from street_crafter_tpu.ops import sh as sh_mine

    rng = np.random.default_rng(12)
    N, C = 64, 3
    for deg in range(4):
        k = (deg + 1) ** 2
        coeffs = rng.normal(size=(N, C, 16)).astype(np.float32)
        dirs = rng.normal(size=(N, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ref = sh_ref.eval_sh(deg, torch.from_numpy(coeffs),
                             torch.from_numpy(dirs)).numpy()
        mine = np.asarray(sh_mine.eval_sh(deg, jnp.asarray(coeffs),
                                          jnp.asarray(dirs)))
        np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=1e-6)

    x = rng.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sh_mine.rgb_to_sh(jnp.asarray(x))),
        sh_ref.RGB2SH(torch.from_numpy(x)).numpy(), rtol=1e-6)

    t = np.array([0.0, 0.25, 0.8], np.float32)
    ref = sh_ref.IDFT(torch.from_numpy(t), 5).numpy()
    mine = np.asarray(sh_mine.idft_basis(jnp.asarray(t), 5))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def test_ssim_psnr_l1_vs_reference():
    lu = refload.load_street_gaussian_util("loss_utils")
    from street_crafter_tpu.ops import ssim as mine

    rng = np.random.default_rng(13)
    a = rng.uniform(size=(3, 32, 32)).astype(np.float32)   # torch CHW
    b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.1, 0, 1)

    ref_ssim = float(lu.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    j_ssim = float(mine.ssim(jnp.asarray(np.moveaxis(a, 0, -1)),
                             jnp.asarray(np.moveaxis(b, 0, -1))))
    assert abs(ref_ssim - j_ssim) < 2e-4

    ref_psnr = float(lu.psnr(torch.from_numpy(a), torch.from_numpy(b)))
    j_psnr = float(mine.psnr(jnp.asarray(np.moveaxis(a, 0, -1)),
                             jnp.asarray(np.moveaxis(b, 0, -1))))
    assert abs(ref_psnr - j_psnr) < 1e-3

    ref_l1 = float(lu.l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    j_l1 = float(mine.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ref_l1 - j_l1) < 1e-6


def test_camera_matrices_vs_reference():
    gu = refload.load_street_gaussian_util("graphics_utils")
    from street_crafter_tpu.ops import maths

    rng = np.random.default_rng(14)
    # random orthonormal R (c2w rotation as INRIA stores it), w2c t
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.normal(size=3)
    ref_w2v = gu.getWorld2View2(R, t)
    mine_w2v = np.asarray(maths.world_to_view(
        jnp.asarray(R.T.astype(np.float32)), jnp.asarray(t.astype(np.float32))))
    np.testing.assert_allclose(mine_w2v, ref_w2v, rtol=1e-5, atol=1e-5)

    K = np.array([[888.0, 1.5, 480.0], [0, 890.0, 320.0], [0, 0, 1]],
                 np.float32)
    ref_P = gu.getProjectionMatrixK(torch.from_numpy(K), 640, 960,
                                    0.01, 100.0).numpy()
    mine_P = np.asarray(maths.projection_from_K(jnp.asarray(K), 640, 960,
                                                0.01, 100.0))
    np.testing.assert_allclose(mine_P, ref_P, rtol=1e-5, atol=1e-6)


def test_quaternion_algebra_vs_reference():
    ge = refload.load_street_gaussian_util("general_utils")
    from street_crafter_tpu.ops import quaternion as Q

    rng = np.random.default_rng(15)
    a = rng.normal(size=(8, 4)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = rng.normal(size=(8, 4)).astype(np.float32)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)

    ref_m = ge.quaternion_to_matrix(torch.from_numpy(a)).numpy()
    mine_m = np.asarray(Q.to_matrix(jnp.asarray(a)))
    np.testing.assert_allclose(mine_m, ref_m, rtol=1e-5, atol=1e-6)

    # round-trip through matrix_to_quaternion (sign-ambiguous: compare
    # rotations, not raw quats)
    ref_q = ge.matrix_to_quaternion(torch.from_numpy(ref_m))
    ref_rt = ge.quaternion_to_matrix(ref_q).numpy()
    mine_q = Q.from_matrix(jnp.asarray(ref_m))
    mine_rt = np.asarray(Q.to_matrix(mine_q))
    np.testing.assert_allclose(mine_rt, ref_rt, rtol=1e-4, atol=1e-5)

    ref_mul = ge.quaternion_raw_multiply(torch.from_numpy(a),
                                         torch.from_numpy(b)).numpy()
    mine_mul = np.asarray(Q.multiply(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(mine_mul, ref_mul, rtol=1e-5, atol=1e-6)

    ref_inv = ge.quaternion_invert(torch.from_numpy(a)).numpy()
    mine_inv = np.asarray(Q.invert(jnp.asarray(a)))
    np.testing.assert_allclose(mine_inv, ref_inv, rtol=1e-5, atol=1e-6)


def test_quaternion_slerp_vs_reference():
    """quaternion_slerp wraps roma's xyzw slerp in wxyz conventions
    (general_utils.py:306-324); the loader stubs roma with textbook slerp,
    so this verifies the convention plumbing + endpoint behavior."""
    ge = refload.load_street_gaussian_util("general_utils")
    from street_crafter_tpu.ops import quaternion as Q

    rng = np.random.default_rng(16)
    q0 = rng.normal(size=4).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    q1 = rng.normal(size=4).astype(np.float32)
    q1 /= np.linalg.norm(q1)
    for step in (0.0, 0.3, 0.5, 1.0):
        ref = ge.quaternion_slerp(torch.from_numpy(q0),
                                  torch.from_numpy(q1), step).numpy()
        mine = np.asarray(Q.slerp(jnp.asarray(q0), jnp.asarray(q1), step))
        # sign-ambiguous
        err = min(np.abs(mine - ref).max(), np.abs(mine + ref).max())
        assert err < 1e-4, (step, mine, ref)


def test_novel_view_cameras_vs_reference():
    """Lane-shift novel-view trajectory generation vs the reference's
    ACTUAL waymo_novel_view_cameras (novel_view_utils.py:30-122): shift
    direction + LANE_SHIFT_SIGN, ego-pose translation, c2w -> (R, T)
    inversion, actor-proximity skip flag."""
    import types

    cfg_obj = types.SimpleNamespace(
        source_path="/tmp/nv_parity/016",
        mode="train",
        render=types.SimpleNamespace(novel_view=types.SimpleNamespace(
            shift=[2.0, -3.0], rotate=0.0,
            train_actor_distance_thresh=1.5)))
    nvu = refload.load_novel_view_utils(cfg_obj)
    from street_gaussian.datasets.base_readers import CameraInfo as RefCI

    from street_crafter_tpu.datasets.readers import CameraInfo as MyCI
    from street_crafter_tpu.datasets.waymo import (ObjectInfo,
                                                   waymo_novel_view_cameras)

    rng = np.random.default_rng(21)
    F = 4
    # smooth ego trajectory with curvature + yaw
    ego = np.tile(np.eye(4), (F, 1, 1))
    for f in range(F):
        th = 0.1 * f
        ego[f, :3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        ego[f, :3, 3] = [3.0 * f, 0.4 * f * f, 0.02 * f]
    ext = np.eye(4)
    ext[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    ext[:3, 3] = [1.5, 0.1, 2.0]
    K = np.array([[800.0, 0, 480], [0, 800.0, 320], [0, 0, 1]])

    # two actors: one right in front of the shifted cameras (skip), one far
    tracklets = np.zeros((1, F, 2, 4), np.float32)
    tracklets[0, :, 0, :3] = ego[:, :3, 3] + np.array([1.0, 0.5, 0.0])
    tracklets[0, :2, 0, 3] = 1.0   # near actor valid only in frames 0-1
    tracklets[0, 2:, 0, 3] = -1.0  # -> later frames consult the far actor
    tracklets[0, :, 1, :3] = [500.0, 500.0, 0.0]
    tracklets[0, :, 1, 3] = 1.0

    def w2c_of(f):
        return np.linalg.inv(ego[f] @ ext)

    ref_cams, my_cams = [], []
    for f in range(F):
        w2c = w2c_of(f)
        meta = {"cam": 0, "frame": f, "frame_idx": f,
                "ego_pose": ego[f].copy(), "extrinsic": ext.copy()}
        ref_cams.append(RefCI(
            uid=f, R=w2c[:3, :3].T, T=w2c[:3, 3], FovY=0.6, FovX=0.9, K=K,
            image=None, image_path="", image_name=f"{f:06d}_0",
            width=960, height=640, metadata=dict(meta), guidance={}))
        my_cams.append(MyCI(
            uid=f, R=w2c[:3, :3].T, T=w2c[:3, 3], K=K, width=960,
            height=640, image_name=f"{f:06d}_0", metadata=dict(meta)))

    obj = ObjectInfo(id=0, object_id=0, track_id="t0", klass="vehicle",
                     class_label=0, height=1.5, width=1.8, length=4.0,
                     deformable=False, start_frame=0, end_frame=3)
    obj_far = ObjectInfo(id=1, object_id=1, track_id="t1", klass="vehicle",
                         class_label=0, height=1.5, width=1.8, length=4.0,
                         deformable=False, start_frame=0, end_frame=3)
    ref_obj_info = {100: {"id": 0}, 101: {"id": 1}}

    ref_out = nvu.waymo_novel_view_cameras(ref_cams, ego, ref_obj_info,
                                           tracklets)
    my_out = waymo_novel_view_cameras(
        my_cams, ego, [obj, obj_far], tracklets,
        datadir="/tmp/nv_parity/016", shifts=[2.0, -3.0], mode="train",
        train_actor_distance_thresh=1.5)

    assert len(ref_out) == len(my_out) == 2 * F
    for rc, mc in zip(ref_out, my_out):
        assert rc.uid == mc.uid
        np.testing.assert_allclose(mc.R, rc.R, atol=1e-10)
        np.testing.assert_allclose(mc.T, rc.T, atol=1e-10)
        assert rc.metadata["novel_view_id"] == mc.metadata["novel_view_id"]
        assert rc.metadata["skip_camera"] == mc.metadata["skip_camera"]
        assert (os.path.basename(rc.metadata["guidance_rgb_path"])
                == os.path.basename(mc.metadata["guidance_rgb_path"]))
    assert any(c.metadata["skip_camera"] for c in my_out)
    assert not all(c.metadata["skip_camera"] for c in my_out)
