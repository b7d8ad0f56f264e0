"""Weight-ingestion numerics: torch reference modules -> state_dict ->
convert -> jax forward must match torch forward (both f32 CPU).

This is the parity evidence for the converter (checkpoint readers, LoRA/EMA
merge, time_embed duplication, and the UNet/VAE/CLIP name maps + layout
transposes). The torch side lives in tests/torch_ref/ — our own
implementations of the published architectures with reference state-dict
naming."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from street_crafter_tpu.models.vdm.clip import CLIPVisual, CLIPVisualConfig
from street_crafter_tpu.models.vdm.convert import (
    convert_clip_state_dict, convert_engine_checkpoint,
    convert_vae_state_dict, duplicate_time_embed, merge_lora_ema,
    read_checkpoint,
)
from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
from street_crafter_tpu.models.vdm.vae import VAE, VAEConfig
from street_crafter_tpu.models.vdm.weights import convert_torch_state_dict
from tests.torch_ref.clip_torch import TorchCLIPVisual
from tests.torch_ref.unet_torch import TorchVideoUNet
from tests.torch_ref.vae_torch import TorchVAE


def randomize_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    return model


def rel_err(a, b):
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def nchw(x):  # np NHWC -> torch NCHW
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


# --------------------------------------------------------------- VAE


def test_vae_numerics():
    torch_vae = randomize_(TorchVAE(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                                    z_channels=4))
    sd = {f"first_stage_model.{k}": v.numpy()
          for k, v in torch_vae.state_dict().items()}

    cfg = VAEConfig.tiny()
    vae = VAE(cfg, video_decoder=True)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)),
                      num_frames=2)
    new_params, unmatched = convert_vae_state_dict(sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_mom = torch_vae.encoder(nchw(x)).numpy()
    j_mom = np.asarray(vae.apply(new_params, jnp.asarray(x),
                                 method=lambda m, v: m.encoder(v)))
    assert rel_err(j_mom, np.moveaxis(t_mom, 1, -1)) < 1e-4

    z = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        t_dec = torch_vae.decoder(nchw(z), num_frames=2).numpy()
    j_dec = np.asarray(vae.apply(
        new_params, jnp.asarray(z), 2,
        method=lambda m, v, nf: m.decoder(v, num_frames=nf)))
    # deeper stack accumulates XLA-vs-oneDNN conv-algorithm differences
    # (~2.5e-4 max rel err with matching weights); not a mapping issue
    assert rel_err(j_dec, np.moveaxis(t_dec, 1, -1)) < 1e-3


# --------------------------------------------------------------- CLIP


def test_clip_numerics():
    torch_clip = randomize_(TorchCLIPVisual())
    prefix = "conditioner.embedders.0.open_clip.model.visual."
    sd = {f"{prefix}{k}": v.numpy()
          for k, v in torch_clip.state_dict().items()}

    cfg = CLIPVisualConfig.tiny()
    clip = CLIPVisual(cfg)
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    new_params, unmatched = convert_clip_state_dict(sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = torch_clip(nchw(x)).numpy()
    j_out = np.asarray(clip.apply(new_params, jnp.asarray(x)))
    assert rel_err(j_out, t_out) < 3e-4


# --------------------------------------------------------------- UNet


def _torch_unet():
    return TorchVideoUNet(in_channels=8, model_channels=32, out_channels=4,
                          num_res_blocks=2, attention_resolutions=(2,),
                          channel_mult=(1, 2), num_head_channels=16,
                          transformer_depth=1, context_dim=48,
                          adm_in_channels=24)


def test_unet_numerics():
    torch_unet = randomize_(_torch_unet())
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in torch_unet.state_dict().items()}

    cfg = UNetConfig.tiny()
    unet = VideoUNet(cfg)
    T, H, W = 2, 8, 8
    rng = np.random.default_rng(2)
    x = rng.normal(size=(T, H, W, 8)).astype(np.float32)
    ts = np.array([3.7, 3.7], np.float32)
    ctx = rng.normal(size=(1, 2, 48)).astype(np.float32)
    y = rng.normal(size=(1, 24)).astype(np.float32)
    cm = np.array([1.0, 0.0], np.float32)
    gin = rng.normal(size=(T, H, W, 4)).astype(np.float32)
    gs = np.array([1.0, 0.7], np.float32)

    params = unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(ts), jnp.asarray(ctx), jnp.asarray(y),
                       num_frames=T, cond_mask=jnp.asarray(cm),
                       guidance_input=jnp.asarray(gin),
                       guidance_scale=jnp.asarray(gs))
    new_params, unmatched = convert_torch_state_dict(sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    with torch.no_grad():
        t_out = torch_unet(
            nchw(x), torch.from_numpy(ts), torch.from_numpy(ctx),
            torch.from_numpy(y), num_frames=T,
            cond_mask=torch.from_numpy(cm), guidance_input=nchw(gin),
            guidance_scale=torch.from_numpy(gs)).numpy()
    j_out = np.asarray(unet.apply(
        new_params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx),
        jnp.asarray(y), num_frames=T, cond_mask=jnp.asarray(cm),
        guidance_input=jnp.asarray(gin), guidance_scale=jnp.asarray(gs)))
    assert rel_err(j_out, np.moveaxis(t_out, 1, -1)) < 2e-4


# ------------------------------------------------------ readers & merges


def test_read_checkpoint_formats(tmp_path):
    sd = {"model.diffusion_model.a.weight": torch.randn(3, 3),
          "first_stage_model.b.bias": torch.randn(4)}

    from safetensors.torch import save_file
    p_st = tmp_path / "m.safetensors"
    save_file(sd, str(p_st))
    out = read_checkpoint(p_st)
    assert set(out) == set(sd)
    np.testing.assert_allclose(out["first_stage_model.b.bias"],
                               sd["first_stage_model.b.bias"].numpy())

    p_ckpt = tmp_path / "m.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, str(p_ckpt))
    out = read_checkpoint(p_ckpt)
    assert set(out) == set(sd)

    # deepspeed-merged .bin with _forward_module. prefix
    p_bin = tmp_path / "m.bin"
    torch.save({f"_forward_module.{k}": v for k, v in sd.items()},
               str(p_bin))
    out = read_checkpoint(p_bin)
    assert set(out) == set(sd)


def test_merge_lora():
    base = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
    down = np.random.default_rng(1).normal(size=(2, 8)).astype(np.float32)
    up = np.random.default_rng(2).normal(size=(8, 2)).astype(np.float32)
    sd = {"model.x.attn1.to_q.weight": base.copy(),
          "model.x.attn1.q_adapter_down.weight": down,
          "model.x.attn1.q_adapter_up.weight": up}
    out = merge_lora_ema(sd)
    assert "model.x.attn1.q_adapter_down.weight" not in out
    np.testing.assert_allclose(out["model.x.attn1.to_q.weight"],
                               base + up @ down, rtol=1e-6)


def test_merge_ema_substitution():
    w = np.ones((4,), np.float32)
    ema_w = np.full((4,), 2.0, np.float32)
    sd = {"model.diffusion_model.out.2.weight": w,
          "model_ema.diffusion_modelout2weight": ema_w,
          "model_ema.decay": np.float32(0.999)}
    out = merge_lora_ema(sd)
    np.testing.assert_allclose(out["model.diffusion_model.out.2.weight"],
                               ema_w)
    assert not any(k.startswith("model_ema.") for k in out)


def test_duplicate_time_embed():
    sd = {"model.diffusion_model.time_embed.0.weight": np.ones((4, 2)),
          "model.diffusion_model.out.2.weight": np.ones((1,))}
    out = duplicate_time_embed(sd)
    assert "model.diffusion_model.cond_time_stack_embed.0.weight" in out
    # no-op when the conditioned embed already exists
    out2 = duplicate_time_embed(dict(out))
    assert out2 == out


# ------------------------------------------------------ full assembly


def test_convert_engine_checkpoint(tmp_path):
    from street_crafter_tpu.models.vdm.engine import (
        EngineConfig, VideoDiffusionEngine,
    )

    torch_unet = randomize_(_torch_unet(), seed=1)
    torch_vae = randomize_(TorchVAE(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                                    z_channels=4), seed=2)
    torch_clip = randomize_(TorchCLIPVisual(), seed=3)
    sd = {}
    sd.update({f"model.diffusion_model.{k}": v
               for k, v in torch_unet.state_dict().items()})
    sd.update({f"first_stage_model.{k}": v
               for k, v in torch_vae.state_dict().items()})
    sd.update({f"conditioner.embedders.0.open_clip.model.visual.{k}": v
               for k, v in torch_clip.state_dict().items()})
    from safetensors.torch import save_file
    path = tmp_path / "engine.safetensors"
    save_file(sd, str(path))

    eng = VideoDiffusionEngine(EngineConfig.tiny(num_frames=2))
    params, report = convert_engine_checkpoint(str(path), eng,
                                               init_height=16, init_width=16,
                                               strict=True)
    # every flax leaf was overwritten: compare against random init
    init = eng.init_params(jax.random.PRNGKey(0), 16, 16)
    n_same = n_total = 0
    for a, b in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(params)):
        n_total += 1
        n_same += int((np.asarray(a) == np.asarray(b)).all())
    assert n_same == 0, f"{n_same}/{n_total} leaves left at init"

    # spot-check numerics through the assembled params: CLIP tower
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = torch_clip(nchw(x)).numpy()
    j_out = np.asarray(eng.clip.apply(params["clip"], jnp.asarray(x)))
    assert rel_err(j_out, t_out) < 3e-4


def test_vanilla_svd_duplication_in_assembly(tmp_path):
    """A checkpoint WITHOUT cond_time_stack_embed (vanilla SVD/Vista) gets
    the duplicated embed and converts with both branches equal."""
    from street_crafter_tpu.models.vdm.engine import (
        EngineConfig, VideoDiffusionEngine,
    )

    torch_unet = randomize_(_torch_unet(), seed=4)
    sd = {f"model.diffusion_model.{k}": v.numpy()
          for k, v in torch_unet.state_dict().items()
          if "cond_time_stack_embed" not in k
          and "condition_input_blocks" not in k}
    eng = VideoDiffusionEngine(EngineConfig.tiny(num_frames=2))
    params, report = convert_engine_checkpoint(sd, eng, init_height=16,
                                               init_width=16)
    up = params["unet"]["params"]
    np.testing.assert_allclose(
        np.asarray(up["cond_time_stack_embed"]["fc1"]["kernel"]),
        np.asarray(up["time_embed"]["fc1"]["kernel"]))


# --------------------------------------------------------------- LPIPS


def test_lpips_numerics():
    """convert_lpips_torch on a torch LPIPS(VGG16) fixture: jax distance
    matches torch (VERDICT: LPIPS-VGG converter evidence)."""
    from street_crafter_tpu.ops.lpips import convert_lpips_torch, lpips_distance
    from tests.torch_ref.lpips_torch import TorchLPIPS

    t = TorchLPIPS()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in t.vgg.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    vgg_state = {k.replace("vgg.", ""): v.numpy()
                 for k, v in t.state_dict().items() if k.startswith("vgg.")}
    lin_state = {k: v.numpy() for k, v in t.state_dict().items()
                 if k.startswith("lin")}
    params = convert_lpips_torch(vgg_state, lin_state)
    assert len([k for k in params if k.endswith("_w") and "conv" in k]) == 13
    assert len([k for k in params if k.startswith("lin")]) == 5

    rng = np.random.default_rng(9)
    a = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        t_d = float(t(nchw(a * 2 - 1), nchw(b * 2 - 1)))
    j_d = float(lpips_distance(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(j_d, t_d, rtol=1e-4)
