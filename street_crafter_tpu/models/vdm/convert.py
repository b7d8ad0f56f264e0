"""torch -> jax checkpoint ingestion for the full VDM engine.

Covers the reference's complete weight surface:

- reading ``.safetensors`` / ``.ckpt`` / ``.bin`` checkpoints with the
  reference's prefix conventions (sample_condition.py:80-106,
  video_diffusion/train.py:657-668: Lightning ``state_dict`` wrapper,
  DeepSpeed ``_forward_module.`` prefix);
- LoRA-adapter merge + EMA-weight substitution (bin_to_st.py:10-47);
- ``time_embed -> cond_time_stack_embed`` duplication when starting from a
  vanilla SVD/Vista checkpoint (video_diffusion/train.py:652-655);
- exact name maps + layout transposes for the VideoUNet
  (models/vdm/weights.py), the SD-VAE encoder + temporal VideoDecoder
  (vwm/modules/diffusionmodules/model.py:445-694, temporal_ae.py:75-151)
  and the OpenCLIP ViT visual tower (vwm/modules/encoders/modules.py:
  255-404, open_clip naming);
- ``convert_engine_checkpoint``: one call from a full vwm checkpoint
  (``model.diffusion_model.* / first_stage_model.* /
  conditioner.embedders.0.open_clip.model.visual.*``) to the engine's
  {"unet", "vae", "clip"} param tree.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np

from .clip import CLIPVisualConfig
from .vae import VAEConfig

# ---------------------------------------------------------------- readers


def read_checkpoint(path: str | os.PathLike) -> dict[str, np.ndarray]:
    """Load a torch-side checkpoint into {name: float32 ndarray}.

    Handles .safetensors (no torch needed), .ckpt (Lightning: unwraps
    ``state_dict``), .bin (DeepSpeed-merged: strips ``_forward_module.``),
    and .pt/.pth (raw state_dict) — the same set the reference accepts
    (sample_condition.py:80-106, train.py:657-668).
    """
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = dict(load_file(path))
    else:
        import torch
        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        if isinstance(obj, dict) and "module" in obj and all(
                not torch.is_tensor(v) for k, v in list(obj.items())[:1]):
            obj = obj.get("module", obj)
        sd = {}
        for k, v in obj.items():
            if torch.is_tensor(v):
                sd[k] = v.detach().to(torch.float32).cpu().numpy()
    out = {}
    for k, v in sd.items():
        if "_forward_module." in k:
            k = k.replace("_forward_module.", "")
        out[k] = np.asarray(v, np.float32)
    return out


def merge_lora_ema(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """bin_to_st.py:10-47 analog: fold rank-decomposed LoRA adapters into
    their base projections (W += up @ down), then substitute EMA weights for
    their originals (LitEma stores keys under ``model_ema.`` with dots
    stripped from the original name)."""
    sd = dict(sd)
    for k in list(sd.keys()):
        if "adapter_down" not in k:
            continue
        for tag, base in (("q_adapter_down", "to_q"),
                          ("k_adapter_down", "to_k"),
                          ("v_adapter_down", "to_v"),
                          ("out_adapter_down", None)):
            if tag not in k:
                continue
            up_k = k.replace(tag, tag.replace("down", "up"))
            if base is None:  # out projection: EMA keys have dots stripped
                base_k = k.replace("out_adapter_down",
                                   "to_out0" if "model_ema" in k
                                   else "to_out.0")
            else:
                base_k = k.replace(tag, base)
            sd[base_k] = sd[base_k] + sd[up_k] @ sd[k]
            del sd[k], sd[up_k]
            break
    # EMA substitution: model_ema.<name-without-dots> replaces model.<name>
    ema = {k: v for k, v in sd.items()
           if k.startswith("model_ema.") and
           not k.endswith(("decay", "num_updates"))}
    if ema:
        originals = {k.replace(".", ""): k for k in sd
                     if not k.startswith("model_ema.")}
        for k, v in ema.items():
            flat = "model" + k[len("model_ema."):]
            orig = originals.get(flat)
            if orig is not None:
                sd[orig] = v
        for k in list(sd.keys()):
            if k.startswith("model_ema."):
                del sd[k]
    return sd


def duplicate_time_embed(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Vanilla SVD/Vista -> StreetCrafter: copy every ``time_embed`` weight
    to ``cond_time_stack_embed`` (video_diffusion/train.py:652-655). No-op
    when the checkpoint already carries the conditioned embed."""
    if any("cond_time_stack_embed" in k for k in sd):
        return sd
    sd = dict(sd)
    for k in list(sd.keys()):
        if "time_embed" in k:
            sd[k.replace("time_embed", "cond_time_stack_embed")] = sd[k]
    return sd


# ------------------------------------------------------------- applier

_SUFFIX = {"weight": ("kernel", "scale", "mix_factor"), "bias": ("bias",),
           "mix_factor": ("mix_factor",)}


def to_jax_array(torch_key: str, a: np.ndarray, target_shape,
                 transpose: bool = True) -> np.ndarray:
    """torch tensor -> flax layout, validated/coerced by target shape."""
    a = np.asarray(a, np.float32)
    if transpose:
        if a.ndim == 4:                       # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 5:                     # conv3d OIDHW -> DHWIO
            a = a.transpose(2, 3, 4, 1, 0)
        elif a.ndim == 2 and torch_key.endswith("weight"):
            a = a.T                           # linear [out,in] -> [in,out]
    if tuple(a.shape) != tuple(target_shape):
        a = a.reshape(target_shape)           # head splits / scalars
    return a


def apply_name_map(
    state_dict: dict[str, np.ndarray],
    module_map: dict[str, str],
    params: Any,
    leaf_map: dict[str, str] | None = None,
    no_transpose: tuple[str, ...] = (),
) -> tuple[Any, list[str]]:
    """Write a torch state_dict onto a flax param tree.

    ``module_map``: torch module path (no .weight/.bias suffix) -> flax
    module path ('/'-joined); suffixes resolve via weight->kernel/scale,
    bias->bias, mix_factor. ``leaf_map``: exact torch key -> exact flax leaf
    path (plain tensors like CLIP's class_embedding/proj). Keys listed in
    ``no_transpose`` are copied without the linear transpose. Returns
    (new_params, unmatched torch keys)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    by_path = {}
    for i, (path, _) in enumerate(flat):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        by_path[key.removeprefix("params/")] = i
        by_path[key] = i

    new_leaves = [leaf for _, leaf in flat]
    unmatched = []
    leaf_map = leaf_map or {}
    for tkey, tensor in state_dict.items():
        if tkey in leaf_map:
            idx = by_path.get(leaf_map[tkey])
            if idx is None:
                unmatched.append(tkey)
                continue
            leaf = flat[idx][1]
            new_leaves[idx] = to_jax_array(
                tkey, tensor, np.shape(leaf),
                transpose=tkey not in no_transpose).astype(
                    np.asarray(leaf).dtype)
            continue
        module, _, suffix = tkey.rpartition(".")
        if module in module_map:
            flax_module = module_map[module]
        elif tkey in module_map:              # suffix-less params
            flax_module, suffix = module_map[tkey], "mix_factor"
        else:
            unmatched.append(tkey)
            continue
        hit = None
        for cand in _SUFFIX.get(suffix, ()):
            idx = by_path.get(f"{flax_module}/{cand}")
            if idx is not None:
                hit = idx
                break
        if hit is None:
            unmatched.append(tkey)
            continue
        leaf = flat[hit][1]
        new_leaves[hit] = to_jax_array(
            tkey, tensor, np.shape(leaf),
            transpose=tkey not in no_transpose).astype(
                np.asarray(leaf).dtype)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), unmatched


# ------------------------------------------------------------- VAE map

def _resnet_map(tp: str, fp: str) -> dict[str, str]:
    """model.py ResnetBlock (no temb in the AE path)."""
    return {f"{tp}.norm1": f"{fp}/norm1", f"{tp}.conv1": f"{fp}/conv1",
            f"{tp}.norm2": f"{fp}/norm2", f"{tp}.conv2": f"{fp}/conv2",
            f"{tp}.nin_shortcut": f"{fp}/nin_shortcut",
            f"{tp}.conv_shortcut": f"{fp}/nin_shortcut"}


def _video_resnet_map(tp: str, fp: str) -> dict[str, str]:
    """temporal_ae.py VideoResBlock: spatial ResnetBlock + openaimodel 3D
    ResBlock (skip_t_emb) + learned mix_factor."""
    m = _resnet_map(tp, f"{fp}/spatial")
    m.update({f"{tp}.time_stack.in_layers.0": f"{fp}/time_stack/in_norm",
              f"{tp}.time_stack.in_layers.2": f"{fp}/time_stack/in_conv",
              f"{tp}.time_stack.out_layers.0": f"{fp}/time_stack/out_norm",
              f"{tp}.time_stack.out_layers.3": f"{fp}/time_stack/out_conv",
              tp: fp})                        # <tp>.mix_factor -> <fp>/mix_factor
    return m


def _attn_map(tp: str, fp: str) -> dict[str, str]:
    return {f"{tp}.norm": f"{fp}/norm", f"{tp}.q": f"{fp}/q",
            f"{tp}.k": f"{fp}/k", f"{tp}.v": f"{fp}/v",
            f"{tp}.proj_out": f"{fp}/proj_out"}


def vae_name_map(cfg: VAEConfig, video_decoder: bool = True
                 ) -> dict[str, str]:
    """first_stage_model.* torch names -> flax VAE module paths
    (model.py:445-694 Encoder/Decoder + temporal_ae.py VideoDecoder)."""
    m: dict[str, str] = {}
    L = len(cfg.ch_mult)
    m["encoder.conv_in"] = "encoder/conv_in"
    for lv in range(L):
        for i in range(cfg.num_res_blocks):
            m.update(_resnet_map(f"encoder.down.{lv}.block.{i}",
                                 f"encoder/down_{lv}_block_{i}"))
        if lv != L - 1:
            m[f"encoder.down.{lv}.downsample.conv"] = \
                f"encoder/down_{lv}_downsample"
    m.update(_resnet_map("encoder.mid.block_1", "encoder/mid_block_1"))
    m.update(_attn_map("encoder.mid.attn_1", "encoder/mid_attn_1"))
    m.update(_resnet_map("encoder.mid.block_2", "encoder/mid_block_2"))
    m["encoder.norm_out"] = "encoder/norm_out"
    m["encoder.conv_out"] = "encoder/conv_out"

    res = _video_resnet_map if video_decoder else _resnet_map
    m["decoder.conv_in"] = "decoder/conv_in"
    m.update(res("decoder.mid.block_1", "decoder/mid_block_1"))
    m.update(_attn_map("decoder.mid.attn_1", "decoder/mid_attn_1"))
    m.update(res("decoder.mid.block_2", "decoder/mid_block_2"))
    for lv in range(L):
        for i in range(cfg.num_res_blocks + 1):
            m.update(res(f"decoder.up.{lv}.block.{i}",
                         f"decoder/up_{lv}_block_{i}"))
        if lv != 0:
            m[f"decoder.up.{lv}.upsample.conv"] = f"decoder/up_{lv}_upsample"
    m["decoder.norm_out"] = "decoder/norm_out"
    m["decoder.conv_out"] = "decoder/conv_out"
    if video_decoder:
        m["decoder.conv_out.time_mix_conv"] = "decoder/conv_out_time_mix"
    return m


def convert_vae_state_dict(state_dict: dict, cfg: VAEConfig, vae_params,
                           prefix: str = "first_stage_model.",
                           video_decoder: bool = True
                           ) -> tuple[Any, list[str]]:
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    return apply_name_map(sd, vae_name_map(cfg, video_decoder), vae_params)


# ------------------------------------------------------------- CLIP map

CLIP_VISUAL_PREFIX = "conditioner.embedders.0.open_clip.model.visual."


def split_clip_inproj(sd: dict[str, np.ndarray],
                      heads: int) -> dict[str, np.ndarray]:
    """open_clip MultiheadAttention packs q,k,v as in_proj_weight [3W, W];
    split into synthetic q/k/v projections so the generic applier maps
    them onto flax SelfAttention leaves."""
    out = {}
    for k, v in sd.items():
        if k.endswith("attn.in_proj_weight"):
            w = v.reshape(3, -1, v.shape[-1])
            base = k[:-len("in_proj_weight")]
            out[base + "q_proj.weight"] = w[0]
            out[base + "k_proj.weight"] = w[1]
            out[base + "v_proj.weight"] = w[2]
        elif k.endswith("attn.in_proj_bias"):
            b = v.reshape(3, -1)
            base = k[:-len("in_proj_bias")]
            out[base + "q_proj.bias"] = b[0]
            out[base + "k_proj.bias"] = b[1]
            out[base + "v_proj.bias"] = b[2]
        else:
            out[k] = v
    return out


def clip_name_map(cfg: CLIPVisualConfig) -> tuple[dict[str, str],
                                                  dict[str, str]]:
    """open_clip ViT visual tower names (after in_proj splitting) -> flax
    CLIPVisual paths. Returns (module_map, leaf_map)."""
    m: dict[str, str] = {"conv1": "patch_embed",
                         "ln_pre": "ln_pre", "ln_post": "ln_post"}
    for i in range(cfg.layers):
        t = f"transformer.resblocks.{i}"
        f = f"resblock_{i}"
        m.update({f"{t}.ln_1": f"{f}/ln_1", f"{t}.ln_2": f"{f}/ln_2",
                  f"{t}.attn.q_proj": f"{f}/attn/query",
                  f"{t}.attn.k_proj": f"{f}/attn/key",
                  f"{t}.attn.v_proj": f"{f}/attn/value",
                  f"{t}.attn.out_proj": f"{f}/attn/out",
                  f"{t}.mlp.c_fc": f"{f}/mlp_fc",
                  f"{t}.mlp.c_proj": f"{f}/mlp_proj"})
    leaf = {"class_embedding": "class_embedding",
            "positional_embedding": "positional_embedding",
            "proj": "proj"}
    return m, leaf


def convert_clip_state_dict(state_dict: dict, cfg: CLIPVisualConfig,
                            clip_params,
                            prefix: str = CLIP_VISUAL_PREFIX
                            ) -> tuple[Any, list[str]]:
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    sd = split_clip_inproj(sd, cfg.heads)
    module_map, leaf_map = clip_name_map(cfg)
    # 'proj' is a plain [width, out] tensor, NOT an nn.Linear: no transpose
    return apply_name_map(sd, module_map, clip_params, leaf_map=leaf_map,
                          no_transpose=("proj",))


# ------------------------------------------------------- full assembly

def convert_engine_checkpoint(
    src: str | dict,
    engine,
    init_height: int = 64,
    init_width: int = 64,
    vanilla_svd: bool = False,
    strict: bool = False,
) -> tuple[dict, dict]:
    """Full vwm checkpoint -> engine params {"unet", "vae", "clip"}.

    ``src``: checkpoint path or an already-read state dict. ``vanilla_svd``
    duplicates time_embed for checkpoints without the conditioned branch
    (applied automatically when cond_time_stack_embed keys are absent).
    Returns (params, report) where report lists per-component unmatched
    torch keys and flax leaves left at init. ``strict`` raises when any
    model.diffusion_model/first_stage/CLIP-visual key went unmatched."""
    from .weights import convert_torch_state_dict

    sd = read_checkpoint(src) if isinstance(src, (str, os.PathLike)) else src
    sd = merge_lora_ema(sd)
    if vanilla_svd or not any("cond_time_stack_embed" in k for k in sd):
        sd = duplicate_time_embed(sd)

    params = engine.init_params(jax.random.PRNGKey(0), init_height,
                                init_width)
    unet_sd = {k: v for k, v in sd.items()
               if k.startswith("model.diffusion_model.")}
    unet_params, un_unet = convert_torch_state_dict(
        unet_sd, engine.cfg.unet, params["unet"])
    vae_params, un_vae = convert_vae_state_dict(
        sd, engine.cfg.vae, params["vae"])
    clip_params, un_clip = convert_clip_state_dict(
        sd, engine.cfg.clip, params["clip"])

    report = {"unmatched_unet": un_unet, "unmatched_vae": un_vae,
              "unmatched_clip": un_clip}
    if strict and (un_unet or un_vae or un_clip):
        raise ValueError(f"unmatched checkpoint keys: {report}")
    return ({"unet": unet_params, "vae": vae_params, "clip": clip_params},
            report)


def main(argv=None):
    """CLI: convert a torch vwm checkpoint to a native orbax params dir.

    python -m street_crafter_tpu.models.vdm.convert CKPT OUT_DIR
        [--tiny] [--height H] [--width W] [--vanilla-svd]
    """
    import argparse

    from .engine import EngineConfig, VideoDiffusionEngine
    from .weights import save_vdm_params

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("ckpt")
    p.add_argument("out_dir")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--num-frames", type=int, default=25)
    p.add_argument("--vanilla-svd", action="store_true")
    args = p.parse_args(argv)

    cfg = EngineConfig.tiny(num_frames=args.num_frames) if args.tiny \
        else EngineConfig(num_frames=args.num_frames)
    engine = VideoDiffusionEngine(cfg)
    params, report = convert_engine_checkpoint(
        args.ckpt, engine, init_height=args.height, init_width=args.width,
        vanilla_svd=args.vanilla_svd)
    for name, keys in report.items():
        print(f"{name}: {len(keys)} unmatched"
              + (f" (e.g. {keys[:3]})" if keys else ""))
    save_vdm_params(args.out_dir, params)
    print(f"saved to {args.out_dir}")


if __name__ == "__main__":
    main()
