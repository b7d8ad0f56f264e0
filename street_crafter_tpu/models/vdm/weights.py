"""VDM parameter loading + engine construction from config.

Covers the reference's checkpoint surface (sample_condition.py:80-106 loads
.safetensors/.ckpt/.bin with non-strict matching; bin_to_st.py merges
LoRA/EMA into safetensors). Here parameters live as orbax pytrees; torch
checkpoints are ingested once via ``convert_torch_state_dict`` and saved
natively.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from .engine import EngineConfig, VideoDiffusionEngine
from .clip import CLIPVisualConfig
from .unet import UNetConfig
from .vae import VAEConfig


def engine_from_config(dcfg) -> EngineConfig:
    """Map the diffusion config node onto EngineConfig."""
    if dcfg.get("tiny", False):
        base = EngineConfig.tiny(num_frames=dcfg.sample_frames,
                                 num_steps=dcfg.num_steps)
        return base
    return EngineConfig(
        unet=UNetConfig(), vae=VAEConfig(), clip=CLIPVisualConfig(),
        num_frames=dcfg.sample_frames,
        num_steps=dcfg.num_steps,
        cfg_scale=dcfg.cfg_scale,
        fps_id=dcfg.fps_id,
        motion_bucket_id=dcfg.motion_bucket_id,
        cond_aug=dcfg.cond_aug)


def save_vdm_params(path: str, params) -> None:
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_vdm_params(engine: VideoDiffusionEngine, dcfg,
                    init_height: int = 64, init_width: int = 64):
    """Restore engine params from ``dcfg.ckpt_path`` (orbax dir); random
    init when empty (test/bring-up path — the reference hard-requires a
    checkpoint, sample_condition.py:46)."""
    ckpt = dcfg.get("ckpt_path", "")
    if ckpt and os.path.isdir(ckpt):
        import orbax.checkpoint as ocp
        target = jax.eval_shape(
            lambda k: engine.init_params(k, init_height, init_width),
            jax.random.PRNGKey(0))
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          target)
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(ckpt), abstract)
    if ckpt:
        raise FileNotFoundError(f"vdm checkpoint not found: {ckpt}")
    print("WARNING: no diffusion ckpt_path set; using random-init weights")
    return engine.init_params(jax.random.PRNGKey(0), init_height, init_width)


# -- torch checkpoint ingestion ------------------------------------------------

def convert_torch_state_dict(state_dict: dict, engine: VideoDiffusionEngine,
                             params) -> tuple[dict, list[str]]:
    """Map a reference torch state_dict (SVD/Vista/StreetCrafter naming,
    e.g. 'model.diffusion_model.*', 'first_stage_model.*',
    'conditioner.embedders.*') onto this engine's param pytree.

    Returns (new_params, unmatched_keys). Matching is shape-based within
    name-translated prefixes; conv kernels are transposed OIHW->HWIO and
    linear weights [out,in]->[in,out].
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    taken = [False] * len(flat)
    path_strs = ["/".join(str(k) for k in path) for path, _ in flat]

    def to_jax(name: str, t: np.ndarray) -> np.ndarray:
        a = np.asarray(t, np.float32)
        if a.ndim == 4:      # conv OIHW -> HWIO
            return a.transpose(2, 3, 1, 0)
        if a.ndim == 5:      # conv3d OIDHW -> DHWIO
            return a.transpose(2, 3, 4, 1, 0)
        if a.ndim == 2 and "weight" in name:
            return a.T
        return a

    unmatched = []
    new_leaves = [leaf for _, leaf in flat]
    for name, tensor in state_dict.items():
        arr = to_jax(name, tensor)
        hit = None
        for i, (pstr, (path, leaf)) in enumerate(zip(path_strs, flat)):
            if taken[i] or leaf.shape != arr.shape:
                continue
            if _name_compatible(name, pstr):
                hit = i
                break
        if hit is None:
            unmatched.append(name)
        else:
            taken[hit] = True
            new_leaves[hit] = arr.astype(np.asarray(flat[hit][1]).dtype)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), unmatched


_PREFIX_MAP = {
    "model.diffusion_model.": "unet",
    "first_stage_model.": "vae",
    "conditioner.embedders.": "clip",
}


def _name_compatible(torch_name: str, jax_path: str) -> bool:
    for prefix, root in _PREFIX_MAP.items():
        if torch_name.startswith(prefix):
            return jax_path.startswith(root) or f"'{root}'" in jax_path
    return True
