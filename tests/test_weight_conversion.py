"""torch->jax UNet weight conversion: the name map must cover the entire
flax param tree bijectively, and tensors must land transposed correctly."""

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.models.vdm.unet import UNetConfig, VideoUNet
from street_crafter_tpu.models.vdm.weights import (
    convert_torch_state_dict, unet_name_map)


def _init_unet(cfg):
    model = VideoUNet(cfg)
    T, H, W = 2, 8, 8
    x = jnp.zeros((T, H, W, cfg.in_channels))
    return model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((T,)),
        jnp.zeros((1, 1, cfg.context_dim)),
        jnp.zeros((1, cfg.adm_in_channels)), num_frames=T,
        cond_mask=jnp.zeros((T,)),
        guidance_input=jnp.zeros((T, H, W, cfg.in_channels // 2)),
        guidance_scale=jnp.ones((T,)))


def _inverse_to_torch(flax_path: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:
        return arr.transpose(3, 2, 0, 1)           # HWIO -> OIHW
    if arr.ndim == 5:
        return arr.transpose(4, 3, 0, 1, 2)        # DHWIO -> OIDHW
    if arr.ndim == 2 and flax_path.endswith("kernel"):
        return arr.T
    return arr


def test_name_map_covers_tree():
    cfg = UNetConfig.tiny()
    params = _init_unet(cfg)
    name_map = unet_name_map(cfg)
    inv = {v: k for k, v in name_map.items()}
    assert len(inv) == len(name_map), "flax module names must be unique"

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    modules = set()
    for path, _ in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        key = key.removeprefix("params/")
        modules.add(key.rsplit("/", 1)[0])
    mapped = set(name_map.values())
    missing = modules - mapped
    assert not missing, f"unmapped flax modules: {sorted(missing)[:10]}"


def test_roundtrip_conversion():
    cfg = UNetConfig.tiny()
    params = _init_unet(cfg)
    name_map = unet_name_map(cfg)

    # synthesize a torch state dict with random values in torch layouts
    rng = np.random.default_rng(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    torch_sd = {}
    expected = {}
    suffix_of = {"kernel": "weight", "scale": "weight", "bias": "bias",
                 "mix_factor": "mix_factor"}
    inv = {v: k for k, v in name_map.items()}
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        key = key.removeprefix("params/")
        module, pname = key.rsplit("/", 1)
        tmodule = inv[module]
        val = rng.normal(size=np.shape(leaf)).astype(np.float32)
        expected[key] = val
        if pname == "mix_factor":
            torch_sd[f"model.diffusion_model.{tmodule}.mix_factor"] = \
                _inverse_to_torch(key, val)
        else:
            torch_sd[f"model.diffusion_model.{tmodule}."
                     f"{suffix_of[pname]}"] = _inverse_to_torch(key, val)

    new_params, unmatched = convert_torch_state_dict(torch_sd, cfg, params)
    assert unmatched == [], unmatched[:10]

    new_flat = jax.tree_util.tree_flatten_with_path(new_params)[0]
    for path, leaf in new_flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        key = key.removeprefix("params/")
        np.testing.assert_allclose(np.asarray(leaf), expected[key],
                                   err_msg=key)


def test_full_config_map_is_consistent():
    """The full SVD config's map references valid torch block indices:
    input 0..n, contiguous; output blocks cover every level."""
    cfg = UNetConfig()
    m = unet_name_map(cfg)
    in_idx = {int(k.split(".")[1]) for k in m if k.startswith("input_blocks")}
    assert in_idx == set(range(0, max(in_idx) + 1))
    out_idx = {int(k.split(".")[1]) for k in m
               if k.startswith("output_blocks")}
    assert out_idx == set(range(0, 12))  # 4 levels x 3 blocks
    assert "out.2" in m and "condition_input_blocks.1.0" in m