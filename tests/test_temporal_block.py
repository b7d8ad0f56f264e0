"""Fused temporal-stage kernel (ops/temporal_block.py) vs the XLA modules.

The fused path replaces `+emb -> VideoTransformerBlock -> AlphaBlender`
inside SpatialVideoTransformer; with identical params the two paths must
agree to bf16 tolerance (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.layers import SpatialVideoTransformer


def _build(fused):
    return SpatialVideoTransformer(
        heads=2, dim_head=16, depth=1, context_dim=48,
        fused_temporal=fused, dtype="bfloat16")


@pytest.mark.parametrize("num_frames", [3, 5])
def test_fused_matches_xla(num_frames):
    B, T = 2, num_frames
    H, W, C = 4, 8, 32
    key = jax.random.PRNGKey(0)
    kx, kc, ki = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B * T, H, W, C), jnp.float32)
    ctx = jax.random.normal(kc, (B * T, 1, 48), jnp.float32)

    ref_mod = _build(False)
    params = ref_mod.init(ki, x, ctx, T)
    ref = ref_mod.apply(params, x, ctx, T)
    out = _build(True).apply(params, x, ctx, T)

    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    err = np.abs(out - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, (err, rel)
    # bulk agreement much tighter than the max
    assert np.median(np.abs(out - ref)) < 0.02


def test_fused_large_matches_xla():
    """C>384 path: attention-only kernel + XLA FFs in flat layout."""
    B, T = 1, 3
    H, W = 4, 8
    heads, dh = 10, 64          # C = 640 -> _fused_ok_large branch
    key = jax.random.PRNGKey(1)
    kx, kc, ki = jax.random.split(key, 3)
    x = jax.random.normal(kx, (B * T, H, W, heads * dh), jnp.float32)
    ctx = jax.random.normal(kc, (B * T, 1, 48), jnp.float32)

    def build(fused):
        return SpatialVideoTransformer(
            heads=heads, dim_head=dh, depth=1, context_dim=48,
            fused_temporal=fused, dtype="bfloat16")

    ref_mod = build(False)
    params = ref_mod.init(ki, x, ctx, T)
    ref = np.asarray(ref_mod.apply(params, x, ctx, T), np.float32)
    out = np.asarray(build(True).apply(params, x, ctx, T), np.float32)
    err = np.abs(out - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.05, (err, rel)
    assert np.median(np.abs(out - ref)) < 0.02


def test_engine_config_fused_gating():
    """Sampling entries get the fused kernel by default; the fine-tune
    entry must not (forward-only kernel, no VJP)."""
    from street_crafter_tpu.config.config import Config
    from street_crafter_tpu.models.vdm.weights import engine_from_config
    dcfg = Config(dict(
        sample_frames=25, num_steps=2, cfg_scale=2.5, fps_id=10,
        motion_bucket_id=127, cond_aug=0.02))
    assert engine_from_config(dcfg).unet.fused_temporal is True
    assert engine_from_config(dcfg, training=True).unet.fused_temporal \
        is False
    over = dcfg.clone().merge(dict(fused_temporal=False))
    assert engine_from_config(over).unet.fused_temporal is False


def test_fused_param_tree_identical():
    """Both paths must init the exact same param tree (checkpoint compat)."""
    B, T, H, W, C = 1, 3, 4, 8, 32
    x = jnp.zeros((B * T, H, W, C))
    ctx = jnp.zeros((B * T, 1, 48))
    p0 = _build(False).init(jax.random.PRNGKey(0), x, ctx, T)
    p1 = _build(True).init(jax.random.PRNGKey(0), x, ctx, T)
    t0 = jax.tree_util.tree_structure(p0)
    t1 = jax.tree_util.tree_structure(p1)
    assert t0 == t1
