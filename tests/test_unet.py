import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.unet import VideoUNet, UNetConfig


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.tiny()
    model = VideoUNet(cfg)
    T, H, W = 3, 16, 16
    x = jnp.zeros((T, H, W, cfg.in_channels))
    t = jnp.ones((T,))
    ctx = jnp.zeros((1, 2, cfg.context_dim))
    y = jnp.zeros((1, cfg.adm_in_channels))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx, y, num_frames=T)
    return model, params, (T, H, W, cfg)


def test_unet_forward_shape(tiny_unet):
    model, params, (T, H, W, cfg) = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H, W, cfg.in_channels))
    out = model.apply(params, x, jnp.full((T,), 0.5),
                      jnp.ones((1, 2, cfg.context_dim)),
                      jnp.ones((1, cfg.adm_in_channels)), num_frames=T)
    assert out.shape == (T, H, W, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_zero_init_out(tiny_unet):
    # out conv is zero-init: output of a fresh model is exactly zero
    model, params, (T, H, W, cfg) = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (T, H, W, cfg.in_channels))
    out = model.apply(params, x, jnp.ones((T,)),
                      jnp.ones((1, 2, cfg.context_dim)),
                      jnp.ones((1, cfg.adm_in_channels)), num_frames=T)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_guidance_injection_zero_at_init_then_active(tiny_unet):
    model, params, (T, H, W, cfg) = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (T, H, W, cfg.in_channels))
    guide = jax.random.normal(jax.random.PRNGKey(4),
                              (T, H, W, cfg.in_channels // 2))
    # need params containing the condition convs: re-init with guidance
    params_g = model.init(jax.random.PRNGKey(0), x, jnp.ones((T,)),
                          jnp.ones((1, 2, cfg.context_dim)),
                          jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                          guidance_input=guide,
                          guidance_scale=jnp.ones((T,)))
    base = model.apply(params_g, x, jnp.ones((T,)),
                       jnp.ones((1, 2, cfg.context_dim)),
                       jnp.ones((1, cfg.adm_in_channels)), num_frames=T)
    # zero-init second conv: guidance has no effect at init
    with_g = model.apply(params_g, x, jnp.ones((T,)),
                         jnp.ones((1, 2, cfg.context_dim)),
                         jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                         guidance_input=guide, guidance_scale=jnp.ones((T,)))
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_g), atol=1e-6)
    # perturb the zero conv: guidance now changes the output
    import flax
    p = flax.core.unfreeze(params_g)
    p["params"]["condition_conv_1"]["kernel"] = (
        p["params"]["condition_conv_1"]["kernel"] + 0.1)
    mid = model.apply(p, x, jnp.ones((T,)),
                      jnp.ones((1, 2, cfg.context_dim)),
                      jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                      guidance_input=guide, guidance_scale=jnp.ones((T,)))
    mid0 = model.apply(p, x, jnp.ones((T,)),
                       jnp.ones((1, 2, cfg.context_dim)),
                       jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                       guidance_input=guide,
                       guidance_scale=jnp.zeros((T,)))
    assert np.abs(np.asarray(mid) - np.asarray(mid0)).max() == 0.0  # zero out conv still gates
    # non-trivial check via intermediate: perturb out conv too
    p["params"]["out_conv"]["kernel"] = jnp.ones_like(
        p["params"]["out_conv"]["kernel"]) * 0.01
    a = model.apply(p, x, jnp.ones((T,)),
                    jnp.ones((1, 2, cfg.context_dim)),
                    jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                    guidance_input=guide, guidance_scale=jnp.ones((T,)))
    b = model.apply(p, x, jnp.ones((T,)),
                    jnp.ones((1, 2, cfg.context_dim)),
                    jnp.ones((1, cfg.adm_in_channels)), num_frames=T,
                    guidance_input=guide, guidance_scale=jnp.zeros((T,)))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0


def test_cond_mask_switches_time_embedding(tiny_unet):
    model, params, (T, H, W, cfg) = tiny_unet
    import flax
    p = flax.core.unfreeze(params)
    p["params"]["out_conv"]["kernel"] = jnp.ones_like(
        p["params"]["out_conv"]["kernel"]) * 0.01
    # at init every residual branch ends in a zero conv, so the time
    # embedding is invisible; open one ResBlock path
    rb = p["params"]["in_0_0_res"]["spatial"]["out_conv"]
    rb["kernel"] = jnp.ones_like(rb["kernel"]) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(5), (T, H, W, cfg.in_channels))
    args = (x, jnp.ones((T,)), jnp.ones((1, 2, cfg.context_dim)),
            jnp.ones((1, cfg.adm_in_channels)))
    out0 = model.apply(p, *args, num_frames=T,
                       cond_mask=jnp.zeros((T,)))
    out1 = model.apply(p, *args, num_frames=T,
                       cond_mask=jnp.ones((T,)).at[1:].set(0.0))
    d = np.abs(np.asarray(out0) - np.asarray(out1))
    assert d[0].max() > 1e-7      # frame 0 uses the cond embedding
    assert d[1:].max() == 0.0     # other frames unchanged


def test_unet_bf16_policy_matches_f32(tiny_unet):
    """dtype='bfloat16' computes in bf16 with f32 params and stays close to
    the f32 result (mixed-precision policy, models/vdm/layers.py header)."""
    import dataclasses
    model, params, (T, H, W, cfg) = tiny_unet
    cfg16 = dataclasses.replace(cfg, dtype="bfloat16")
    m16 = VideoUNet(cfg16)
    x = jax.random.normal(jax.random.PRNGKey(7), (T, H, W, cfg.in_channels))
    t = jnp.full((T,), 0.5)
    ctx = jnp.ones((1, 2, cfg.context_dim))
    y = jnp.ones((1, cfg.adm_in_channels))
    # perturb the zero-init out conv so outputs are non-trivial
    import flax
    p = flax.core.unfreeze(params)
    p["params"]["out_conv"]["kernel"] = jnp.full_like(
        p["params"]["out_conv"]["kernel"], 0.02)
    ref = model.apply(p, x, t, ctx, y, num_frames=T)
    out = m16.apply(p, x, t, ctx, y, num_frames=T)
    assert out.dtype == jnp.bfloat16
    assert jax.tree.leaves(p)[0].dtype == jnp.float32
    ref_n = np.asarray(ref, np.float32)
    out_n = np.asarray(out, np.float32)
    denom = np.abs(ref_n).mean() + 1e-6
    assert np.abs(ref_n - out_n).mean() / denom < 0.1


def test_unet_bf16_policy_grads_f32(tiny_unet):
    import dataclasses
    model, params, (T, H, W, cfg) = tiny_unet
    cfg16 = dataclasses.replace(cfg, dtype="bfloat16")
    m16 = VideoUNet(cfg16)
    x = jax.random.normal(jax.random.PRNGKey(8), (T, H, W, cfg.in_channels))

    def loss(p):
        out = m16.apply(p, x, jnp.full((T,), 0.5),
                        jnp.ones((1, 2, cfg.context_dim)),
                        jnp.ones((1, cfg.adm_in_channels)), num_frames=T)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_crossattn_len1_shortcut_exact():
    # softmax over a single key is 1, so the length-1-context shortcut must
    # equal the generic attention path exactly (same params, same output)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from street_crafter_tpu.models.vdm.layers import CrossAttention
    from street_crafter_tpu.ops.attention import attention_xla

    mod = CrossAttention(heads=2, dim_head=8, context_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 16))
    params = mod.init(jax.random.PRNGKey(2), x, ctx)
    out = mod.apply(params, x, ctx)

    # generic reference computed from the same params
    p = params["params"]
    q = (x @ p["to_q"]["kernel"]).reshape(3, 12, 2, 8)
    k = (ctx @ p["to_k"]["kernel"]).reshape(3, 1, 2, 8)
    v = (ctx @ p["to_v"]["kernel"]).reshape(3, 1, 2, 8)
    ref = attention_xla(q, k, v).reshape(3, 12, 16)
    ref = ref @ p["to_out"]["kernel"] + p["to_out"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_lora_adapters_noop_at_init_and_peft_group():
    """add_lora: zero-init up => output identical to the base model with the
    same base params; the PEFT partition trains only adapters (+
    cond_time_stack_embed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from street_crafter_tpu.models.vdm.layers import CrossAttention

    base = CrossAttention(heads=2, dim_head=8)
    lora = CrossAttention(heads=2, dim_head=8, add_lora=True, lora_rank=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    pl_ = lora.init(jax.random.PRNGKey(1), x)
    names = set(pl_["params"].keys())
    assert {"q_adapter_down", "q_adapter_up", "k_adapter_down",
            "v_adapter_up", "out_adapter_down"} <= names
    # up-adapters zero-init => exact no-op vs base weights
    pb = {"params": {k: v for k, v in pl_["params"].items()
                     if "adapter" not in k}}
    np.testing.assert_allclose(np.asarray(lora.apply(pl_, x)),
                               np.asarray(base.apply(pb, x)), atol=1e-6)

    # len-1 cross-attn shortcut path with lora stays exact too
    loc = CrossAttention(heads=2, dim_head=8, context_dim=16, add_lora=True,
                         lora_rank=4)
    bc = CrossAttention(heads=2, dim_head=8, context_dim=16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16))
    plc = loc.init(jax.random.PRNGKey(3), x, ctx)
    pbc = {"params": {k: v for k, v in plc["params"].items()
                      if "adapter" not in k}}
    np.testing.assert_allclose(np.asarray(loc.apply(plc, x, ctx)),
                               np.asarray(bc.apply(pbc, x, ctx)), atol=1e-6)

    from street_crafter_tpu.training.vdm_trainer import is_peft_param
    assert is_peft_param(("unet", "block", "attn1", "q_adapter_down",
                          "kernel"))
    assert not is_peft_param(("unet", "block", "attn1", "to_q", "kernel"))


def test_quant_convs_close_to_f32():
    """W8A8 int8 convs (UNetConfig.quant_convs, layers.Int8Conv): same param
    tree as the f32 model (converted checkpoints load unchanged) and output
    within ~2% relative error on properly initialized weights."""
    cfg = UNetConfig.tiny()
    cfg_q = dataclasses.replace(cfg, quant_convs=True)
    model = VideoUNet(cfg)
    model_q = VideoUNet(cfg_q)
    T, H, W = 2, 16, 16
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (T, H, W, cfg.in_channels))
    t = jnp.full((T,), 0.25)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (T, 1, cfg.context_dim))
    y = jax.random.normal(jax.random.PRNGKey(2), (T, cfg.adm_in_channels))
    params = model.init(jax.random.PRNGKey(3), x, t, ctx, y, num_frames=T)
    # the UNet's final conv is zero-init (output would be all zeros);
    # perturb every leaf so the comparison sees real activations
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(4), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    # identical param trees -> checkpoints interchange
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(
        model_q.init(jax.random.PRNGKey(3), x, t, ctx, y, num_frames=T))
    assert s1 == s2
    out = model.apply(params, x, t, ctx, y, num_frames=T)
    out_q = model_q.apply(params, x, t, ctx, y, num_frames=T)
    rel = float(jnp.linalg.norm(out - out_q) / jnp.linalg.norm(out))
    assert rel < 0.02, rel
