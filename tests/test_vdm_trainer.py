"""Multi-chip fine-tune step on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.models.vdm.conditioner import Conditioning
from street_crafter_tpu.models.vdm.engine import VideoDiffusionEngine, EngineConfig
from street_crafter_tpu.parallel import make_virtual_cpu_mesh, ShardingRules
from street_crafter_tpu.training.vdm_trainer import (
    init_vdm_train_state, make_vdm_train_step, shard_vdm_train_state,
    shard_batch_for_mesh,
)


def make_batch(eng, params, key, bs, T, H, W):
    imgs = jax.random.uniform(key, (bs * T, H, W, 3)) * 2 - 1
    latents = eng.encode_images(params, imgs)
    cond_frames = imgs.reshape(bs, T, H, W, 3)[:, 0]
    cond, _ = eng.build_conditioning(params, cond_frames)
    # per-clip batching: [B, T, ...]
    clipify = lambda x: x.reshape(bs, T, *x.shape[1:])
    cond = jax.tree_util.tree_map(clipify, cond)
    return {"latents": clipify(latents), "cond": cond,
            "guidance_latents": clipify(latents)}


def test_vdm_train_step_single():
    cfg = EngineConfig.tiny(num_frames=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 32)
    state = init_vdm_train_state(eng, params, lr=1e-4)
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 1, 2, 32, 32)
    step = make_vdm_train_step(eng, lr=1e-4)
    state2, scalars = step(state, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(scalars["loss"]))
    # ema moved slightly toward new params
    d = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, state2.ema_params,
                               state2.unet_params), 0.0)
    assert d > 0


def test_vdm_train_step_sharded_8dev():
    mesh = make_virtual_cpu_mesh(8, {"data": 8})
    rules = ShardingRules(mesh)
    cfg = EngineConfig.tiny(num_frames=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 32)
    state = init_vdm_train_state(eng, params, lr=1e-4)
    state = shard_vdm_train_state(state, rules)
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 8, 2, 32, 32)
    batch = shard_batch_for_mesh(batch, rules, 2)
    step = make_vdm_train_step(eng, lr=1e-4, rules=rules)
    state2, scalars = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(scalars["loss"]))
    # params remain replicated, opt state sharded where divisible
    leaf = jax.tree_util.tree_leaves(state2.unet_params)[0]
    assert leaf.sharding.is_fully_replicated
    # step twice to exercise donated buffers
    state3, _ = step(state2, batch, jax.random.PRNGKey(3))
    assert int(state3.step) == 2


def test_frames_axis_sharding_matches_data_only():
    """SURVEY §2.3 frame-axis sequence sharding: a {data:2, frames:4} mesh
    computes the same loss and parameter update as {data:8} — the frames
    axis changes layout (all-to-all at temporal attention), not math."""
    cfg = EngineConfig.tiny(num_frames=4)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 32)
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 2, 4, 32, 32)

    def run(n_dev, axes):
        mesh = make_virtual_cpu_mesh(n_dev, axes)
        rules = ShardingRules(mesh)
        state = shard_vdm_train_state(
            init_vdm_train_state(eng, params, lr=1e-4), rules)
        b = shard_batch_for_mesh(batch, rules, 4)
        step = make_vdm_train_step(eng, lr=1e-4, rules=rules,
                                   guidance_dropout=0.0)
        state2, scalars = step(state, b, jax.random.PRNGKey(2))
        return float(scalars["loss"]), state2.unet_params

    loss_seq, p_seq = run(8, {"data": 2, "frames": 4})
    loss_dp, p_dp = run(2, {"data": 2})
    np.testing.assert_allclose(loss_seq, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_seq),
                    jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fsdp_matches_ddp():
    """FSDP parameter sharding (ShardingRules.fsdp_params) computes the same
    loss and parameter update as replicated DDP — XLA's all-gathers /
    reduce-scatters change layout, not math."""
    cfg = EngineConfig.tiny(num_frames=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 32)
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 8, 2, 32, 32)

    def run(fsdp):
        mesh = make_virtual_cpu_mesh(8, {"data": 8})
        rules = ShardingRules(mesh, fsdp_params=fsdp)
        state = shard_vdm_train_state(
            init_vdm_train_state(eng, params, lr=1e-4), rules)
        b = shard_batch_for_mesh(batch, rules, 2)
        step = make_vdm_train_step(eng, lr=1e-4, rules=rules,
                                   guidance_dropout=0.0)
        state2, scalars = step(state, b, jax.random.PRNGKey(2))
        return float(scalars["loss"]), state2

    loss_f, st_f = run(True)
    loss_d, st_d = run(False)
    np.testing.assert_allclose(loss_f, loss_d, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_f.unet_params),
                    jax.tree_util.tree_leaves(st_d.unet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # a large 2D leaf is actually sharded under FSDP (not silently replicated)
    big = max(jax.tree_util.tree_leaves(st_f.unet_params),
              key=lambda x: x.size)
    assert not big.sharding.is_fully_replicated
    assert not jax.tree_util.tree_leaves(st_f.ema_params)[0] is None
