"""Mesh-sharded sampling (parallel/sample.py) vs the single-device sampler.

The frames-axis SP design used by the fine-tune step applies unchanged at
inference; sharded and unsharded sampling must produce the same frames
(same params, same key) up to compiler-reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                  VideoDiffusionEngine)
from street_crafter_tpu.parallel import make_virtual_cpu_mesh, sample_on_mesh


@pytest.fixture(scope="module")
def engine_and_params():
    cfg = EngineConfig.tiny(num_frames=4, num_steps=3)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), height=32, width=32)
    return eng, params


def _inputs(T, H, W):
    k = jax.random.split(jax.random.PRNGKey(7), 3)
    guide = jax.random.uniform(k[0], (T, H, W, 3)) * 2 - 1
    cond = jax.random.uniform(k[1], (1, H, W, 3)) * 2 - 1
    render = jax.random.uniform(k[2], (T, H, W, 3)) * 2 - 1
    return guide, cond, render


@pytest.mark.parametrize("axes", [{"frames": 4, "data": 2},
                                  {"frames": 2, "data": 4}])
def test_sharded_sample_matches_single(engine_and_params, axes):
    eng, params = engine_and_params
    T, H, W = eng.cfg.num_frames, 32, 32
    guide, cond, _ = _inputs(T, H, W)
    key = jax.random.PRNGKey(3)

    ref = np.asarray(eng.sample(params, key, guide, cond), np.float32)

    mesh = make_virtual_cpu_mesh(8, axes)
    out = np.asarray(
        sample_on_mesh(eng, params, key, guide, cond, mesh=mesh), np.float32)
    assert out.shape == (T, H, W, 3)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_sharded_sds_sample(engine_and_params):
    eng, params = engine_and_params
    T, H, W = eng.cfg.num_frames, 32, 32
    guide, cond, render = _inputs(T, H, W)
    key = jax.random.PRNGKey(5)

    ref = np.asarray(eng.sample(params, key, guide, cond,
                                render_images=render, sds_scale=0.5),
                     np.float32)
    mesh = make_virtual_cpu_mesh(8, {"frames": 4, "data": 2})
    out = np.asarray(
        sample_on_mesh(eng, params, key, guide, cond, mesh=mesh,
                       render_images=render, sds_scale=0.5), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_runner_dispatch_matches(engine_and_params):
    """DiffusionRunner._sample with a mesh equals the single-device path."""
    from street_crafter_tpu.runner.diffusion import DiffusionRunner
    eng, params = engine_and_params
    T, H, W = eng.cfg.num_frames, 32, 32
    guide, cond, _ = _inputs(T, H, W)
    key = jax.random.PRNGKey(11)
    mesh = make_virtual_cpu_mesh(8, {"frames": 4, "data": 2})
    single = DiffusionRunner(None, eng, params, height=H, width=W)
    sharded = DiffusionRunner(None, eng, params, height=H, width=W,
                              mesh=mesh)
    a = np.asarray(single._sample(key, guide, cond, None, None), np.float32)
    b = np.asarray(sharded._sample(key, guide, cond, None, None), np.float32)
    np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)


def test_sampling_mesh_from_cfg_gating():
    from street_crafter_tpu.config.config import Config
    from street_crafter_tpu.runner.diffusion import sampling_mesh_from_cfg
    cfg = Config(dict(
        diffusion=dict(shard_sample=False),
        mesh=dict(axes=dict(data=2, frames=4))))
    assert sampling_mesh_from_cfg(cfg) is None
    cfg2 = Config(dict(
        diffusion=dict(shard_sample=True),
        mesh=dict(axes=dict(data=2, frames=4))))
    mesh = sampling_mesh_from_cfg(cfg2)
    assert mesh is not None and mesh.shape["frames"] == 4


def test_indivisible_frames_axis_rejected(engine_and_params):
    eng, params = engine_and_params
    T, H, W = eng.cfg.num_frames, 32, 32
    guide, cond, _ = _inputs(T, H, W)
    mesh = make_virtual_cpu_mesh(8, {"frames": 8})  # T=4 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sample_on_mesh(eng, params, jax.random.PRNGKey(0), guide, cond,
                       mesh=mesh)
