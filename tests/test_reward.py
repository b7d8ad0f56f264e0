"""Ensemble reward estimation (runner/reward.py) — variance->reward math
vs closed form, tiny-engine integration, and the sample loaders
(reward.py / reward_utils.py:285-341 semantics)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.runner.reward import (
    ensemble_reward, get_sample, load_reward_image, reward_from_samples)


def test_reward_from_samples_closed_form():
    # identical members -> zero variance -> reward 1
    s = jnp.broadcast_to(jnp.arange(6.0).reshape(2, 3), (4, 2, 3))
    assert float(reward_from_samples(s)) == pytest.approx(1.0)
    # two members differing by 2d everywhere: unbiased var = 2d^2
    d = 0.5
    base = jnp.zeros((2, 3))
    s2 = jnp.stack([base - d, base + d])
    assert float(reward_from_samples(s2)) == pytest.approx(
        np.exp(-2 * d * d), rel=1e-5)


@pytest.fixture(scope="module")
def tiny_engine():
    from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                      VideoDiffusionEngine)
    cfg = EngineConfig.tiny(num_frames=3, num_steps=3)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), height=32, width=32)
    return eng, params


def test_ensemble_reward_tiny(tiny_engine):
    eng, params = tiny_engine
    T, H, W = eng.cfg.num_frames, 32, 32
    images = jax.random.uniform(jax.random.PRNGKey(1), (T, H, W, 3)) * 2 - 1
    reward, samples = ensemble_reward(
        eng, params, images, jax.random.PRNGKey(2), ensemble_size=3,
        num_steps=3)
    assert samples.shape[0] == 3 and samples.shape[1] == T
    r = float(reward)
    assert np.isfinite(r) and 0.0 < r <= 1.0
    # frame 0 pinned to the real latent across the ensemble (:330)
    z0 = eng.encode_images_chunked(params, images)[0]
    for e in range(3):
        np.testing.assert_allclose(np.asarray(samples[e, 0]),
                                   np.asarray(z0), atol=1e-5)
    # deterministic in the key
    reward2, _ = ensemble_reward(
        eng, params, images, jax.random.PRNGKey(2), ensemble_size=3,
        num_steps=3)
    assert float(reward2) == pytest.approx(r, abs=1e-6)


def test_get_sample_img_mode(tmp_path):
    for i in range(3):
        from PIL import Image
        Image.new("RGB", (8, 6)).save(tmp_path / f"im{i}.png")
    paths, idx, n, action = get_sample(4, "IMG", str(tmp_path),
                                       num_frames=5)
    assert n == 3 and idx == 1 and len(paths) == 5
    assert action is None and paths[0].endswith("im1.png")


def test_get_sample_nuscenes_actions(tmp_path):
    anno = [{"frames": [f"f{i}.png" for i in range(4)],
             "traj": [0, 0, 1, 2, 3, 4], "cmd": 2,
             "speed": [5, 6, 7], "angle": [78, 156],
             "z": 1.0, "goal": [800, 450]}]
    af = tmp_path / "anno.json"
    af.write_text(json.dumps(anno))
    paths, _, _, action = get_sample(0, "NUSCENES", str(tmp_path), str(af),
                                     num_frames=4, action_mode="traj")
    assert len(paths) == 4
    np.testing.assert_array_equal(action["trajectory"], [1, 2, 3, 4])
    _, _, _, a2 = get_sample(0, "NUSCENES", str(tmp_path), str(af),
                             num_frames=4, action_mode="steer")
    # reference slices off the first entry (reward.py:155-158)
    np.testing.assert_allclose(a2["angle"], [156 / 780])
    np.testing.assert_array_equal(a2["speed"], [6, 7])
    _, _, _, a3 = get_sample(0, "NUSCENES", str(tmp_path), str(af),
                             num_frames=4, action_mode="goal")
    np.testing.assert_allclose(a3["goal"], [0.5, 0.5])


def test_load_reward_image_center_crop(tmp_path):
    from PIL import Image
    # 20x10 image, left half black right half white; crop to square keeps
    # the CENTER (both colors), not an edge
    arr = np.zeros((10, 20, 3), np.uint8)
    arr[:, 10:] = 255
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = load_reward_image(str(p), 8, 8)
    assert out.shape == (8, 8, 3)
    assert out.min() < -0.9 and out.max() > 0.9
