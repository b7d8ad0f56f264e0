"""Random-feature LPIPS stand-in (optim.lpips_fallback, VERDICT r3 weak #5).

Real VGG weights are environment-blocked (zero egress), so distillation
rehearsals trained without the lambda_novel_lpips=1.0 term that DOMINATES
the reference's novel-view loss (train.py:183-189). The seeded
random-feature stand-in restores a multi-scale perceptual-style gradient;
these tests pin down that it (a) behaves like a perceptual distance
(zero at identity, monotone in perturbation strength, sensitive to
structure, not just pixels), (b) is differentiable, and (c) is wired into
the loss assembly and the runner's resolution logic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.ops.lpips import random_feature_lpips


@pytest.fixture(scope="module")
def lpips_fn():
    return random_feature_lpips(seed=0)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (48, 64, 3)).astype(np.float32)
    # smooth it so blur/noise perturbations act on real structure
    k = np.ones((5, 5, 1)) / 25.0
    from scipy.signal import convolve  # scipy is available via jax deps
    return np.stack([convolve(base[..., c], k[..., 0], mode="same")
                     for c in range(3)], -1).astype(np.float32)


def test_identity_and_monotone(lpips_fn, img):
    a = jnp.asarray(img)
    assert float(lpips_fn(a, a)) < 1e-6
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(img.shape).astype(np.float32)
    dists = [float(lpips_fn(a, jnp.asarray(img + s * noise)))
             for s in (0.02, 0.05, 0.1, 0.2)]
    assert all(d > 0 for d in dists)
    assert dists == sorted(dists), f"not monotone: {dists}"


def test_structure_sensitivity(lpips_fn, img):
    """A spatial shuffle at equal pixel-histogram should read farther than
    a small brightness shift — the multi-scale convs see structure."""
    a = jnp.asarray(img)
    shift = jnp.asarray(np.clip(img + 0.03, 0, 1))
    rng = np.random.default_rng(2)
    perm = rng.permutation(img.shape[0] * img.shape[1])
    shuffled = img.reshape(-1, 3)[perm].reshape(img.shape)
    d_shift = float(lpips_fn(a, shift))
    d_shuffle = float(lpips_fn(a, jnp.asarray(shuffled)))
    assert d_shuffle > 3 * d_shift, (d_shuffle, d_shift)


def test_differentiable(lpips_fn, img):
    a = jnp.asarray(img)
    g = jax.grad(lambda x: lpips_fn(x, a))(a + 0.05)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_loss_assembly_uses_fallback(lpips_fn, img):
    from street_crafter_tpu.models.gs.losses import photometric_loss
    a = jnp.asarray(img)
    b = jnp.asarray(np.clip(img + 0.1, 0, 1))
    mask = jnp.ones(img.shape[:2] + (1,))
    with_l, sc = photometric_loss(a, b, mask, 1.0, 0.2, 1.0,
                                  lpips_fn=lpips_fn)
    without_l, _ = photometric_loss(a, b, mask, 1.0, 0.2, 1.0,
                                    lpips_fn=None)
    assert "lpips" in sc and float(sc["lpips"]) > 0
    assert float(with_l) > float(without_l)


def test_runner_resolves_fallback(tmp_path):
    """optim.lpips_fallback=random_features resolves a usable lpips_fn in
    the runner guard (runner/train.py) without real weights."""
    from street_crafter_tpu.config import default_config
    cfg = default_config()
    cfg.optim.lambda_novel_lpips = 1.0
    cfg.optim.lpips_weights = ""
    cfg.optim.lpips_fallback = "random_features"

    # replicate the runner's resolution logic without building a scene
    from street_crafter_tpu.ops.lpips import load_lpips
    fn = load_lpips(cfg.optim.get("lpips_weights") or None)
    assert fn is None
    assert cfg.optim.get("lpips_fallback") == "random_features"
    fn = random_feature_lpips()
    x = jnp.ones((16, 16, 3)) * 0.5
    assert float(fn(x, x * 0.8)) > 0
