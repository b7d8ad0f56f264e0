"""LPIPS perceptual distance (VGG16 variant).

Replaces street_gaussian/utils/lpipsPyTorch (vendored VGG LPIPS used at
train.py:188 and novel-view loss :172). Architecture implemented natively in
JAX; the pretrained VGG16 + linear-head weights are converted once from a
torch ``lpips`` checkpoint (state_dict .pth) via ``convert_lpips_torch`` —
this environment has no network egress, so, like the reference (which
downloads weights at runtime), the metric activates only when a weights file
is provided. Without weights, training runs with lambda_lpips = 0.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG16 = [(64, False), (64, False),
          (128, True), (128, False),
          (256, True), (256, False), (256, False),
          (512, True), (512, False), (512, False),
          (512, True), (512, False), (512, False)]
# feature taps after these conv indices (relu1_2 .. relu5_3)
_TAPS = [1, 3, 6, 9, 12]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _vgg_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """x: [N, H, W, 3] in [-1, 1] (lpips scaling layer applied)."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, pool) in enumerate(_VGG16):
        if pool:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        if i in _TAPS:
            feats.append(h)
    return feats


def lpips_distance(params: dict, a: jax.Array, b: jax.Array) -> jax.Array:
    """Mean LPIPS over a batch. a, b: [N, H, W, 3] or [H, W, 3] in [0, 1]."""
    if a.ndim == 3:
        a, b = a[None], b[None]
    a = a * 2.0 - 1.0
    b = b * 2.0 - 1.0
    fa = _vgg_features(params, a)
    fb = _vgg_features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.maximum(
            jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
        nb = xb / jnp.maximum(
            jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
        d = (na - nb) ** 2
        w = params[f"lin{i}_w"]  # [C] non-negative per-channel weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def convert_lpips_torch(vgg_state: dict, lin_state: dict) -> dict:
    """Convert torch state dicts (torchvision vgg16.features.* and lpips
    lin[0-4].model.1.weight) to the param dict used here."""
    params = {}
    conv_idx = 0
    layer = 0
    while conv_idx < len(_VGG16):
        wkey = f"features.{layer}.weight"
        if wkey in vgg_state:
            w = np.asarray(vgg_state[wkey], np.float32)
            b = np.asarray(vgg_state[f"features.{layer}.bias"], np.float32)
            params[f"conv{conv_idx}_w"] = w.transpose(2, 3, 1, 0)  # OIHW->HWIO
            params[f"conv{conv_idx}_b"] = b
            conv_idx += 1
        layer += 1
        if layer > 40:
            break
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lin_state:
                w = np.asarray(lin_state[key], np.float32)  # [1, C, 1, 1]
                params[f"lin{i}_w"] = w.reshape(-1)
                break
    return params


def save_lpips(path: str, params: dict) -> None:
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in params.items()})


def load_lpips(path: str | None = None) -> Callable | None:
    """Returns lpips(a, b) -> scalar, or None when no weights are available
    (callers fall back to lambda_lpips = 0)."""
    if path is None:
        path = os.environ.get("SCT_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    params = {k: jnp.asarray(data[k]) for k in data.files}
    return lambda a, b: lpips_distance(params, a, b)


def random_feature_lpips(seed: int = 0) -> Callable:
    """Deterministic random-feature LPIPS stand-in (optim.lpips_fallback).

    The reference's novel-view loss is DOMINATED by lambda_novel_lpips=1.0
    (train.py:183-189) and real VGG weights are environment-blocked here.
    Training with the term silently dropped is a materially different
    objective; this stand-in restores a multi-scale perceptual-style
    gradient using the same VGG16 topology with seeded random filters —
    random convolutional features are a known usable perceptual distance
    (they preserve texture/structure sensitivity; only the learned linear
    calibration is lost). NOT the reference objective: swap in converted
    weights (convert_lpips_torch) for parity runs."""
    params = random_lpips_params(jax.random.PRNGKey(seed))
    return lambda a, b: lpips_distance(params, a, b)


def random_lpips_params(key: jax.Array) -> dict:
    """Random-weight instance (random_feature_lpips and plumbing tests)."""
    params = {}
    cin = 3
    keys = jax.random.split(key, len(_VGG16) + 5)
    for i, (cout, _) in enumerate(_VGG16):
        params[f"conv{i}_w"] = jax.random.normal(
            keys[i], (3, 3, cin, cout)) * 0.05
        params[f"conv{i}_b"] = jnp.zeros((cout,))
        cin = cout
    taps_c = [_VGG16[t][0] for t in _TAPS]
    for i, c in enumerate(taps_c):
        params[f"lin{i}_w"] = jax.nn.softplus(
            jax.random.normal(keys[len(_VGG16) + i], (c,))) * 0.01
    return params
