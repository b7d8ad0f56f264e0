"""LPIPS plumbing tests (random weights — pretrained conversion is gated on
an external torch checkpoint, see ops/lpips.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.lpips import (
    lpips_distance, load_lpips, random_lpips_params, save_lpips)


def test_lpips_properties(tmp_path, rng):
    params = random_lpips_params(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    d_ab = lpips_distance(params, a, b)
    d_aa = lpips_distance(params, a, a)
    assert float(d_aa) < 1e-6
    assert float(d_ab) > float(d_aa)
    # differentiable w.r.t. inputs (used in the novel-view loss)
    g = jax.grad(lambda x: lpips_distance(params, x, b))(a)
    assert np.isfinite(np.asarray(g)).all()

    # save/load roundtrip through the weights file
    p = str(tmp_path / "lpips.npz")
    save_lpips(p, params)
    fn = load_lpips(p)
    assert fn is not None
    np.testing.assert_allclose(float(fn(a, b)), float(d_ab), rtol=1e-5)

    assert load_lpips("/nonexistent.npz") is None
