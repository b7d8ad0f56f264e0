"""Flash-attention kernel vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.ops.attention import attention_xla
from street_crafter_tpu.ops import flash_attention as FA


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels interpreted on CPU."""
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    yield


def test_flash_matches_xla(rng):
    B, S, H, D = 2, 128, 3, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    out = FA.flash_attention(q, k, v)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_nonsquare_and_padding(rng):
    # seq lengths that don't divide block sizes exercise padding/masking
    B, Sq, Skv, H, D = 1, 100, 75, 2, 64
    q = jnp.asarray(rng.normal(size=(B, Sq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Skv, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Skv, H, D)).astype(np.float32))
    out = FA.flash_attention(q, k, v)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_gradients_match_xla(rng):
    B, S, H, D = 1, 64, 2, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum((FA.flash_attention(q, k, v) - tgt) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum((attention_xla(q, k, v) - tgt) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_gradients_nonsquare_padding(rng):
    # padded q (lse rows) and padded kv (masked cols) in the fused backward
    B, Sq, Skv, H, D = 1, 100, 75, 2, 64
    q = jnp.asarray(rng.normal(size=(B, Sq, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Skv, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Skv, H, D)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B, Sq, H, D)).astype(np.float32))

    gf = jax.grad(lambda *a: jnp.sum((FA.flash_attention(*a) - tgt) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: jnp.sum((attention_xla(*a) - tgt) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_remat_policy_elides_fwd_recompute():
    # save_only_these_names on the per-seq-length names (flash_out_s<S>,
    # flash_lse_s<S>) must drop the backward's flash-forward recompute:
    # grad-of-checkpoint jaxpr has 3 pallas_calls (fwd, dkv, dq) instead
    # of 4 (models/vdm/unet.py remat_policy="flash"/"flash0")
    import jax
    from street_crafter_tpu.ops.flash_attention import flash_attention

    def f(q, k, v):
        o = flash_attention(q, k, v)
        return (o * o).sum()

    q = jnp.ones((2, 256, 2, 64), jnp.float32)

    def count(policy):
        g = jax.grad(lambda q, k, v: jax.checkpoint(f, policy=policy)(q, k, v))
        return str(jax.make_jaxpr(g)(q, q, q)).count("pallas_call")

    assert count(None) == 4
    pol = jax.checkpoint_policies.save_only_these_names(
        "flash_out_s256", "flash_lse_s256")
    assert count(pol) == 3
