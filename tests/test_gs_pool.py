import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.models.gs import (
    init_pool_from_points, init_densify_state, accumulate_stats,
    densify_and_prune, reset_opacity, init_adam, adam_update,
)
from street_crafter_tpu.models.gs.densify import DensifyState
from street_crafter_tpu.ops.sh import sh_to_rgb


def make_pool(rng, n=16, cap=64):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_pool_from_points(pts, cols, capacity=cap), pts, cols


def test_init_from_points(rng):
    pool, pts, cols = make_pool(rng)
    assert int(pool.num_valid()) == 16
    np.testing.assert_allclose(np.asarray(pool.xyz[:16]), pts, atol=1e-6)
    # DC features decode back to input colors
    rgb = np.asarray(sh_to_rgb(pool.features_dc[:16, 0]))
    np.testing.assert_allclose(rgb, cols, atol=1e-5)
    # opacity activation = 0.1
    np.testing.assert_allclose(np.asarray(pool.get_opacity()[:16, 0]), 0.1,
                               atol=1e-5)
    # scales are finite logs
    assert np.isfinite(np.asarray(pool.scaling[:16])).all()


def test_adam_moves_params(rng):
    pool, _, _ = make_pool(rng)
    params = pool.trainable_dict()
    adam = init_adam(params)
    grads = {k: jnp.ones_like(v) for k, v in params.items()}
    lrs = {k: jnp.float32(0.01) for k in params}
    new_params, adam2 = adam_update(params, grads, adam, lrs,
                                    update_mask=pool.valid)
    # valid rows moved, invalid rows untouched
    dx = np.asarray(new_params["xyz"] - params["xyz"])
    assert np.abs(dx[:16]).min() > 0
    np.testing.assert_allclose(dx[16:], 0.0)
    assert int(adam2.count) == 1


def test_densify_clone(rng):
    pool, _, _ = make_pool(rng, n=8, cap=32)
    # small scales => clone path
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, -5.0))
    adam = init_adam(pool.trainable_dict())
    cap = pool.capacity
    g = jnp.where(jnp.arange(cap) < 4, 10.0, 0.0)
    state = DensifyState(
        grad_accum=g, grad_abs_accum=g,
        denom=jnp.ones(cap), max_radii2d=jnp.zeros(cap))
    new_pool, _, _, info = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0),
        grad_threshold=1.0, percent_dense=0.01, extent=10.0,
        min_opacity=0.005)
    assert int(info.n_cloned) == 4 and int(info.n_split) == 0
    assert int(info.n_valid) == 12
    # clones replicate parent positions
    xyz = np.asarray(new_pool.xyz)
    valid = np.asarray(new_pool.valid)
    for i in range(4):
        matches = (np.abs(xyz[valid] - xyz[i]) < 1e-6).all(-1).sum()
        assert matches == 2  # parent + clone


def test_densify_split(rng):
    pool, _, _ = make_pool(rng, n=8, cap=32)
    # large scales => split path
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, 1.0))
    adam = init_adam(pool.trainable_dict())
    cap = pool.capacity
    g = jnp.where(jnp.arange(cap) < 3, 10.0, 0.0)
    state = DensifyState(
        grad_accum=g, grad_abs_accum=g,
        denom=jnp.ones(cap), max_radii2d=jnp.zeros(cap))
    new_pool, _, _, info = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0),
        grad_threshold=1.0, percent_dense=0.01, extent=10.0)
    assert int(info.n_split) == 3
    # 8 - 3 parents + 6 children = 11
    assert int(info.n_valid) == 11
    # children have scale / 1.6
    sc = np.asarray(jnp.exp(new_pool.scaling))
    valid = np.asarray(new_pool.valid)
    child_scales = sc[valid & (np.asarray(new_pool.valid) & (np.arange(cap) >= 8))]
    np.testing.assert_allclose(child_scales, np.exp(1.0) / 1.6, rtol=1e-5)


def test_densify_prune_low_opacity(rng):
    pool, _, _ = make_pool(rng, n=8, cap=16)
    op = pool.opacity.at[:4].set(-10.0)  # sigmoid ~ 0
    pool = pool.replace(opacity=op)
    adam = init_adam(pool.trainable_dict())
    state = init_densify_state(pool.capacity)
    new_pool, _, _, info = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0),
        grad_threshold=100.0, percent_dense=0.01, extent=10.0,
        min_opacity=0.05)
    assert int(info.n_pruned) == 4
    assert int(info.n_valid) == 4


def test_capacity_overflow_drops_children(rng):
    pool, _, _ = make_pool(rng, n=8, cap=9)  # only one free slot
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, -5.0))
    adam = init_adam(pool.trainable_dict())
    cap = pool.capacity
    state = DensifyState(
        grad_accum=jnp.full((cap,), 10.0),
        grad_abs_accum=jnp.full((cap,), 10.0), denom=jnp.ones(cap),
        max_radii2d=jnp.zeros(cap))
    new_pool, _, _, info = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0),
        grad_threshold=1.0, percent_dense=0.01, extent=10.0)
    assert int(info.n_cloned) == 1  # only the first candidate fits
    assert int(info.n_valid) == 9


def test_accumulate_stats():
    state = init_densify_state(4)
    grads = jnp.array([[3.0, 4.0], [1.0, 0.0], [0, 0], [5, 12]])
    vis = jnp.array([True, True, False, True])
    radii = jnp.array([1.0, 2.0, 3.0, 4.0])
    state = accumulate_stats(state, grads, vis, radii,
                             viewspace_absgrad=2.0 * grads)
    np.testing.assert_allclose(np.asarray(state.grad_accum), [5, 1, 0, 13])
    np.testing.assert_allclose(np.asarray(state.grad_abs_accum),
                               [10, 2, 0, 26])
    np.testing.assert_allclose(np.asarray(state.denom), [1, 1, 0, 1])
    np.testing.assert_allclose(np.asarray(state.max_radii2d), [1, 2, 0, 4])


def test_reset_opacity(rng):
    pool, _, _ = make_pool(rng)
    adam = init_adam(pool.trainable_dict())
    adam = adam_update(pool.trainable_dict(),
                       {k: jnp.ones_like(v) for k, v in pool.trainable_dict().items()},
                       adam, {k: jnp.float32(0.01) for k in pool.trainable_dict()})[1]
    pool2, adam2 = reset_opacity(pool, adam, value=0.01)
    assert float(pool2.get_opacity()[:16].max()) <= 0.0101
    np.testing.assert_allclose(np.asarray(adam2.m["opacity"]), 0.0)
    # other moments untouched
    assert float(jnp.abs(adam2.m["xyz"]).sum()) > 0
