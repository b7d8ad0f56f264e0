"""Sky-Gaussian specialization (gaussian_model_sky.py) and viewer-format
3DGS PLY export/import (gaussian_model.py:82-157)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.gs.densify import (
    DensifyState, densify_and_prune, sky_extent,
)
from street_crafter_tpu.models.gs.optim import init_adam
from street_crafter_tpu.models.gs.params import init_pool_from_points
from street_crafter_tpu.models.gs.scene import sky_pin
from street_crafter_tpu.utils.gs_ply import (
    export_gaussians_ply, import_gaussians_ply,
)


class _Meta:
    sphere_center = jnp.array([1.0, 2.0, 3.0])
    sphere_radius = jnp.float32(5.0)


def test_sky_pin_pushes_inside_points_out():
    xyz = jnp.array([
        [1.0, 2.0, 4.0],     # 1m from center: inside 2r -> pinned to 10m
        [1.0, 2.0, 33.0],    # 30m: outside 2r -> untouched
    ])
    scaling = jnp.array([[0.1, 0.1, 0.1], [20.0, 1.0, 1.0]])
    out_xyz, out_scale = sky_pin(xyz, scaling, _Meta)
    d = np.linalg.norm(np.asarray(out_xyz) - np.array([1, 2, 3]), axis=-1)
    np.testing.assert_allclose(d[0], 10.0, rtol=1e-5)   # exactly 2r
    np.testing.assert_allclose(np.asarray(out_xyz[1]), [1, 2, 33], atol=1e-6)
    # direction preserved for the pinned point
    assert float(out_xyz[0, 2]) > 3.0 and abs(float(out_xyz[0, 0]) - 1) < 1e-5
    # scale clamp at sphere radius
    np.testing.assert_allclose(np.asarray(out_scale).max(), 5.0)
    assert sky_pin(xyz, scaling, None) == (xyz, scaling)


def test_sky_extent_quantile_clamp():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pool = init_pool_from_points(pts, np.full((100, 3), 0.5, np.float32),
                                 capacity=128)
    # spread of max-scalings 0.005..0.0347 over the 100 valid slots:
    # k = 10 -> lo = asc[9]/pd, hi = asc[90]/pd
    s = np.linspace(np.log(0.005), np.log(0.035), 100).astype(np.float32)
    scaling = np.full((128, 3), -10.0, np.float32)
    scaling[:100] = s[:, None]
    pool = pool.replace(scaling=jnp.asarray(scaling))
    lo = float(np.exp(s[9])) / 0.01
    hi = float(np.exp(s[90])) / 0.01
    # radius inside [lo, hi] -> returned unchanged
    mid = 0.5 * (lo + hi)
    ext = sky_extent(pool, jnp.float32(mid), percent_dense=0.01)
    np.testing.assert_allclose(float(ext), mid, rtol=1e-5)
    # tiny radius: the scale clamp at sphere radius kicks in first
    # (get_scaling property, gaussian_model_sky.py:62-66), collapsing the
    # quantiles to radius/percent_dense
    ext = sky_extent(pool, jnp.float32(0.001), percent_dense=0.01)
    np.testing.assert_allclose(float(ext), 0.1, rtol=1e-4)
    # huge radius -> clamped down to the upper bound
    ext = sky_extent(pool, jnp.float32(1e6), percent_dense=0.01)
    np.testing.assert_allclose(float(ext), hi, rtol=1e-4)


def test_sky_densify_split_children_outside_sphere():
    """Split children of a pinned sky pool sample around the PINNED parent
    position (>= 2r from center), not the raw parameter."""
    rng = np.random.default_rng(1)
    n, cap = 8, 32
    # raw xyz near the center (well inside 2r = 10)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    pool = init_pool_from_points(pts, np.full((n, 3), 0.5, np.float32),
                                 capacity=cap)
    pool = pool.replace(scaling=jnp.full_like(pool.scaling, np.log(0.05)))
    adam = init_adam(pool.trainable_dict())
    g = jnp.where(jnp.arange(cap) < n, 10.0, 0.0)
    state = DensifyState(grad_accum=g, grad_abs_accum=g,
                         denom=jnp.ones(cap), max_radii2d=jnp.zeros(cap))
    center = jnp.zeros(3)
    radius = jnp.float32(5.0)
    new_pool, _, _, info = densify_and_prune(
        pool, adam, state, jax.random.PRNGKey(0), grad_threshold=1.0,
        # tiny percent_dense so everything splits
        percent_dense=1e-6, extent=1.0,
        pin_sphere=(center, radius), use_abs=True)
    assert int(info.n_split) == n
    child = np.asarray(new_pool.xyz)[n:]
    child_valid = np.asarray(new_pool.valid)[n:]
    d = np.linalg.norm(child[child_valid], axis=-1)
    # children sit near the 2r sphere (parent pinned at 10, scale 0.05)
    assert (np.abs(d - 10.0) < 1.0).all()


def _rand_pool(rng, n=20, cap=32, sh_degree=2):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    pool = init_pool_from_points(pts, cols, capacity=cap,
                                 sh_degree=sh_degree)
    # randomize every attribute so the round-trip is non-trivial
    return pool.replace(
        features_rest=jnp.asarray(
            rng.normal(size=pool.features_rest.shape).astype(np.float32)),
        rotation=jnp.asarray(
            rng.normal(size=pool.rotation.shape).astype(np.float32)),
        scaling=jnp.asarray(
            rng.normal(size=pool.scaling.shape).astype(np.float32)))


def test_ply_roundtrip_single(tmp_path):
    rng = np.random.default_rng(0)
    pool = _rand_pool(rng)
    path = tmp_path / "point_cloud.ply"
    export_gaussians_ply(path, pool)
    back = import_gaussians_ply(path, capacity=32)["vertex"]
    assert int(back.num_valid()) == 20
    for attr in ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity"):
        a = np.asarray(getattr(pool, attr))[:20]
        b = np.asarray(getattr(back, attr))[:20]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=attr)


def test_ply_roundtrip_composite(tmp_path):
    rng = np.random.default_rng(1)
    pools = {"bkgd": _rand_pool(rng, n=30), "obj_000": _rand_pool(rng, n=5),
             "sky": _rand_pool(rng, n=8)}
    path = tmp_path / "composite.ply"
    export_gaussians_ply(path, pools)
    back = import_gaussians_ply(path)
    assert set(back) == {"bkgd", "obj_000", "sky"}
    assert int(back["obj_000"].num_valid()) == 5
    np.testing.assert_allclose(np.asarray(back["bkgd"].xyz)[:30],
                               np.asarray(pools["bkgd"].xyz)[:30], atol=1e-6)


def test_ply_header_is_standard_3dgs(tmp_path):
    """External viewers expect the exact attribute list of the INRIA
    layout (construct_list_of_attributes)."""
    rng = np.random.default_rng(2)
    pool = _rand_pool(rng, sh_degree=3)
    path = tmp_path / "p.ply"
    export_gaussians_ply(path, pool)
    header = open(path, "rb").read(4096).split(b"end_header")[0].decode()
    for attr in ("property float x", "property float f_dc_2",
                 "property float f_rest_44", "property float opacity",
                 "property float scale_2", "property float rot_3"):
        assert attr in header, attr
    assert "f_rest_45" not in header  # deg 3: 15 rest coeffs x 3 channels
