import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.params import init_pool_from_points, empty_pool
from street_crafter_tpu.models.gs.scene import (
    SceneParams, SceneMeta, flatten_scene, actor_pose,
)
from street_crafter_tpu.models.gs.renderer import render_scene, render_flat
from street_crafter_tpu.ops import quaternion as Q


def make_scene(rng, num_actors=2, opt_track=False):
    bkgd_pts = rng.uniform(-5, 5, size=(50, 3)).astype(np.float32)
    bkgd_pts[:, 2] += 10
    bkgd = init_pool_from_points(bkgd_pts, rng.uniform(size=(50, 3)), capacity=64)

    # actors: small clusters at canonical origin, stacked pool
    pools = []
    for _ in range(num_actors):
        pts = rng.normal(size=(10, 3)).astype(np.float32) * 0.5
        pools.append(init_pool_from_points(pts, rng.uniform(size=(10, 3)),
                                           capacity=16))
    actors = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pools)

    C, F, A = 1, 4, num_actors
    track_trans = np.zeros((C, F, A, 3), np.float32)
    for f in range(F):
        track_trans[0, f, :, 0] = f * 1.0  # move 1m/frame in +x
        track_trans[0, f, :, 2] = 8.0
    track_quats = np.zeros((C, F, A, 4), np.float32)
    track_quats[..., 0] = 1.0
    meta = SceneMeta(
        track_trans=jnp.asarray(track_trans),
        track_quats=jnp.asarray(track_quats),
        track_valid=jnp.ones((C, F, A), bool),
        timestamps=jnp.asarray(np.linspace(0, 1, F, dtype=np.float32)[None]),
        actor_frame_range=jnp.asarray(
            np.tile(np.array([0.0, F - 1.0], np.float32), (A, 1))),
    )
    params = SceneParams(
        bkgd=bkgd, actors=actors, sky=None,
        opt_trans=jnp.zeros((C, F, A, 3)) if opt_track else None,
        opt_theta=jnp.zeros((C, F, A, 1)) if opt_track else None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None)
    return params, meta


def make_camera():
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    return Camera.from_c2w(np.eye(4, dtype=np.float32), K, 64, 48)


def test_flatten_counts(rng):
    params, meta = make_scene(rng)
    flat = flatten_scene(params, meta, jnp.int32(0), jnp.int32(0),
                         jnp.float32(0))
    assert flat.xyz.shape[0] == 64 + 2 * 16
    assert int(flat.valid.sum()) == 50 + 20


def test_actor_world_transform(rng):
    params, meta = make_scene(rng)
    # at frame 2 actors sit at x=2, z=8
    flat = flatten_scene(params, meta, jnp.int32(0), jnp.int32(2),
                         jnp.float32(2), include_bkgd=False)
    xyz = np.asarray(flat.xyz)[np.asarray(flat.valid)]
    np.testing.assert_allclose(xyz[:, 0].mean(), 2.0, atol=0.5)
    np.testing.assert_allclose(xyz[:, 2].mean(), 8.0, atol=0.5)


def test_actor_pose_residual(rng):
    params, meta = make_scene(rng, opt_track=True)
    params2 = dataclasses.replace(
        params, opt_trans=params.opt_trans.at[0, 1, 0].set(
            jnp.array([0.0, 0.5, 0.0])))
    q, t, v = actor_pose(params2, meta, jnp.int32(0), jnp.int32(1))
    np.testing.assert_allclose(np.asarray(t[0]), [1.0, 0.5, 8.0], atol=1e-6)
    # yaw residual rotates the quaternion
    params3 = dataclasses.replace(
        params, opt_theta=params.opt_theta.at[0, 1, 0, 0].set(np.pi / 2))
    q3, _, _ = actor_pose(params3, meta, jnp.int32(0), jnp.int32(1))
    R = np.asarray(Q.to_matrix(q3[0:1]))[0]
    np.testing.assert_allclose(R @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-5)


def test_pose_interpolation(rng):
    params, meta = make_scene(rng, opt_track=True)
    q, t, v = actor_pose(params, meta, jnp.int32(0), jnp.int32(1),
                         timestamp=jnp.float32(0.5), interpolate=True)
    # midpoint between frame 0 (ts 0) and frame 2 (ts 2/3): alpha=0.75
    np.testing.assert_allclose(float(t[0, 0]), 0.75 * 2.0, atol=1e-5)


def test_render_scene_shapes(rng):
    params, meta = make_scene(rng)
    cam = make_camera()
    out = render_scene(params, meta, cam, frame_idx=1, frame=1.0,
                       max_per_tile=128, tile_size=16)
    assert out["rgb"].shape == (48, 64, 3)
    assert out["acc"].shape == (48, 64)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert float(out["acc"].max()) > 0.05  # something rendered


def test_render_scene_sky_cubemap(rng):
    # single tight cluster so most of the image is empty sky
    pts = (rng.normal(size=(10, 3)) * 0.2).astype(np.float32)
    pts[:, 2] += 10
    bkgd = init_pool_from_points(pts, rng.uniform(size=(10, 3)), capacity=16,
                                 fixed_scale=0.05)
    params = SceneParams(
        bkgd=bkgd, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=jnp.full((6, 8, 8, 3), 0.5), color_corr=None,
        color_corr_sky=None, pose_corr_quat=None, pose_corr_trans=None)
    cam = make_camera()
    out = render_scene(params, None, cam, frame_idx=0, frame=0.0,
                       include_obj=False, max_per_tile=16)
    rgb = np.asarray(out["rgb"])
    acc = np.asarray(out["acc"])
    empty = acc < 0.01
    assert empty.any() and (~empty).any()
    np.testing.assert_allclose(rgb[empty], 0.5, atol=1e-2)


def test_render_differentiable_wrt_viewspace(rng):
    params, meta = make_scene(rng)
    cam = make_camera()
    n_total = 64 + 2 * 16

    def loss(vz):
        out = render_scene(params, meta, cam, frame_idx=0, frame=0.0,
                           max_per_tile=64, viewspace_zero=vz)
        return jnp.sum(out["rgb"])

    g = jax.grad(loss)(jnp.zeros((n_total, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_color_correction_applied(rng):
    params, meta = make_scene(rng)
    cc = jnp.tile(jnp.concatenate([jnp.eye(3) * 0.5, jnp.full((3, 1), 0.1)], 1)[None],
                  (1, 1, 1))
    params = dataclasses.replace(params, color_corr=cc)
    cam = make_camera()
    out_cc = render_scene(params, meta, cam, frame_idx=0, frame=0.0,
                          max_per_tile=64, image_idx=0)
    params_plain = dataclasses.replace(params, color_corr=None)
    out = render_scene(params_plain, meta, cam, frame_idx=0, frame=0.0,
                       max_per_tile=64)
    np.testing.assert_allclose(np.asarray(out_cc["rgb"]),
                               np.asarray(out["rgb"]) * 0.5 + 0.1, atol=1e-5)


def test_color_mlp_mode(rng):
    """use_mlp color correction (color_correction.py:30-58,117-127):
    zero-init output => identity at start; perturbed weights change rgb as
    a pose-dependent affine; params get gradients."""
    from street_crafter_tpu.models.gs.color_mlp import (apply_color_mlp,
                                                        init_color_mlp)
    params, meta = make_scene(rng)
    mlp = init_color_mlp(jax.random.PRNGKey(0))
    params_mlp = dataclasses.replace(params, color_mlp=mlp)
    cam = make_camera()
    out0 = render_scene(params, meta, cam, frame_idx=0, frame=0.0,
                        max_per_tile=64)
    out_mlp = render_scene(params_mlp, meta, cam, frame_idx=0, frame=0.0,
                           max_per_tile=64)
    # zero-init last layer: identity correction
    np.testing.assert_allclose(np.asarray(out_mlp["rgb"]),
                               np.asarray(out0["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_mlp["cc_mat"]),
                               np.concatenate([np.eye(3), np.zeros((3, 1))],
                                              1), atol=1e-6)
    # perturb the output layer: becomes an affine map of the base render
    mlp2 = dict(mlp)
    mlp2["w3"] = mlp["w3"] + 0.0  # keep zero weight, set bias instead
    mlp2["b3"] = jnp.asarray(
        np.concatenate([np.eye(3).reshape(-1) * 0.5 - np.eye(3).reshape(-1),
                        np.full(3, 0.1)]).astype(np.float32)
        [np.argsort(np.arange(12))])  # layout check below instead
    cc = apply_color_mlp(mlp2, jnp.asarray(cam.w2c))
    params_mlp2 = dataclasses.replace(params, color_mlp=mlp2)
    out2 = render_scene(params_mlp2, meta, cam, frame_idx=0, frame=0.0,
                        max_per_tile=64)
    expect = np.einsum("hwc,dc->hwd", np.asarray(out0["rgb"]),
                       np.asarray(cc[:, :3])) + np.asarray(cc[:, 3])
    np.testing.assert_allclose(np.asarray(out2["rgb"]), expect, atol=1e-5)

    # gradients reach the MLP weights
    def loss(mlp):
        p = dataclasses.replace(params, color_mlp=mlp)
        out = render_scene(p, meta, cam, frame_idx=0, frame=0.0,
                           max_per_tile=64)
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss)(mlp2)
    assert float(jnp.abs(g["b3"]).sum()) > 0
    assert float(jnp.abs(g["w0"]).sum()) >= 0  # relu path may gate w0


def test_color_mlp_trainer_misc_flatten():
    from street_crafter_tpu.training.gs_trainer import (_misc_params,
                                                        _unflatten_misc)
    from street_crafter_tpu.models.gs.color_mlp import init_color_mlp
    import street_crafter_tpu.models.gs.scene as S
    mlp = init_color_mlp(jax.random.PRNGKey(0))
    params = S.SceneParams(
        bkgd=None, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None, color_mlp=mlp)
    flat = _misc_params(params)
    assert "color_mlp.w0" in flat and "color_mlp.b3" in flat
    back = _unflatten_misc(flat)
    assert set(back["color_mlp"].keys()) == set(mlp.keys())
