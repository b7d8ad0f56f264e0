"""Camera-parallel rendering over the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.datasets.cameras import Camera
from street_crafter_tpu.models.gs.batch_render import (make_sharded_renderer,
                                                       stack_cameras)
from street_crafter_tpu.models.gs.params import init_pool_from_points
from street_crafter_tpu.models.gs.renderer import render_scene
from street_crafter_tpu.models.gs.scene import SceneParams
from street_crafter_tpu.parallel import make_mesh


def _scene(rng, n=512):
    pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    pts[:, 2] += 8
    pool = init_pool_from_points(pts, rng.uniform(size=(n, 3)).astype(np.float32),
                                 capacity=n, fixed_scale=0.1,
                                 init_opacity=0.8)
    return SceneParams(bkgd=pool, actors=None, sky=None, opt_trans=None,
                       opt_theta=None, sky_cubemap=None, color_corr=None,
                       color_corr_sky=None, pose_corr_quat=None,
                       pose_corr_trans=None)


def test_sharded_render_matches_single(rng):
    params = _scene(rng)
    H, W = 32, 32
    K = np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]], np.float32)
    cams = []
    for i in range(8):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.2 * i
        cams.append(Camera.from_c2w(c2w, K, W, H, frame=i, cam=0))

    mesh = make_mesh({"data": 8})
    render_batch = make_sharded_renderer(mesh, W, H, sh_degree=1,
                                         max_per_tile=64)
    batch, (h, w) = stack_cameras(cams)
    out = render_batch(params, None, batch)
    assert out["rgb"].shape == (8, H, W, 3)

    # matches the single-camera renderer per view
    ref = render_scene(params, None, cams[3], sh_degree=1, max_per_tile=64,
                       interpolate_pose=True, clamp=True)
    np.testing.assert_allclose(np.asarray(out["rgb"][3]),
                               np.asarray(ref["rgb"]), atol=1e-5)
    # output actually sharded over devices
    shards = out["rgb"].sharding
    assert len(shards.device_set) == 8
