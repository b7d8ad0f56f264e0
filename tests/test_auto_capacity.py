"""Auto-sized coarse capacity (VERDICT r2 #4): pick_coarse_capacity buckets
+ drop-free rendering at the picked capacity on a dense scene."""

import numpy as np

import jax.numpy as jnp

from street_crafter_tpu.ops.gs_raster import pick_coarse_capacity


def test_pick_coarse_capacity_buckets():
    assert pick_coarse_capacity(0) == 2048
    assert pick_coarse_capacity(100) == 2048
    # headroom 1.1 pushes 1900 past one bucket
    assert pick_coarse_capacity(1900) == 4096
    assert pick_coarse_capacity(3000) == 4096
    # the chunked phase-1 kernel (run_compact_chunked) removed the old
    # 4096 Mosaic scoped-VMEM clamp: bucket arithmetic now runs through
    # dense-scene classes — ceil(38351*1.1 / 2048)*2048 = 21*2048 = 43008
    assert pick_coarse_capacity(3900) == 6144
    assert pick_coarse_capacity(38351) == 21 * 2048
    # the remaining cap is the train path's bf16-exact index limit
    assert pick_coarse_capacity(10 ** 6) == 65536
    assert pick_coarse_capacity(10 ** 6, cap=49152) == 49152  # explicit
    assert pick_coarse_capacity(3000, headroom=1.0) == 4096


def test_auto_capacity_drop_free():
    """A dense cluster overflows kc=512; the picked capacity renders it
    with zero coarse drops and matches the exact-select reference."""
    from street_crafter_tpu.datasets import Camera
    from street_crafter_tpu.models.gs.params import init_pool_from_points
    from street_crafter_tpu.models.gs.renderer import render_flat

    rng = np.random.default_rng(0)
    n = 3000
    # all points inside one coarse tile's frustum -> per-tile count ~ n
    pts = np.stack([rng.normal(0, 0.3, n), rng.normal(0, 0.3, n),
                    rng.uniform(4, 6, n)], -1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    pool = init_pool_from_points(pts, cols, capacity=n, fixed_scale=0.02,
                                 init_opacity=0.6)
    from bench import flat_from_pool
    flat = flat_from_pool(pool)

    H, W = 128, 128
    K = np.array([[140.0, 0, 64], [0, 140.0, 64], [0, 0, 1]], np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)

    def render(kc, select="approx", stats=False):
        return render_flat(
            flat, jnp.asarray(cam.w2c), jnp.asarray(K), cam.camera_center,
            W, H, sh_degree=0, method="fused", max_per_coarse=kc,
            select_method=select, with_stats=stats)

    probe = render(512, stats=True)["raster_stats"]
    cmax = int(probe["coarse_max"])
    assert cmax > 512, "test scene must overflow the small capacity"
    assert int(probe["coarse_dropped"]) > 0

    kc = pick_coarse_capacity(cmax)
    assert kc >= cmax
    out = render(kc, stats=True)
    assert int(out["raster_stats"]["coarse_dropped"]) == 0

    ref = np.asarray(render(kc, select="exact")["rgb"])
    got = np.asarray(out["rgb"])
    mse = float(np.mean((ref - got) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, psnr
