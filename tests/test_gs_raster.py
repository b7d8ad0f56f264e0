import jax
import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.gs_projection import project_gaussians, EPS2D
from street_crafter_tpu.ops.gs_raster import rasterize_pixels, ALPHA_MIN, ALPHA_CLAMP


# ---------------------------------------------------------------- projection

def test_projection_isotropic_center():
    # isotropic gaussian on the optical axis: cov2d = (f*s/z)^2 I + eps I
    s, z, f = 0.1, 4.0, 100.0
    K = jnp.array([[f, 0, 32], [0, f, 24], [0, 0, 1]])
    proj = project_gaussians(
        means=jnp.array([[0.0, 0.0, z]]),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        scales=jnp.full((1, 3), s),
        w2c=jnp.eye(4), K=K, width=64, height=48)
    assert bool(proj.valid[0])
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [32, 24], atol=1e-4)
    np.testing.assert_allclose(float(proj.depths[0]), z, atol=1e-5)
    var = (f * s / z) ** 2 + EPS2D
    # conic = inverse of diagonal cov
    np.testing.assert_allclose(np.asarray(proj.conics[0]),
                               [1 / var, 0, 1 / var], rtol=1e-4)
    # radius = ceil(3 * sqrt(var))
    assert float(proj.radii[0]) == np.ceil(3 * np.sqrt(var))
    # compensation = sqrt(det_orig / det_blur)
    var0 = (f * s / z) ** 2
    np.testing.assert_allclose(float(proj.compensations[0]),
                               var0 / var, rtol=1e-4)


def test_projection_culling():
    K = jnp.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    proj = project_gaussians(
        means=jnp.array([[0, 0, -5.0], [0, 0, 5.0], [100.0, 0, 5.0]]),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)),
        scales=jnp.full((3, 3), 0.05),
        w2c=jnp.eye(4), K=K, width=64, height=48)
    assert not bool(proj.valid[0])  # behind camera
    assert bool(proj.valid[1])
    assert not bool(proj.valid[2])  # far outside frustum
    assert float(proj.radii[0]) == 0.0


def test_projection_anisotropic_rotation_invariance(rng):
    # rotating an isotropic gaussian must not change its projection
    K = jnp.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]])
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    common = dict(means=jnp.array([[0.3, -0.2, 3.0]]),
                  scales=jnp.full((1, 3), 0.07),
                  w2c=jnp.eye(4), K=K, width=64, height=48)
    p1 = project_gaussians(quats=jnp.array([[1.0, 0, 0, 0]]), **common)
    p2 = project_gaussians(quats=jnp.asarray(q[None]), **common)
    np.testing.assert_allclose(np.asarray(p1.conics), np.asarray(p2.conics),
                               rtol=1e-4)


# ---------------------------------------------------------------- rasterizer

def oracle_rasterize(means2d, conics, colors, opacities, depths, valid, H, W):
    """Exact per-pixel sequential alpha compositing over depth-sorted order."""
    order = np.argsort(depths, kind="stable")
    C = colors.shape[-1]
    img = np.zeros((H, W, C), np.float32)
    acc = np.zeros((H, W), np.float32)
    for iy in range(H):
        for ix in range(W):
            T = 1.0
            for i in order:
                if not valid[i]:
                    continue
                dx = ix + 0.5 - means2d[i, 0]
                dy = iy + 0.5 - means2d[i, 1]
                a, b, c = conics[i]
                sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                if sigma < 0:
                    continue
                alpha = min(ALPHA_CLAMP, opacities[i] * np.exp(-sigma))
                if alpha < ALPHA_MIN:
                    continue
                img[iy, ix] += T * alpha * colors[i]
                T *= 1.0 - alpha
            acc[iy, ix] = 1.0 - T
    return img, acc


def random_scene(rng, n, H, W):
    means2d = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)], -1).astype(np.float32)
    # random positive-definite conics
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * 0.3
    cov = np.einsum("nij,nkj->nik", L, L) + 2.0 * np.eye(2)
    inv = np.linalg.inv(cov)
    conics = np.stack([inv[:, 0, 0], inv[:, 0, 1], inv[:, 1, 1]], -1).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    depths = rng.uniform(1, 10, n).astype(np.float32)
    valid = np.ones(n, bool)
    # conservative radii: 3 sigma of max eigenvalue
    eig = np.linalg.eigvalsh(cov)
    radii = np.ceil(3 * np.sqrt(eig[:, -1])).astype(np.float32)
    return means2d, conics, colors, opacities, depths, valid, radii


def test_rasterize_matches_oracle(rng):
    H, W = 24, 40
    m2, con, col, opa, dep, val, rad = random_scene(rng, 30, H, W)
    out = rasterize_pixels(
        jnp.asarray(m2[:, 0]), jnp.asarray(m2[:, 1]), jnp.asarray(con[:, 0]),
        jnp.asarray(con[:, 1]), jnp.asarray(con[:, 2]), jnp.asarray(col),
        jnp.asarray(opa), jnp.asarray(dep), jnp.asarray(val),
        jnp.asarray(rad), width=W, height=H, tile_size=8, max_per_tile=30)
    img_ref, acc_ref = oracle_rasterize(m2, con, col, opa, dep, val, H, W)
    np.testing.assert_allclose(np.asarray(out.alpha), acc_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.colors), img_ref, atol=2e-5)


def test_rasterize_invalid_excluded(rng):
    H, W = 16, 16
    m2, con, col, opa, dep, val, rad = random_scene(rng, 10, H, W)
    val[::2] = False
    out = rasterize_pixels(
        jnp.asarray(m2[:, 0]), jnp.asarray(m2[:, 1]), jnp.asarray(con[:, 0]),
        jnp.asarray(con[:, 1]), jnp.asarray(con[:, 2]), jnp.asarray(col),
        jnp.asarray(opa), jnp.asarray(dep), jnp.asarray(val),
        jnp.asarray(rad), width=W, height=H, tile_size=8, max_per_tile=16)
    img_ref, acc_ref = oracle_rasterize(m2, con, col, opa, dep, val, H, W)
    np.testing.assert_allclose(np.asarray(out.colors), img_ref, atol=2e-5)


def test_rasterize_depth_ordering():
    # nearer opaque gaussian hides farther one
    H, W = 8, 8
    m2 = np.array([[4.5, 4.5], [4.5, 4.5]], np.float32)
    con = np.tile(np.array([2.0, 0.0, 2.0], np.float32), (2, 1))
    col = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    opa = np.array([0.99, 0.99], np.float32)
    rad = np.array([5.0, 5.0], np.float32)
    for dep, expect in [(np.array([1.0, 2.0], np.float32), 0),
                        (np.array([2.0, 1.0], np.float32), 1)]:
        out = rasterize_pixels(
            jnp.asarray(m2[:, 0]), jnp.asarray(m2[:, 1]),
            jnp.asarray(con[:, 0]), jnp.asarray(con[:, 1]),
            jnp.asarray(con[:, 2]), jnp.asarray(col),
            jnp.asarray(opa), jnp.asarray(dep), jnp.ones(2, bool),
            jnp.asarray(rad), width=W, height=H, tile_size=8, max_per_tile=2)
        center = np.asarray(out.colors)[4, 4]
        assert center[expect] > 0.95 * center.sum()


def test_rasterize_differentiable(rng):
    H, W = 16, 16
    m2, con, col, opa, dep, val, rad = random_scene(rng, 12, H, W)
    target = rng.uniform(size=(H, W, 3)).astype(np.float32)

    def loss(m2j, colj, opaj):
        out = rasterize_pixels(
            m2j[:, 0], m2j[:, 1], jnp.asarray(con[:, 0]),
            jnp.asarray(con[:, 1]), jnp.asarray(con[:, 2]), colj, opaj,
            jnp.asarray(dep), jnp.asarray(val), jnp.asarray(rad),
            width=W, height=H, tile_size=8, max_per_tile=12)
        return jnp.mean((out.colors - target) ** 2)

    g_m2, g_col, g_opa = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(m2), jnp.asarray(col), jnp.asarray(opa))
    assert np.isfinite(np.asarray(g_m2)).all()
    assert np.isfinite(np.asarray(g_col)).all()
    assert float(jnp.abs(g_col).sum()) > 0

    # finite-difference check on one opacity entry
    eps = 1e-3
    opa_p = opa.copy(); opa_p[0] += eps
    opa_m = opa.copy(); opa_m[0] -= eps
    fd = (loss(jnp.asarray(m2), jnp.asarray(col), jnp.asarray(opa_p))
          - loss(jnp.asarray(m2), jnp.asarray(col), jnp.asarray(opa_m))) / (2 * eps)
    np.testing.assert_allclose(float(g_opa[0]), float(fd), rtol=2e-2, atol=1e-5)


def test_rasterize_capacity_overflow_drops_farthest(rng):
    # with tiny capacity, the nearest gaussians still composite correctly
    H, W = 8, 8
    n = 6
    m2 = np.tile(np.array([[4.5, 4.5]], np.float32), (n, 1))
    con = np.tile(np.array([1.0, 0.0, 1.0], np.float32), (n, 1))
    col = np.eye(3, dtype=np.float32)[np.arange(n) % 3]
    opa = np.full(n, 0.999, np.float32)
    dep = np.arange(1, n + 1, dtype=np.float32)
    rad = np.full(n, 4.0, np.float32)
    out = rasterize_pixels(
        jnp.asarray(m2[:, 0]), jnp.asarray(m2[:, 1]), jnp.asarray(con[:, 0]),
        jnp.asarray(con[:, 1]), jnp.asarray(con[:, 2]), jnp.asarray(col),
        jnp.asarray(opa), jnp.asarray(dep), jnp.ones(n, bool),
        jnp.asarray(rad), width=W, height=H, tile_size=8, max_per_tile=2)
    # nearest is color 0 with alpha≈0.999: front dominates
    center = np.asarray(out.colors)[4, 4]
    assert center[0] > 0.99

def test_rasterize_overflow_stats(rng):
    """with_stats reports exact occupancy: 6 coincident gaussians vs
    max_per_tile=2 -> 4 dropped per intersecting fine tile."""
    H, W = 8, 8
    n = 6
    m2 = np.tile(np.array([[4.5, 4.5]], np.float32), (n, 1))
    con = np.tile(np.array([1.0, 0.0, 1.0], np.float32), (n, 1))
    col = np.eye(3, dtype=np.float32)[np.arange(n) % 3]
    opa = np.full(n, 0.999, np.float32)
    dep = np.arange(1, n + 1, dtype=np.float32)
    rad = np.full(n, 2.0, np.float32)
    args = (jnp.asarray(m2[:, 0]), jnp.asarray(m2[:, 1]),
            jnp.asarray(con[:, 0]), jnp.asarray(con[:, 1]),
            jnp.asarray(con[:, 2]), jnp.asarray(col), jnp.asarray(opa),
            jnp.asarray(dep), jnp.ones(n, bool), jnp.asarray(rad))
    out = rasterize_pixels(*args, width=W, height=H, tile_size=8,
                           max_per_tile=2, with_stats=True)
    st = {k: int(v) for k, v in out.stats.items()}
    # one 8x8 fine tile == one coarse tile; all 6 intersect it
    assert st["coarse_max"] == 6
    assert st["fine_max"] == 6
    assert st["fine_overflow_tiles"] == 1
    assert st["fine_dropped"] == 4
    assert st["coarse_dropped"] == 0  # kc = min(4096, 6) = 6

    # ample capacity: counters are zero, and default path returns stats=None
    out2 = rasterize_pixels(*args, width=W, height=H, tile_size=8,
                            max_per_tile=8, with_stats=True)
    assert int(out2.stats["fine_dropped"]) == 0
    out3 = rasterize_pixels(*args, width=W, height=H, tile_size=8,
                            max_per_tile=2)
    assert out3.stats is None

    # stats also work through the sort-based select path
    out4 = rasterize_pixels(*args, width=W, height=H, tile_size=8,
                            max_per_tile=2, select_method="sort",
                            with_stats=True)
    assert int(out4.stats["fine_max"]) == 6
