"""Trainable Pallas raster (ops/gs_raster_train.py) vs the XLA autodiff
oracle (ops/gs_raster.py) — forward values AND analytic-backward gradients,
including the absgrad channel (interpret mode on CPU, exact selection,
capacities >= N so both paths composite identical candidate sets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.ops.gs_raster import rasterize_pixels
from street_crafter_tpu.ops.gs_raster_train import rasterize_pixels_trainable

W, H = 256, 128
N = 300


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, W, N).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, H, N).astype(np.float32))
    # well-conditioned positive-definite conics with varied anisotropy
    s1 = rng.uniform(2.0, 12.0, N)
    s2 = rng.uniform(2.0, 12.0, N)
    th = rng.uniform(0, np.pi, N)
    ct, st = np.cos(th), np.sin(th)
    a = (ct**2 / s1**2 + st**2 / s2**2).astype(np.float32)
    c = (st**2 / s1**2 + ct**2 / s2**2).astype(np.float32)
    b = (ct * st * (1 / s1**2 - 1 / s2**2)).astype(np.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.05, 0.95, N).astype(np.float32))
    depths = jnp.asarray(rng.uniform(1, 50, N).astype(np.float32))
    radii = jnp.asarray((3.0 * np.maximum(s1, s2)).astype(np.float32))
    valid = jnp.ones(N, bool)
    return (u, v, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
            colors, opac, depths, valid, radii)


def _loss(out, wimg, wa):
    return (jnp.sum(out.colors * wimg)
            + jnp.sum(out.alpha * wa))


def _run(fn, scene, sink, wimg, wa, **kw):
    u, v, a, b, c, colors, opac, depths, valid, radii = scene

    def f(u, v, a, b, c, colors, opac, sink):
        out = fn(u, v, a, b, c, colors, opac, depths, valid, radii,
                 absgrad_sink=sink, width=W, height=H, **kw)
        return _loss(out, wimg, wa)

    val, grads = jax.value_and_grad(f, argnums=tuple(range(8)))(
        u, v, a, b, c, colors, opac, sink)
    return val, grads


def test_forward_matches_oracle(scene):
    u, v, a, b, c, colors, opac, depths, valid, radii = scene
    ref = rasterize_pixels(u, v, a, b, c, colors, opac, depths, valid,
                           radii, width=W, height=H, exact_select=True,
                           max_per_tile=512, max_per_coarse=512)
    out = rasterize_pixels_trainable(
        u, v, a, b, c, colors, opac, depths, valid, radii,
        width=W, height=H, select_method="exact",
        max_per_coarse=512, max_per_row=384)
    # the oracle evaluates sigma in global pixel coords, the kernel in
    # tile-local Cholesky form; fp noise flips the 1/255 cutoff gate on a
    # handful of boundary (pixel, splat) pairs — differences are bounded by
    # the cutoff weight itself. Bulk must match tightly.
    dc = np.abs(np.asarray(out.colors) - np.asarray(ref.colors))
    da = np.abs(np.asarray(out.alpha) - np.asarray(ref.alpha))
    assert dc.max() < 5e-3 and da.max() < 5e-3, (dc.max(), da.max())
    assert np.quantile(dc, 0.99) < 2e-4
    assert np.quantile(da, 0.99) < 2e-4


def test_gradients_match_oracle(scene):
    rng = np.random.default_rng(1)
    wimg = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
    wa = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    sink = jnp.zeros((N, 2), jnp.float32)

    vref, gref = _run(
        lambda *args, **kw: rasterize_pixels(
            *args, exact_select=True, max_per_tile=512,
            max_per_coarse=512, **kw),
        scene, sink, wimg, wa)
    vout, gout = _run(
        lambda *args, **kw: rasterize_pixels_trainable(
            *args, select_method="exact", max_per_coarse=512,
            max_per_row=384, **kw),
        scene, sink, wimg, wa)

    # same benign cutoff-gate flips as the forward test accumulate into the
    # signed random-weighted loss
    assert np.allclose(float(vref), float(vout), rtol=3e-3)
    # the two formulations evaluate sigma differently (global-coord
    # quadratic vs tile-local Cholesky); fp noise flips 1/255-cutoff gates
    # on boundary (pixel, splat) pairs, which perturbs a handful of
    # per-splat grads. The kernel backward itself is exact
    # (test_composite_bwd_vs_exact_autodiff); here we require bulk
    # agreement with a loose max bound.
    names = ["u", "v", "conic_a", "conic_b", "conic_c", "colors",
             "opacity", "absgrad"]
    for name, gr, go in zip(names, gref, gout):
        gr = np.asarray(gr)
        go = np.asarray(go)
        scale = np.abs(gr).max() + 1e-8
        d = np.abs(gr - go) / scale
        assert d.max() < 2e-2, (name, d.max(), scale)
        # 95th pct: with 300 splats the top few are boundary cases
        assert np.quantile(d, 0.95) < 2e-3, (name, np.quantile(d, 0.95))
        # absgrad must be non-trivial (positive somewhere)
        if name == "absgrad":
            assert go.max() > 0


def test_composite_bwd_vs_exact_autodiff():
    """The custom backward kernel vs jax autodiff through a pure-jnp replica
    of the EXACT kernel math (log-space alpha, local coords, full walk) —
    no selection or gate-boundary noise; tight tolerance."""
    from street_crafter_tpu.ops.gs_raster_train import _make_composite_train
    from street_crafter_tpu.ops.gs_raster_fused import (_LOG_CLAMP,
                                                        _LOG_STOP_T)
    ts, cts, CF = 16, 128, 8
    Tc, kf, C = 1, 128, 3
    A = 6 + C + 2
    P = ts * cts
    rng = np.random.default_rng(3)

    ncand = 90
    l11 = rng.uniform(0.05, 0.4, ncand)
    l21 = rng.uniform(-0.2, 0.2, ncand)
    l22 = rng.uniform(0.05, 0.4, ncand)
    uu = rng.uniform(-64, 64, ncand)   # tile-local centers
    vv = rng.uniform(-64, 64, ncand)
    c1 = -(l11 * uu + l21 * vv)
    c2 = -(l22 * vv)
    lopa = np.log(rng.uniform(0.1, 0.9, ncand))
    cols = rng.uniform(0, 1, (ncand, C))
    comp = np.zeros((Tc, CF, kf, A), np.float32)
    for f in range(CF):
        comp[0, f, :ncand, 0] = l11
        comp[0, f, :ncand, 1] = l21
        comp[0, f, :ncand, 2] = c1
        comp[0, f, :ncand, 3] = l22
        comp[0, f, :ncand, 4] = c2
        comp[0, f, :ncand, 5] = lopa
        comp[0, f, :ncand, 6:6 + C] = cols
    comp = jnp.asarray(comp)
    cnt = jnp.full((Tc, CF), ncand, jnp.int32)

    def replica(comp, cnt):
        """[Tc, CF, kf, A] -> packed [Tc, CF, 8, P], exact kernel math."""
        half = 0.5 * cts
        pid = jnp.arange(P)
        pxl = (pid % cts).astype(jnp.float32) + 0.5 - half
        fy = jnp.arange(CF, dtype=jnp.float32)
        pyl = (fy[:, None] * ts - half
               + (pid // cts).astype(jnp.float32) + 0.5)     # [CF, P]
        blk = comp[0]                                         # [CF, kf, A]
        z1 = (blk[..., 0:1] * pxl[None, None]
              + blk[..., 1:2] * pyl[:, None] + blk[..., 2:3])
        z2 = blk[..., 3:4] * pyl[:, None] + blk[..., 4:5]
        lraw = blk[..., 5:6] - 0.5 * (z1 * z1 + z2 * z2)
        slot = jnp.arange(kf)[None, :, None]
        alive = slot < cnt[0][:, None, None]
        keep = (lraw >= _LOG_STOP_T) & alive
        lalpha = jnp.minimum(lraw, _LOG_CLAMP)
        alpha = jnp.where(keep, jnp.exp(lalpha), 0.0)         # [CF, kf, P]
        log1m = jnp.log1p(-alpha)
        pre = jnp.concatenate(
            [jnp.zeros_like(log1m[:, :1]),
             jnp.cumsum(log1m, axis=1)[:, :-1]], axis=1)
        w = alpha * jnp.exp(pre)
        colors = jnp.einsum("fkp,fkc->fcp", w, blk[..., 6:6 + C])
        a_out = 1.0 - jnp.exp(pre[:, -1] + log1m[:, -1])
        packed = jnp.concatenate(
            [colors, a_out[:, None],
             jnp.zeros((CF, 8 - C - 1, P))], axis=1)
        return packed[None]

    composite = _make_composite_train(kf, A, C, ts, cts, Tc, CF, True,
                                      TWc=1)

    def unpack(packed):   # mirror of the module's image layout
        img = packed.reshape(1, 1, CF, 8, ts, cts)
        img = img.transpose(0, 2, 4, 1, 5, 3)
        return img.reshape(CF * ts, cts, 8)

    wout = jnp.asarray(
        rng.normal(size=(CF * ts, cts, 8)).astype(np.float32))
    # zero cotangent on the unused packed channels
    wout = wout.at[..., C + 1:].set(0.0)

    vk, gk = jax.value_and_grad(
        lambda cm: jnp.sum(composite(cm, cnt) * wout))(comp)
    vr, gr = jax.value_and_grad(
        lambda cm: jnp.sum(unpack(replica(cm, cnt)) * wout))(comp)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    gk = np.asarray(gk)
    gr = np.asarray(gr)
    # absgrad sink columns are kernel-only (the replica has no sink);
    # compare the analytic columns tightly
    scale = np.abs(gr[..., :6 + C]).max()
    err = np.abs(gk[..., :6 + C] - gr[..., :6 + C]).max()
    assert err / scale < 1e-4, (err, scale)
    # sink columns: au = |l11| sum|dz1| must be positive where active
    assert gk[..., 6 + C:].max() > 0


def test_viewspace_zero_hook(scene):
    """grad w.r.t. a zero added to (u, v) equals the (u, v) grads — the
    densification viewspace hook contract."""
    u, v, a, b, c, colors, opac, depths, valid, radii = scene
    rng = np.random.default_rng(2)
    wimg = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

    def f(vz):
        out = rasterize_pixels_trainable(
            u + vz[:, 0], v + vz[:, 1], a, b, c, colors, opac, depths,
            valid, radii, width=W, height=H, select_method="exact",
            max_per_coarse=512, max_per_row=384)
        return jnp.sum(out.colors * wimg)

    gvz = jax.grad(f)(jnp.zeros((N, 2), jnp.float32))

    def fu(uu, vv):
        out = rasterize_pixels_trainable(
            uu, vv, a, b, c, colors, opac, depths, valid, radii,
            width=W, height=H, select_method="exact",
            max_per_coarse=512, max_per_row=384)
        return jnp.sum(out.colors * wimg)

    gu, gv = jax.grad(fu, argnums=(0, 1))(u, v)
    np.testing.assert_allclose(np.asarray(gvz[:, 0]), np.asarray(gu),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gvz[:, 1]), np.asarray(gv),
                               rtol=1e-5, atol=1e-7)
