"""Benchmark entry: prints ONE JSON line.

Headline: 3DGS trajectory-render throughput (FPS) at full Waymo dataset
resolution (1066x1600 after the reference's 1600-px cap,
street_gaussian/utils/camera_utils.py:150-160) on a trained-scene-statistics
buffer: 600k splats, heavy-tailed log-normal radii, bimodal opacities —
the post-densification regime, not a favorable uniform slab (VERDICT r1
weak #8). Render path: fused Pallas compositing (ops/gs_raster_fused.py),
the inference/trajectory path. vs_baseline is FPS / 60 (BASELINE.md north
star; the reference publishes no render-throughput number).

Extra fields in the same JSON object: the round-1-comparable 640x960/200k
metric and the raster capacity-overflow counters for the headline scene
(must be zero or reported — silent drops invalidate the number).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_scene(n: int, seed: int = 0):
    """Round-1 uniform slab (kept for cross-round comparability)."""
    from street_crafter_tpu.models.gs.params import init_pool_from_points
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-30, 30, n),
        rng.uniform(-5, 5, n),
        rng.uniform(2, 80, n)], -1).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return init_pool_from_points(pts, cols, capacity=n, fixed_scale=0.05,
                                 init_opacity=0.8)


def build_trained_like_scene(n: int, seed: int = 0):
    """Post-densification statistics: trained street scenes have
    heavy-tailed radii (many needle-thin near-surface splats + a long tail
    of large low-opacity blobs), bimodal opacities (sigmoid pushes most
    splats toward ~0 or ~1 over training), anisotropic scales, and
    street-shaped geometry (ground plane + facades + scattered clutter)."""
    from street_crafter_tpu.models.gs.params import GaussianPool
    rng = np.random.default_rng(seed)

    n_ground = n // 2
    n_wall = n // 3
    n_scatter = n - n_ground - n_wall
    ground = np.stack([rng.uniform(-40, 40, n_ground),
                       1.6 + rng.normal(0, 0.05, n_ground),
                       rng.uniform(2, 120, n_ground)], -1)
    walls = np.stack([rng.choice([-10.0, -7.0, 7.0, 10.0], n_wall)
                      + rng.normal(0, 0.3, n_wall),
                      rng.uniform(-8, 1.6, n_wall),
                      rng.uniform(2, 120, n_wall)], -1)
    scatter = np.stack([rng.uniform(-15, 15, n_scatter),
                        rng.uniform(-3, 1.6, n_scatter),
                        rng.uniform(2, 100, n_scatter)], -1)
    xyz = np.concatenate([ground, walls, scatter]).astype(np.float32)

    # heavy-tailed log-normal radii (median ~4 cm, tail to meters),
    # anisotropic: one axis flattened by ~4x (scale-flatten regularizer)
    base = np.exp(rng.normal(np.log(0.04), 1.0, (n, 1))).astype(np.float32)
    base = np.clip(base, 0.005, 4.0)
    aniso = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    aniso[np.arange(n), rng.integers(0, 3, n)] *= 0.25
    scaling = np.log(base * aniso)

    # bimodal opacity (pre-sigmoid logits): 70% near-opaque, 30% faint
    hi = rng.normal(3.0, 1.0, n)
    lo = rng.normal(-2.0, 1.0, n)
    opacity = np.where(rng.random(n) < 0.7, hi, lo).astype(np.float32)[:, None]

    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)

    sh_deg = 3
    n_coef = (sh_deg + 1) ** 2
    feat_dc = rng.uniform(-1, 1, (n, 1, 3)).astype(np.float32)
    feat_rest = rng.normal(0, 0.05, (n, n_coef - 1, 3)).astype(np.float32)

    return GaussianPool(
        xyz=jnp.asarray(xyz), features_dc=jnp.asarray(feat_dc),
        features_rest=jnp.asarray(feat_rest),
        scaling=jnp.asarray(scaling.astype(np.float32)),
        rotation=jnp.asarray(quat), opacity=jnp.asarray(opacity),
        valid=jnp.ones(n, bool))


def flat_from_pool(pool):
    from street_crafter_tpu.models.gs.scene import FlatGaussians
    return FlatGaussians(
        xyz=pool.xyz, rotation=pool.get_rotation(),
        scaling=pool.get_scaling(), opacity=pool.get_opacity()[:, 0],
        shs=pool.get_features(), valid=pool.valid)


def time_render(flat, H, W, iters=20, **kw):
    from street_crafter_tpu.datasets import Camera
    from street_crafter_tpu.models.gs.renderer import render_flat

    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)

    @jax.jit
    def render(flat, w2c):
        out = render_flat(flat, w2c, jnp.asarray(K), cam.camera_center,
                          W, H, sh_degree=3, tile_size=16, **kw)
        return jnp.sum(out["rgb"].astype(jnp.float32))

    # distinct inputs per call; ONE host fetch at the end (axon tunnel:
    # block_until_ready is unreliable, per-fetch RTT ~100 ms — CLAUDE.md).
    # TWO timed loops, report the second: a fresh executable's first
    # ~dozen executions read 1.5-11x slow over the tunnel (CLAUDE.md).
    w2cs = [jnp.asarray(np.asarray(cam.w2c)).at[0, 3].add(0.002 * i)
            for i in range(4)]
    _ = float(render(flat, w2cs[0]))
    for _loop in range(2):
        t0 = time.perf_counter()
        outs = [render(flat, w2cs[i % 4]) for i in range(iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
    return dt


def scene_stats(flat, H, W, K, cam, n, kc=4096, **kw):
    """Exact pre-drop occupancy counters for one frame."""
    from street_crafter_tpu.ops.gs_projection import project_gaussians
    from street_crafter_tpu.ops.gs_raster_fused import rasterize_pixels_fused
    import jax.numpy as jnp
    proj = project_gaussians(flat.xyz, flat.rotation, flat.scaling,
                             cam.w2c, jnp.asarray(K), W, H, mask=flat.valid)
    out = rasterize_pixels_fused(
        proj.u, proj.v, proj.conic_a, proj.conic_b, proj.conic_c,
        jnp.zeros((n, 3)), flat.opacity, proj.depths, proj.valid,
        proj.radii, width=W, height=H, max_per_coarse=kc, with_stats=True,
        **kw)
    return {k: int(v) for k, v in out.stats.items()}


def render_one(flat, H, W, K, cam, **kw):
    from street_crafter_tpu.models.gs.renderer import render_flat
    import jax
    # hoist the camera constants OUT of the traced lambda: under jit
    # tracing, the jnp ops inside Camera.w2c stage into the trace, so
    # np.asarray on the property there raises TracerArrayConversionError
    w2c = jnp.asarray(np.asarray(cam.w2c))
    center = jnp.asarray(cam.camera_center)
    Kj = jnp.asarray(K)
    fn = jax.jit(lambda f: render_flat(
        f, w2c, Kj, center, W, H, sh_degree=3, tile_size=16, **kw)["rgb"])
    return np.asarray(fn(flat))


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    from street_crafter_tpu.datasets import Camera
    from street_crafter_tpu.ops.gs_raster import pick_coarse_capacity

    N_HEAVY = 600_000
    H, W = 1066, 1600
    pool = build_trained_like_scene(N_HEAVY)
    flat = flat_from_pool(pool)

    dt = time_render(flat, H, W, method="fused", recall_target=0.85)
    fps_full = 1.0 / dt

    # overflow counters on the headline scene (silent capacity drops would
    # invalidate the FPS number; report them)
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    stats = scene_stats(flat, H, W, K, cam, N_HEAVY)

    extra = {
        "raster_overflow": stats,
        "path": "fused-pallas coarse4096/row1024/recall0.85",
    }

    # ---- capacity robustness (VERDICT r2 #4 / r3 #4): auto-sized kc ------
    # The chunked phase-1 kernel (gs_raster_fused.run_compact_chunked)
    # removed the 4096 VMEM clamp, so auto capacity now really sizes to the
    # scene (43008-class on this 600k scene). Quality is measured against a
    # genuinely DROP-FREE exact reference on the XLA raster path (no VMEM
    # wall; ADVICE r3: the old "reference" clamped to the same 4096 and
    # dropped the same candidates). Guarded so a failure in these legs can
    # never cost the headline JSON line.
    def exact_reference(flat_, stats_probe):
        # capacity >= the exact pre-drop maxima: zero coarse AND fine drops
        kc_ref = pick_coarse_capacity(stats_probe["coarse_max"],
                                      headroom=1.0, cap=1 << 20)
        kt_ref = -(-int(stats_probe["row_max"]) // 128) * 128
        return render_one(flat_, H, W, K, cam, method="xla",
                          select_method="exact", max_per_coarse=kc_ref,
                          max_per_tile=kt_ref)

    try:
        kc_auto = pick_coarse_capacity(stats["coarse_max"])
        # approx selection at k >= every tile's count is effectively
        # recall-exact; sort selection was measured and REJECTED here
        # (r5 decision record in BASELINE.md: 4-corner pair expansion
        # loses wide splats' interior tiles at full-res focal lengths)
        dt_auto = time_render(flat, H, W, method="fused", recall_target=0.85,
                              max_per_coarse=kc_auto)
        stats_auto = scene_stats(flat, H, W, K, cam, N_HEAVY, kc=kc_auto)
        # row_max needs a probe whose coarse stage dropped nothing
        ref = exact_reference(flat, stats_auto)
        fast = render_one(flat, H, W, K, cam, method="fused",
                          recall_target=0.85, max_per_coarse=kc_auto)
        fast_4096 = render_one(flat, H, W, K, cam, method="fused",
                               recall_target=0.85)
        q_auto = psnr(np.clip(fast, 0, 1), np.clip(ref, 0, 1))
        q_4096 = psnr(np.clip(fast_4096, 0, 1), np.clip(ref, 0, 1))
        extra["auto_capacity_600k"] = {
            "kc": kc_auto, "fps": round(1.0 / dt_auto, 2),
            "raster_overflow": stats_auto,
            "ref": "xla-exact-dropfree",
            "psnr_vs_exact_db": round(q_auto, 1),
            "psnr_kc4096_vs_exact_db": round(q_4096, 1)}

        # overflow-tile ESCALATION (round 4): base kc=4096 everywhere +
        # the worst-deficit tiles re-rendered at kc_auto — gsplat's
        # pay-per-tile economics (street_gaussian_renderer.py:243-280)
        # under static shapes, vs paying kc_auto for all tiles above.
        # Budget from the combined coarse+row candidate count (row-aware
        # escalation score, ops/gs_raster_fused.py)
        Tc_headline = (-(-W // 128)) * (-(-H // 128))
        esc_tiles = max(8, -(-int(stats.get("escalation_candidate_tiles",
                                            stats["coarse_overflow_tiles"])
                                  * 1.5) // 8) * 8)
        # the probe's own policy threshold: past a majority, escalation
        # re-renders most of the frame and a global upgrade wins
        esc_tiles = min(esc_tiles, -(-(Tc_headline // 2) // 8) * 8)
        esc_kw = dict(escalate_tiles=esc_tiles, escalate_per_coarse=kc_auto)
        dt_esc = time_render(flat, H, W, method="fused",
                             recall_target=0.85, **esc_kw)
        fast_esc = render_one(flat, H, W, K, cam, method="fused",
                              recall_target=0.85, **esc_kw)
        stats_esc = scene_stats(flat, H, W, K, cam, N_HEAVY, **esc_kw)
        q_escalated = psnr(np.clip(fast_esc, 0, 1), np.clip(ref, 0, 1))
        extra["escalated_600k"] = {
            "base_kc": 4096, "escalate_tiles": esc_tiles,
            "escalate_kc": kc_auto, "fps": round(1.0 / dt_esc, 2),
            "ref": "xla-exact-dropfree",
            "psnr_vs_exact_db": round(q_escalated, 1),
            "raster_overflow": stats_esc}

        # multi-CLASS escalation (round 5): each overflowing tile pays its
        # own smallest gate-cleared class instead of every one paying the
        # global max — the drop-free dense-scene lever VERDICT r4 #5/#6
        # asked for (gsplat's per-tile economics at bucket granularity).
        # Budgets from the per-class occupancy histogram + headroom.
        def ceil8(x):
            return max(8, -(-int(x) // 8) * 8)

        row_only = max(0, int(stats.get("escalation_candidate_tiles", 0))
                       - int(stats.get("coarse_overflow_tiles", 0)))
        o8 = int(stats.get("tiles_over_8192", 0))
        o16 = int(stats.get("tiles_over_16384", 0))
        o4 = int(stats.get("coarse_overflow_tiles", 0))
        mc_classes = [(ceil8(o16 * 1.5), kc_auto)]
        if 16384 < kc_auto:
            mc_classes.append((ceil8((o8 - o16 + row_only) * 1.5), 16384))
        if 8192 < kc_auto and o4 - o8 > 0:
            mc_classes.append((ceil8((o4 - o8) * 1.5), 8192))
        mc_classes = tuple(mc_classes)
        # quality config: base recall 0.95 (training fidelity) — the r5
        # sweep measured the escalated quality floor to be approx-
        # selection recall (44.0 dB at .85 / 51.0 at .95 on this scene);
        # sort selection was measured and rejected (see BASELINE.md r5
        # decision record)
        mc_kw = dict(escalate_classes=mc_classes, recall_target=0.95)
        dt_mc = time_render(flat, H, W, method="fused", **mc_kw)
        fast_mc = render_one(flat, H, W, K, cam, method="fused", **mc_kw)
        stats_mc = scene_stats(flat, H, W, K, cam, N_HEAVY, **mc_kw)
        q_mc = psnr(np.clip(fast_mc, 0, 1), np.clip(ref, 0, 1))
        extra["escalated_multiclass_600k"] = {
            "base_kc": 4096, "classes": [list(c) for c in mc_classes],
            "recall": 0.95,
            "fps": round(1.0 / dt_mc, 2), "ref": "xla-exact-dropfree",
            "psnr_vs_exact_db": round(q_mc, 1),
            "raster_overflow": stats_mc}

        # 1M-splat post-densification regime
        N_1M = 1_000_000
        flat_1m = flat_from_pool(build_trained_like_scene(N_1M, seed=1))
        stats_1m_probe = scene_stats(flat_1m, H, W, K, cam, N_1M)
        kc_1m = pick_coarse_capacity(stats_1m_probe["coarse_max"])
        dt_1m = time_render(flat_1m, H, W, method="fused",
                            recall_target=0.85, max_per_coarse=kc_1m)
        stats_1m = scene_stats(flat_1m, H, W, K, cam, N_1M, kc=kc_1m)
        ref_1m = exact_reference(flat_1m, stats_1m)
        fast_1m = render_one(flat_1m, H, W, K, cam, method="fused",
                             recall_target=0.85, max_per_coarse=kc_1m)
        q_1m = psnr(np.clip(fast_1m, 0, 1), np.clip(ref_1m, 0, 1))
        extra["heavytail_1m"] = {
            "kc": kc_1m, "fps": round(1.0 / dt_1m, 2),
            "ref": "xla-exact-dropfree",
            "psnr_vs_exact_db": round(q_1m, 1),
            "raster_overflow": stats_1m}

        esc_tiles_1m = max(8, -(-int(
            stats_1m_probe.get("escalation_candidate_tiles",
                               stats_1m_probe["coarse_overflow_tiles"])
            * 1.5) // 8) * 8)
        esc_tiles_1m = min(esc_tiles_1m, -(-(Tc_headline // 2) // 8) * 8)
        esc_kw_1m = dict(escalate_tiles=esc_tiles_1m,
                         escalate_per_coarse=kc_1m)
        dt_esc_1m = time_render(flat_1m, H, W, method="fused",
                                recall_target=0.85, **esc_kw_1m)
        fast_esc_1m = render_one(flat_1m, H, W, K, cam, method="fused",
                                 recall_target=0.85, **esc_kw_1m)
        q_esc_1m = psnr(np.clip(fast_esc_1m, 0, 1), np.clip(ref_1m, 0, 1))
        extra["escalated_1m"] = {
            "base_kc": 4096, "escalate_tiles": esc_tiles_1m,
            "escalate_kc": kc_1m, "fps": round(1.0 / dt_esc_1m, 2),
            "ref": "xla-exact-dropfree",
            "psnr_vs_exact_db": round(q_esc_1m, 1)}
    except Exception as e:  # noqa: BLE001 — report, never fail the headline
        extra["capacity_extras_error"] = repr(e)

    # round-1-comparable secondary metric (uniform 200k @ 640x960)
    try:
        pool_r1 = build_scene(200_000)
        dt_r1 = time_render(flat_from_pool(pool_r1), 640, 960,
                            method="fused", recall_target=0.85)
        extra["fps_640x960_200k_uniform_r1_metric"] = round(1.0 / dt_r1, 2)
    except Exception as e:  # noqa: BLE001
        extra["r1_metric_error"] = repr(e)

    print(json.dumps({
        "metric": "gs_render_fps_1066x1600_600k_heavytail",
        "value": round(fps_full, 2),
        "unit": "fps",
        "vs_baseline": round(fps_full / 60.0, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
