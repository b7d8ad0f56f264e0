"""Tile-binned differentiable Gaussian rasterization.

TPU-native replacement for gsplat's ``isect_tiles`` / ``isect_offset_encode``
/ ``rasterize_to_pixels`` CUDA kernels (street_gaussian_renderer.py:243-280)
and for the INRIA ``diff-gaussian-rasterization`` fallback path.

Formulation chosen for TPU rather than translated from CUDA:

- the CUDA rasterizer builds dynamic per-tile worklists (radix sort over
  (tile, depth) keys) and each pixel walks its list sequentially with early
  termination. Dynamic worklists and per-pixel loops map poorly onto a SIMD
  machine / XLA static shapes.
- here binning is *hierarchical with fixed capacities*: every coarse tile
  (coarse_factor x coarse_factor fine tiles, 128px by default) selects its
  ``max_per_coarse`` nearest intersecting Gaussians in ONE vectorized pass
  over all coarse tiles — depth selection via ``approx_min_k`` (the TPU's
  hardware-friendly partial top-k; ~2.4x the exact top_k throughput at
  recall 0.95) followed by ONE packed gather; each fine tile then selects
  its ``max_per_tile`` nearest from the parent's candidate list.
- compositing is fully vectorized: alpha weights form a [K, pixels] matrix
  and the sequential over-operator becomes an exclusive cumulative product of
  (1 - alpha) along K, followed by one matmul with the color matrix (MXU).
  Backward is XLA autodiff through the same graph (the scan body is
  rematerialized so no per-tile residuals are stored).

Capacity overflow drops the *farthest* Gaussians of a tile — exactly the
ones a saturated transmittance would have ignored. Tests use capacities >= N
with ``exact_select=True`` so the oracle comparison is exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e10)
ALPHA_CLAMP = 0.999
ALPHA_MIN = 1.0 / 255.0


@jax.custom_vjp
def _abs_sink_hook(x, sink):
    """Identity on ``x`` whose backward additionally reports the PER-PIXEL
    absolute gradient sum as the 'gradient' of ``sink``.

    This is the TPU analog of gsplat's ``absgrad=True`` channel
    (street_gaussian_renderer.py:183,279): the CUDA kernel atomically adds
    |dL/d means2d| per pixel into a side buffer during the rasterize
    backward; here the abs-sum rides JAX autodiff as the cotangent of a
    dummy input, and the candidate gathers scatter-add it back to [N].
    ``x`` is the per-(tile, candidate, pixel) offset (dx or dy), ``sink``
    the per-(tile, candidate) zero placeholder.
    """
    del sink
    return x


def _abs_sink_fwd(x, sink):
    del sink
    return x, None


def _abs_sink_bwd(_, g):
    return g, jnp.sum(jnp.abs(g), axis=-1)


_abs_sink_hook.defvjp(_abs_sink_fwd, _abs_sink_bwd)


def pick_coarse_capacity(coarse_max: int, bucket: int = 2048,
                         cap: int = 65536, headroom: float = 1.1) -> int:
    """Round a measured per-coarse-tile candidate maximum up to a capacity
    bucket (static shape => one compiled executable per bucket, not per
    scene). The reference's CUDA rasterizer sizes its worklists dynamically
    per frame (gsplat has no drops); static-shape XLA cannot — instead a
    cheap stats probe (``with_stats=True`` reports exact pre-drop
    ``coarse_max``) picks the bucket once per trajectory, so quality
    degrades predictably (drop counters reported) instead of silently at
    scale. ``headroom`` absorbs count growth between the probed and
    rendered frames.

    History: round 3 measured a Mosaic scoped-VMEM compile wall just above
    kc=4096 in the phase-1 compaction kernel (a [kc, A=8] f32 block pads
    its lane dim to 128 -> ~0.5 KB/candidate/buffer; kc=43008 demanded
    126 MB against the 16 MB limit) and clamped ``cap`` to 4096. The
    kernel now streams the candidate axis in 2048-candidate chunks
    (gs_raster_fused.run_compact_chunked), so every kc-dependent VMEM
    buffer is bounded and capacity classes compile through >=16k. The
    remaining ``cap`` is the train path's compacted-index representation
    limit (hi/lo bytes bf16-exact to 65535) — far above any measured
    scene (1M-splat heavy tail probes ~64k)."""
    need = int(coarse_max * headroom)
    k = max(bucket, -(-need // bucket) * bucket)
    return min(k, cap)


class RasterOutput(NamedTuple):
    colors: jax.Array  # [H, W, C]
    alpha: jax.Array   # [H, W]
    # occupancy/overflow counters (with_stats=True only; None otherwise).
    # Guards against silent capacity drops on dense post-densification
    # scenes: the reference's dynamic worklists never drop, ours clamp at
    # max_per_coarse / max_per_tile.
    stats: dict | None = None


def _sort_pairs(x0, x1, y0, y1, depth_key, TWc, THc, cts):
    """One global (tile, depth) lexsort of the <=4N expanded splat/tile
    pairs (the gsplat radix-sort strategy, TPU form): duplicate every
    Gaussian to the <=4 coarse tiles its bbox corners touch, lexsort once
    (a single 2.4M-key lexsort measures 9.5 ms on v5e — large SINGLE
    sorts are fast; only batched small sorts are pathological), then every
    tile's nearest-k candidates are one contiguous window. Returns
    (idx_s, depth_s, seg) with seg [Tc + 1] segment offsets.

    LIMITATION (measured, r5 decision record in BASELINE.md): the bbox is
    clamped to one tile span, so splats WIDER than a coarse tile miss
    their interior tiles — on the full-res 600k heavy-tail headline scene
    this loses ~52%% of tile/splat pairs (519k of ~1.08M) and renders at
    18.4 dB vs exact. Valid for scenes whose splats fit a coarse tile
    (radius <= 64 px); the exact flat-worklist design that fixes this
    (giant-splat range expansion + segment-streaming compaction via
    scalar-prefetched offsets) is written up in the decision record."""
    n = x0.shape[0]
    Tc = THc * TWc
    lim = cts - 1.0
    cx0 = jnp.maximum(x0, x1 - lim)
    cy0 = jnp.maximum(y0, y1 - lim)

    def tile_of(px, py):
        tx = jnp.clip(jnp.floor(px / cts), 0, TWc - 1)
        ty = jnp.clip(jnp.floor(py / cts), 0, THc - 1)
        return (ty * TWc + tx).astype(jnp.int32)

    t00 = tile_of(cx0, cy0)
    t10 = tile_of(x1, cy0)
    t01 = tile_of(cx0, y1)
    t11 = tile_of(x1, y1)
    # drop duplicate slots (same tile id emitted twice)
    s0 = t00
    s1 = jnp.where(t10 != t00, t10, Tc)
    s2 = jnp.where((t01 != t00) & (t01 != t10), t01, Tc)
    s3 = jnp.where((t11 != t00) & (t11 != t10) & (t11 != t01), t11, Tc)
    tiles = jnp.stack([s0, s1, s2, s3], 0).reshape(-1)       # [4N]
    invalid = ~jnp.isfinite(depth_key) | (depth_key >= _INF)
    tiles = jnp.where(jnp.tile(invalid, 4), Tc, tiles)
    depths4 = jnp.tile(depth_key, 4)
    idx4 = jnp.tile(jnp.arange(n, dtype=jnp.int32), 4)

    order = jnp.lexsort((depths4, tiles))
    tiles_s = tiles[order]
    depth_s = depths4[order]
    idx_s = idx4[order]

    seg = jnp.searchsorted(tiles_s, jnp.arange(Tc + 1, dtype=jnp.int32))
    return idx_s, depth_s, seg


def _sort_windows(idx_s, depth_s, seg, tids, kc):
    """Per-tile candidate windows from the global sort: for each tile id in
    ``tids`` [T], the first kc entries of its sorted segment (depth order,
    +inf padded). Any tile subset works — escalation classes reuse ONE
    global sort at several capacities."""
    n4 = idx_s.shape[0]
    window = seg[tids][:, None] + jnp.arange(kc, dtype=jnp.int32)[None]
    in_seg = window < seg[tids + 1][:, None]
    window = jnp.minimum(window, n4 - 1)
    cand_idx = idx_s[window]
    cand_depth = jnp.where(in_seg, depth_s[window], _INF)
    return cand_idx, cand_depth


def _sort_binning(x0, x1, y0, y1, depth_key, TWc, THc, cts, kc):
    """Full-grid sort binning (see _sort_pairs); returns (cand_idx
    [Tc, kc], cand_depth [Tc, kc])."""
    Tc = THc * TWc
    idx_s, depth_s, seg = _sort_pairs(x0, x1, y0, y1, depth_key, TWc, THc,
                                      cts)
    return _sort_windows(idx_s, depth_s, seg,
                         jnp.arange(Tc, dtype=jnp.int32), kc)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "max_per_tile",
                     "coarse_factor", "max_per_coarse", "exact_select",
                     "select_method", "bf16_composite", "recall_target",
                     "with_stats"))
def rasterize_pixels(
    u: jax.Array,          # [N] pixel x (column layout: see Projection)
    v: jax.Array,          # [N] pixel y
    conic_a: jax.Array,    # [N] inverse 2D covariance entries
    conic_b: jax.Array,
    conic_c: jax.Array,
    colors: jax.Array,     # [N, C]
    opacities: jax.Array,  # [N]
    depths: jax.Array,     # [N]
    valid: jax.Array,      # [N] bool
    radii: jax.Array,      # [N] pixel radius
    absgrad_sink: jax.Array | None = None,  # [N, 2] zeros; its cotangent
    # under jax.grad is the per-pixel |dL/d(u,v)| sum (gsplat absgrad)
    width: int = 0,
    height: int = 0,
    tile_size: int = 16,
    max_per_tile: int = 512,
    coarse_factor: int = 8,
    max_per_coarse: int = 4096,
    exact_select: bool = False,
    bf16_composite: bool = False,   # halve VPU cost of the alpha chain
    # (inference-quality; keep f32 for training: 256-term transmittance
    # products in bf16 shift gradients)
    select_method: str = "approx",  # "approx" | "exact" | "sort"
    recall_target: float = 0.95,
    with_stats: bool = False,       # report capacity-overflow counters

    # approx_min_k has internal configuration cliffs: at [117, 200k] keys,
    # r=0.95/kc=4096 costs ~64 ms while r<=0.88 or kc<=3072 costs ~6-10 ms.
    # Training defaults to 0.95 (gradient coverage); eval/bench pass 0.85
    # (torture-scene PSNR 30.6 vs 34.8 dB; real scenes are far sparser).
    # measured end-to-end at 640x960/200k on one v5 chip: approx 17.4 ms,
    # exact 24.1 ms, sort 35.1 ms — all ~35 dB vs a high-capacity reference;
    # approx_min_k wins because the dense [Tc, N] mask streams at HBM rate
    # while the 4N-key lexsort does not.
) -> RasterOutput:
    ts = tile_size
    CF = coarse_factor
    cts = ts * CF
    TWc = -(-width // cts)
    THc = -(-height // cts)
    Tc = THc * TWc
    n = u.shape[0]
    kc = min(max_per_coarse, n)
    kf = min(max_per_tile, kc)
    C = colors.shape[-1]

    x0 = u - radii
    x1 = u + radii
    y0 = v - radii
    y1 = v + radii
    depth_key = jnp.where(valid, depths, _INF)

    # ---- phase 1: coarse binning, vectorized over ALL coarse tiles --------
    if exact_select:
        select_method = "exact"
    counts_c = None
    if select_method == "sort":
        idxc, cand_depth_all = _sort_binning(
            x0, x1, y0, y1, depth_key, TWc, THc, cts, kc)
        if with_stats:
            # recompute intersection counts (duplication-to-4-tiles already
            # clamps bboxes to one tile span; this is the exact count)
            tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                                    jnp.arange(TWc, dtype=jnp.float32),
                                    indexing="ij")
            sx0 = (txc.reshape(-1) * cts)[:, None]
            sy0 = (tyc.reshape(-1) * cts)[:, None]
            sinter = ((x0[None, :] < sx0 + cts) & (x1[None, :] > sx0)
                      & (y0[None, :] < sy0 + cts) & (y1[None, :] > sy0)
                      & (depth_key[None, :] < _INF))
            counts_c = sinter.sum(axis=1)
    else:
        tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                                jnp.arange(TWc, dtype=jnp.float32),
                                indexing="ij")
        cx0 = (txc.reshape(-1) * cts)[:, None]   # [Tc, 1]
        cy0 = (tyc.reshape(-1) * cts)[:, None]
        inter = ((x0[None, :] < cx0 + cts) & (x1[None, :] > cx0)
                 & (y0[None, :] < cy0 + cts) & (y1[None, :] > cy0))  # [Tc, N]
        key = jnp.where(inter, depth_key[None, :], _INF)
        if with_stats:
            counts_c = (key < _INF).sum(axis=1)
        if select_method == "exact":
            neg_top, idxc = jax.lax.top_k(-key, kc)
            cand_depth_all = -neg_top
        else:
            # recall 0.85 is ~10x faster than 0.95 at dataset-resolution tile
            # counts (the sorted aggregation over the larger candidate set
            # dominates) and costs <1 dB on the synthetic torture scene
            cand_depth_all, idxc = jax.lax.approx_min_k(
                key, kc, recall_target=recall_target,
                aggregate_to_topk=True)

    # one packed gather:
    # [u, v, conic(3), opacity, color(C), (sink_u, sink_v)?, x0, x1, y0, y1]
    attrs = jnp.stack(
        [u, v, conic_a, conic_b, conic_c, opacities], -1)
    parts = [attrs, colors]
    if absgrad_sink is not None:
        parts.append(absgrad_sink)   # rides the gathers; its grad rides the
        # scatter-adds back to [N, 2]
    parts.append(jnp.stack([x0, x1, y0, y1], -1))
    attrs = jnp.concatenate(parts, -1)
    A = attrs.shape[-1]
    cand_all = attrs[idxc]                                  # [Tc, kc, A]
    cand_depth_all = jnp.where(cand_depth_all < _INF, cand_depth_all, _INF)

    stats = None
    if with_stats:
        # fine-tile occupancy among surviving coarse candidates, one
        # vectorized pass over [Tc, CF*CF, kc] (a stats-only pass; the hot
        # path is untouched). True fine drops additionally include whatever
        # the coarse stage already dropped — report both.
        fyy, fxx = jnp.meshgrid(jnp.arange(CF, dtype=jnp.float32),
                                jnp.arange(CF, dtype=jnp.float32),
                                indexing="ij")
        tyc2, txc2 = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                                  jnp.arange(TWc, dtype=jnp.float32),
                                  indexing="ij")
        ftx0 = (txc2.reshape(-1, 1) * cts
                + fxx.reshape(1, -1) * ts)[..., None]   # [Tc, CF*CF, 1]
        fty0 = (tyc2.reshape(-1, 1) * cts
                + fyy.reshape(1, -1) * ts)[..., None]
        cb = cand_all[..., A - 4:]                       # [Tc, kc, 4]
        alive = cand_depth_all < _INF                    # [Tc, kc]
        fin = ((cb[:, None, :, 0] < ftx0 + ts) & (cb[:, None, :, 1] > ftx0)
               & (cb[:, None, :, 2] < fty0 + ts) & (cb[:, None, :, 3] > fty0)
               & alive[:, None, :])
        counts_f = fin.sum(-1)                           # [Tc, CF*CF]
        stats = {
            "coarse_max": counts_c.max(),
            "coarse_overflow_tiles": (counts_c > kc).sum(),
            "coarse_dropped": jnp.maximum(counts_c - kc, 0).sum(),
            "fine_max": counts_f.max(),
            "fine_overflow_tiles": (counts_f > kf).sum(),
            "fine_dropped": jnp.maximum(counts_f - kf, 0).sum(),
        }
        # FUSED-path row occupancy (16px x 128px strips at the fused
        # kernel's default row capacity for this kc): the stats probe runs
        # on this XLA path but sizes overflow-tile ESCALATION for the
        # fused render path (runner/render.py probe_coarse_capacity), whose
        # second drop site is the per-row compaction, not fine tiles.
        # Row counts use the surviving coarse candidates — exact for tiles
        # whose total fits kc; overflowing tiles are caught by the coarse
        # term of the candidate score either way.
        from .gs_raster_fused import default_row_capacity  # no cycle: lazy
        rty0 = (tyc2.reshape(-1, 1) * cts
                + jnp.arange(CF, dtype=jnp.float32).reshape(1, -1)
                * ts)[..., None]                          # [Tc, CF, 1]
        rin = ((cb[:, None, :, 2] < rty0 + ts) & (cb[:, None, :, 3] > rty0)
               & alive[:, None, :])                       # [Tc, CF, kc]
        rcounts_fused = rin.sum(-1)
        kf_fused = default_row_capacity(kc)
        # per-class occupancy histogram (multi-class escalation sizing —
        # mirrors gs_raster_fused's with_stats keys)
        for cls in (4096, 8192, 16384, 32768):
            stats[f"tiles_over_{cls}"] = (counts_c > cls).sum()
        stats["row_max"] = rcounts_fused.max()
        # fused-path row-drop counter at this kc's default row capacity
        # (the train raster's second drop site; capacity-aware training
        # reports it next to eval PSNR)
        stats["row_dropped"] = jnp.maximum(rcounts_fused - kf_fused, 0).sum()
        stats["escalation_candidate_tiles"] = (
            jnp.maximum(counts_c / kc, rcounts_fused.max(-1) / kf_fused)
            > 1.0).sum()

    # reshape to coarse rows for the fine-stage scan
    cand_rows = cand_all.reshape(THc, TWc, kc, A)
    cdep_rows = cand_depth_all.reshape(THc, TWc, kc)

    # pixel-center offsets within a fine tile, flattened [P]
    py, px = jnp.meshgrid(jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          jnp.arange(ts, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)

    # ---- phase 2: fine binning + compositing, scanned over coarse rows ----
    def coarse_row(_, inputs):
        tyc_i, cand, cand_depth = inputs           # [TWc,kc,A], [TWc,kc]
        cx0r = jnp.arange(TWc, dtype=jnp.float32) * cts
        cy0r = tyc_i * cts
        cand_x0 = cand[..., A - 4]
        cand_x1 = cand[..., A - 3]
        cand_y0 = cand[..., A - 2]
        cand_y1 = cand[..., A - 1]

        def fine_row(__, fy):
            fx = jnp.arange(CF, dtype=jnp.float32)
            tile_x0 = cx0r[:, None] + fx[None, :] * ts   # [TWc, CF]
            tile_y0 = cy0r + jnp.float32(fy) * ts
            finter = (
                (cand_x0[:, None, :] < tile_x0[..., None] + ts)
                & (cand_x1[:, None, :] > tile_x0[..., None])
                & (cand_y0[:, None, :] < tile_y0 + ts)
                & (cand_y1[:, None, :] > tile_y0)
            )  # [TWc, CF, kc]
            fkey = jnp.where(finter, cand_depth[:, None, :], _INF)
            if select_method == "approx":
                f_sel, idxf = jax.lax.approx_min_k(
                    fkey, kf, recall_target=recall_target,
                    aggregate_to_topk=True)
            else:
                neg_f, idxf = jax.lax.top_k(-fkey, kf)  # [TWc, CF, kf]
                f_sel = -neg_f
            sel_ok = f_sel < _INF

            sel = jnp.take_along_axis(
                cand[:, None], idxf[..., None], axis=2)  # [TWc, CF, kf, A]
            m2 = sel[..., 0:2]
            con = sel[..., 2:5]
            opa = sel[..., 5] * sel_ok
            col = sel[..., 6:6 + C]

            gx = tile_x0[..., None] + px[None, None, :]  # [TWc, CF, P]
            gy = tile_y0 + py
            gy = jnp.broadcast_to(gy, gx.shape)

            dx = gx[:, :, None, :] - m2[..., 0:1]        # [TWc, CF, kf, P]
            dy = gy[:, :, None, :] - m2[..., 1:2]
            if absgrad_sink is not None:
                dx = _abs_sink_hook(dx, sel[..., 6 + C])
                dy = _abs_sink_hook(dy, sel[..., 7 + C])
            sigma = (0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
                     + con[..., 1:2] * dx * dy)
            alpha = opa[..., None] * jnp.exp(-jnp.maximum(sigma, 0.0))
            alpha = jnp.minimum(alpha, ALPHA_CLAMP)
            alpha = jnp.where((alpha >= ALPHA_MIN) & (sigma >= 0.0), alpha, 0.0)

            cdt = jnp.bfloat16 if bf16_composite else jnp.float32
            alpha = alpha.astype(cdt)
            one_m = (1.0 - alpha).astype(cdt)
            trans_inc = jnp.cumprod(one_m, axis=2)
            trans_exc = jnp.concatenate(
                [jnp.ones_like(trans_inc[:, :, :1]), trans_inc[:, :, :-1]],
                axis=2)
            w = alpha * trans_exc                        # [TWc, CF, kf, P]

            tile_color = jnp.einsum(
                "tfkp,tfkc->tfpc", w, col.astype(cdt),
                preferred_element_type=jnp.float32)
            tile_alpha = 1.0 - trans_inc[:, :, -1, :].astype(jnp.float32)

            # [TWc, CF, ts, ts, C] -> [ts, TWc*CF*ts, C]
            row_img = tile_color.reshape(TWc * CF, ts, ts, C)
            row_img = row_img.transpose(1, 0, 2, 3).reshape(ts, TWc * CF * ts, C)
            row_alpha = tile_alpha.reshape(TWc * CF, ts, ts)
            row_alpha = row_alpha.transpose(1, 0, 2).reshape(ts, TWc * CF * ts)
            return None, (row_img, row_alpha)

        _, (rows, alphas) = jax.lax.scan(
            jax.checkpoint(fine_row), None, jnp.arange(CF))
        # [CF, ts, Wp, C] -> [CF*ts, Wp, C]
        block = rows.reshape(CF * ts, TWc * CF * ts, C)
        block_a = alphas.reshape(CF * ts, TWc * CF * ts)
        return None, (block, block_a)

    _, (blocks, blocks_a) = jax.lax.scan(
        jax.checkpoint(coarse_row), None,
        (jnp.arange(THc, dtype=jnp.float32), cand_rows, cdep_rows))
    img = blocks.reshape(THc * cts, TWc * cts, C)[:height, :width]
    acc = blocks_a.reshape(THc * cts, TWc * cts)[:height, :width]
    return RasterOutput(colors=img, alpha=acc, stats=stats)
