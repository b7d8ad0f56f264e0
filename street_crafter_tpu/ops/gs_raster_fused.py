"""Fused Pallas compositing for the Gaussian rasterizer (eval/render path).

Replaces phase 2 of ops/gs_raster.py (fine binning + cumprod compositing)
with one Pallas kernel per (coarse tile, 16px fine row). The XLA path
materializes several [kf, pixels] intermediates per fine row in HBM and
pays a per-fine-tile ``approx_min_k``; here everything after the coarse
binning runs in VMEM:

- grid = (coarse_tile, fine_row): the [kc, A] candidate block is fetched
  into VMEM once per coarse tile and reused by its CF fine rows (Pallas
  skips the DMA when the block index is unchanged);
- phase 1 COMPACTS the tile's depth-sorted candidates to the row's
  intersecting ones via MXU indicator matmuls (see _composite_kernel) —
  every XLA-side per-row refinement loses outright on v5e (approx_min_k
  aggregation ~19 ms at [936, 4096] -> 1024, lax.sort ~1 s, general
  gathers ~20 ms);
- phase 2 streams the compacted list in blocks of 128 through an
  early-exiting ``lax.while_loop``: Cholesky-factored alpha evaluation,
  the sequential over-operator as an exclusive prefix-sum of log(1-alpha)
  via one strict-lower-triangular ones matmul, color accumulation via a
  second matmul, log-transmittance carried in scratch;
- the loop stops when every pixel of the row saturates (max T < 1/255) or
  the candidates run out — the CUDA rasterizer's per-pixel early
  termination (gsplat rasterize_to_pixels) at row granularity, which
  static-shape XLA cannot express.

Forward-only: training/backward keeps the XLA path (ops/gs_raster.py) for
autodiff + absgrad. Measured (BASELINE.md): 47.2 FPS at 1066x1600 over a
600k heavy-tailed scene vs 20.4 FPS for the XLA path at training fidelity.

Reference parity: street_gaussian_renderer.py:243-280 (gsplat
rasterize_to_pixels semantics: alpha clamp 0.999, 1/255 cutoff, over-
compositing in depth order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gs_raster import RasterOutput, _INF

_KB = 128          # candidate block (sublane axis of the alpha matrix)
# saturation threshold: T < 1/255 (CUDA uses 1e-4; 1/255 matches our XLA
# path's alpha cutoff scale). Carried in log space by the kernel.
_LOG_STOP_T = -5.545      # log(1/255)
_LOG_CLAMP = -0.0010005   # log(ALPHA_CLAMP) = log(0.999)


def _composite_kernel(cand_ref, out_ref, comp_ref, acc_ref, lt_ref, *,
                      kc: int, kf: int, A: int, C: int, ts: int, cts: int,
                      CF: int, TWc: int):
    """One fine-tile row (ts x cts pixels) of one coarse tile, two phases:

    1. ROW COMPACTION (MXU): the coarse tile's depth-sorted candidate list
       is compacted to this row's intersecting candidates entirely in VMEM.
       Per 128-block: y-overlap mask, exclusive positions via the strict
       lower-triangular ones matmul, a one-hot indicator [kf, 128]
       (iota == position), and ``indicator @ block`` accumulates candidates
       into their compacted slots — order-preserving, no sort, no gather.
       (XLA-side alternatives all lose: approx_min_k aggregation ~19 ms,
       lax.sort ~1 s for these shapes on v5e.)
    2. COMPOSITING over the compacted list (typically ~kc/8 of the tile's
       candidates intersect a 16px row): per-candidate alpha via the conic's
       Cholesky factor — sigma = 0.5*(z1^2+z2^2) from ONE [KB, 8] @ [8, P]
       matmul against the row's pixel monomials (cancellation-free in
       tile-local coords); opacity folded in log space; transmittance
       carried as log T; the over-operator prefix product via the same
       triangular matmul; early exit on saturation (maxlog T < log 1/255).

    Candidate columns 0..A-1: [l11, l21, c1, l22, c2, lopa, colors...,
    depth, y0, y1, pad...] with c1/c2 pre-shifted to coarse-tile-local
    pixel coordinates."""
    c = pl.program_id(0)           # coarse tile index (row-major)
    fy = pl.program_id(1)          # fine row within the coarse tile
    P = ts * cts
    DEPTH = 6 + C                  # depth column index

    tyc = c // TWc
    # global y bounds of this row (y0/y1 columns are global coords)
    ry0 = (tyc * cts + fy * ts).astype(jnp.float32)
    ry1 = ry0 + ts

    # tile-local pixel-center coords, pixel order p = py*cts + px
    half = 0.5 * cts
    y_loc0 = (fy * ts).astype(jnp.float32) - half
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxl = (pid % cts).astype(jnp.float32) + 0.5 - half    # [1, P]
    pyl = y_loc0 + (pid // cts).astype(jnp.float32) + 0.5

    # pixel monomials [8, P] paired with candidate columns 0..7 =
    # (l11, l21, c1, l22, c2, lopa, color0, color1):
    #   z1 = l11*px + l21*py + c1  -> X1 rows (px, py, 1, 0, 0, 0, 0, 0)
    #   z2 = l22*py + c2           -> X2 rows (0, 0, 0, py, 1, 0, 0, 0)
    zero = jnp.zeros((1, P), jnp.float32)
    one = jnp.ones((1, P), jnp.float32)
    x1m = jnp.concatenate([pxl, pyl, one, zero, zero, zero, zero, zero], 0)
    x2m = jnp.concatenate([zero, zero, zero, pyl, one, zero, zero, zero], 0)

    # strict lower-triangular ones: exclusive prefix via MXU
    ri = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 1)
    tri = (ci < ri).astype(jnp.float32)

    comp_ref[:] = jnp.zeros_like(comp_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    lt_ref[:] = jnp.zeros_like(lt_ref)

    nb = kc // _KB
    WIN = min(2 * _KB, kf)   # slot window: positions advance <= KB per
    # block, so the one-hot indicator only needs 2*KB rows anchored at the
    # running base (a full [kf, KB] indicator costs ~4x more VPU)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, _KB), 0) \
        .astype(jnp.float32)

    # ---- phase 1: compact this row's intersecting candidates ------------
    def cbody(carry):
        b, base, _ = carry
        blk = cand_ref[0, pl.ds(b * _KB, _KB), :]         # [KB, A]
        depth = blk[:, DEPTH:DEPTH + 1]
        cy0 = blk[:, DEPTH + 1:DEPTH + 2]
        cy1 = blk[:, DEPTH + 2:DEPTH + 3]
        alive = depth < 1e10
        mask = (cy0 < ry1) & (cy1 > ry0) & alive          # [KB, 1]
        maskf = mask.astype(jnp.float32)
        epos = jax.lax.dot_general(                       # exclusive prefix
            tri, maskf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [KB, 1]
        # window anchor (multiple of KB, clamped so the window fits)
        floor = jnp.clip((base // _KB) * _KB, 0, kf - WIN)
        # fold the mask into the position row (masked -> -1 never matches):
        # the [WIN, KB] indicator is then ONE equality compare + cast
        rel = jnp.where(mask[:, 0], epos[:, 0]
                        + (base - floor).astype(jnp.float32),
                        -1.0)[None, :]                    # [1, KB]
        ind = (slot_iota == rel).astype(jnp.float32)      # [WIN, KB]
        upd = jax.lax.dot_general(
            ind, blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        comp_ref[pl.ds(floor, WIN), :] += upd
        base = base + jnp.sum(maskf).astype(jnp.int32)
        return b + 1, base, jnp.all(alive)

    def ccond(carry):
        b, base, tail = carry
        return (b < nb) & (base < kf) & tail

    _, base_i, _ = jax.lax.while_loop(
        ccond, cbody, (0, jnp.int32(0), jnp.bool_(True)))
    base = base_i.astype(jnp.float32)

    # ---- phase 2: composite the compacted list --------------------------
    nkf = kf // _KB

    def body(carry):
        b, _ = carry
        blk = comp_ref[pl.ds(b * _KB, _KB), :]            # [KB, A]
        lopa = blk[:, 5:6]
        # slot validity: zero-filled tail slots must not composite
        slot = jax.lax.broadcasted_iota(jnp.int32, (_KB, 1), 0) \
            .astype(jnp.float32) + (b * _KB).astype(jnp.float32)
        alive = slot < base

        a = blk[:, 0:8]
        z1 = jax.lax.dot_general(                         # [KB, P]
            a, x1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        z2 = jax.lax.dot_general(
            a, x2m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        lalpha = lopa - 0.5 * (z1 * z1 + z2 * z2)         # [KB, P]
        # cutoff + clamp in LOG space: alpha >= 1/255 <=> lalpha >= log1/255
        keep = (lalpha >= _LOG_STOP_T) & alive
        lalpha = jnp.minimum(lalpha, _LOG_CLAMP)
        alpha = jnp.where(keep, jnp.exp(lalpha), 0.0)

        # NOTE kept f32: log1p in bf16 is both unsupported by Mosaic and
        # numerically wrong near alpha=1 (1-alpha underflows bf16's 8-bit
        # mantissa exactly where near-opaque splats need it)
        log1m = jnp.log1p(-alpha)                         # [KB, P]
        pre = jax.lax.dot_general(                        # exclusive prefix
            tri, log1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lt = lt_ref[0:1, :]                               # [1, P] log T
        w = alpha * jnp.exp(pre + lt)                     # [KB, P]

        col_t = blk[:, 6:6 + C].T                         # [C, KB]
        acc_ref[0:C, :] += jax.lax.dot_general(
            col_t, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        # block total = exclusive prefix at the last row + its own term
        lt_new = lt + pre[_KB - 1:_KB, :] + log1m[_KB - 1:_KB, :]
        lt_ref[0:1, :] = lt_new

        return b + 1, jnp.max(lt_new)

    def cond(carry):
        b, ltmax = carry
        return (b < nkf) & (b * _KB < base) & (ltmax > _LOG_STOP_T)

    jax.lax.while_loop(cond, body, (0, jnp.float32(0.0)))

    out_ref[0, 0] = acc_ref[:]
    out_ref[0, 0, C:C + 1, :] = 1.0 - jnp.exp(lt_ref[0:1, :])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "coarse_factor",
                     "max_per_coarse", "max_per_row", "select_method",
                     "recall_target", "bf16_composite", "with_stats",
                     "_debug_no_kernel"))
def rasterize_pixels_fused(
    u: jax.Array,          # [N] pixel x
    v: jax.Array,          # [N] pixel y
    conic_a: jax.Array,
    conic_b: jax.Array,
    conic_c: jax.Array,
    colors: jax.Array,     # [N, C]
    opacities: jax.Array,  # [N]
    depths: jax.Array,     # [N]
    valid: jax.Array,      # [N] bool
    radii: jax.Array,      # [N]
    width: int = 0,
    height: int = 0,
    tile_size: int = 16,
    coarse_factor: int = 8,
    max_per_coarse: int = 4096,
    max_per_row: int | None = None,   # per-16px-row candidate capacity
    # (default max_per_coarse // 4); rows saturate or run dry long before
    # the coarse capacity, so the refined walk is ~4x shorter
    select_method: str = "approx",
    recall_target: float = 0.95,
    bf16_composite: bool = False,   # accepted for XLA-path signature
    # compatibility; the kernel's elementwise chain stays f32 (log1p near
    # alpha=1 needs f32, and Mosaic lacks bf16 compares/log1p on v5e)
    with_stats: bool = False,   # capacity-overflow counters
    _debug_no_kernel: bool = False,   # bench: run everything but composite
) -> RasterOutput:
    ts = tile_size
    CF = coarse_factor
    cts = ts * CF
    TWc = -(-width // cts)
    THc = -(-height // cts)
    Tc = THc * TWc
    n = u.shape[0]
    kc = min(max_per_coarse, n)
    kc = -(-kc // _KB) * _KB if n >= _KB else _KB
    C = colors.shape[-1]
    assert C <= 7, "packed output carries C color rows + 1 alpha row"

    x0 = u - radii
    x1 = u + radii
    y0 = v - radii
    y1 = v + radii
    depth_key = jnp.where(valid, depths, _INF)

    # coarse binning (phase 1 of ops/gs_raster.py), vectorized over tiles
    tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                            jnp.arange(TWc, dtype=jnp.float32),
                            indexing="ij")
    cx0 = (txc.reshape(-1) * cts)[:, None]
    cy0 = (tyc.reshape(-1) * cts)[:, None]
    stats = None
    if with_stats:
        inter_s = ((x0[None, :] < cx0 + cts) & (x1[None, :] > cx0)
                   & (y0[None, :] < cy0 + cts) & (y1[None, :] > cy0)
                   & (depth_key[None, :] < _INF))
        counts_c = inter_s.sum(axis=1)
        stats = {
            "coarse_max": counts_c.max(),
            "coarse_overflow_tiles": (counts_c > kc).sum(),
            "coarse_dropped": jnp.maximum(counts_c - kc, 0).sum(),
        }
    inter = ((x0[None, :] < cx0 + cts) & (x1[None, :] > cx0)
             & (y0[None, :] < cy0 + cts) & (y1[None, :] > cy0))
    key = jnp.where(inter, depth_key[None, :], _INF)
    if select_method == "exact":
        neg_top, idxc = jax.lax.top_k(-key, min(kc, n))
        cand_depth = -neg_top
    else:
        cand_depth, idxc = jax.lax.approx_min_k(
            key, min(kc, n), recall_target=recall_target,
            aggregate_to_topk=True)
    if cand_depth.shape[1] < kc:   # pad to a _KB multiple
        pad = kc - cand_depth.shape[1]
        cand_depth = jnp.pad(cand_depth, ((0, 0), (0, pad)),
                             constant_values=_INF)
        idxc = jnp.pad(idxc, ((0, 0), (0, pad)))

    # packed gather in the kernel's Cholesky layout (see _composite_kernel):
    # conic M = [[ca, cb], [cb, cc]] = L L^T with L = [[l11, 0], [l21, l22]]
    # so sigma = 0.5*((l11 dx + l21 dy)^2 + (l22 dy)^2) — evaluated by MXU
    # matmul in the kernel, cancellation-free
    l11 = jnp.sqrt(jnp.maximum(conic_a, 1e-12))
    l21 = conic_b / l11
    l22 = jnp.sqrt(jnp.maximum(conic_c - l21 * l21, 1e-12))
    lopa = jnp.where(valid & (opacities > 0),
                     jnp.log(jnp.maximum(opacities, 1e-30)), -1e30)
    attrs = jnp.concatenate(
        [jnp.stack([l11, l21, u, l22, v, lopa], -1), colors,
         jnp.stack([y0, y1], -1)], -1)
    cand = attrs[idxc]                                    # [Tc, kc, 8+C]
    # shift the constant terms to coarse-tile-local pixel coordinates
    # (global 1600-px coords would cost ~3 digits of f32 in the kernel)
    ctrx = (jnp.arange(Tc) % TWc).astype(jnp.float32) * cts + 0.5 * cts
    ctry = (jnp.arange(Tc) // TWc).astype(jnp.float32) * cts + 0.5 * cts
    ul = cand[..., 2] - ctrx[:, None]
    vl = cand[..., 4] - ctry[:, None]
    c1 = -(cand[..., 0] * ul + cand[..., 1] * vl)
    c2 = -(cand[..., 3] * vl)
    # columns: [l11, l21, c1, l22, c2, lopa, colors(C), depth, y0, y1]
    cand = jnp.concatenate(
        [cand[..., 0:2], c1[..., None], cand[..., 3:4], c2[..., None],
         cand[..., 5:6 + C], cand_depth[..., None],
         cand[..., 6 + C:8 + C]], -1)
    A = 6 + C + 3
    assert A >= 8, "kernel matmul reads candidate columns 0..7"

    # per-row capacity for the kernel's in-VMEM compaction phase (a 16px
    # row intersects ~kc/8 of its coarse tile's candidates)
    kf = max_per_row if max_per_row is not None else kc // 4
    kf = min(kc, max(_KB, -(-kf // _KB) * _KB))
    if with_stats:
        y0g = y0[idxc]                                    # [Tc, kc]
        y1g = y1[idxc]
        ry0s = cy0.reshape(-1, 1, 1) + (jnp.arange(CF, dtype=jnp.float32)
                                        * ts).reshape(1, -1, 1)
        rinter = ((y0g[:, None, :] < ry0s + ts) & (y1g[:, None, :] > ry0s)
                  & (cand_depth[:, None, :] < _INF))      # [Tc, CF, kc]
        rcounts = rinter.sum(-1)
        stats = dict(stats or {})
        stats["row_max"] = rcounts.max()
        stats["row_dropped"] = jnp.maximum(rcounts - kf, 0).sum()

    P = ts * cts
    if _debug_no_kernel:
        z = jnp.full((height, width, C), jnp.sum(cand) * 1e-20)
        return RasterOutput(colors=z, alpha=z[..., 0], stats=stats)
    kernel = functools.partial(
        _composite_kernel, kc=kc, kf=kf, A=A, C=C, ts=ts, cts=cts, CF=CF,
        TWc=TWc)
    packed = pl.pallas_call(
        kernel,
        grid=(Tc, CF),
        in_specs=[pl.BlockSpec((1, kc, A), lambda c, f: (c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, P), lambda c, f: (c, f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tc, CF, 8, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kf, A), jnp.float32),
                        pltpu.VMEM((8, P), jnp.float32),
                        pltpu.VMEM((8, P), jnp.float32)],
        interpret=jax.default_backend() == "cpu",   # CPU tests
    )(cand)

    # [Tc, CF(fy), 8, ts*cts] -> [H, W, 8] -> crop
    img = packed.reshape(THc, TWc, CF, 8, ts, cts)
    img = img.transpose(0, 2, 4, 1, 5, 3)                 # tyc, fy, py, txc, px, ch
    img = img.reshape(THc * cts, TWc * cts, 8)[:height, :width]
    return RasterOutput(colors=img[..., :C], alpha=img[..., C], stats=stats)
