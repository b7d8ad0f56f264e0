"""Fused Pallas compositing for the Gaussian rasterizer (eval/render path).

Replaces phase 2 of ops/gs_raster.py (fine binning + cumprod compositing)
with two Pallas kernels after the XLA coarse binning:

1. ``_compact_kernel`` — grid (coarse tile,): compacts the tile's
   depth-sorted candidate list into per-16px-row lists ENTIRELY in VMEM.
   All CF fine rows of a tile are processed in ONE program: per 128-wide
   candidate block it computes a [CF, 128] y-overlap mask (the y/depth
   columns arrive lane-major so no transposes are needed), ONE batched
   exclusive-prefix matmul against the strict upper-triangular ones
   matrix, then CF independent one-hot/update chains (``indicator @
   block`` accumulates candidates into their compacted slots —
   order-preserving, no sort, no gather). Row batching matters because
   the walk is LATENCY-bound, not FLOP-bound: one program per (tile, row)
   costs 8x more serial block-iterations for the same math (measured
   23.3 -> 4.6 ms on a worst-case synthetic tile set; see
   scripts/bench_phase1_variants.py). Every XLA-side per-row refinement
   loses outright on v5e (approx_min_k aggregation ~19 ms at
   [936, 4096] -> 1024, lax.sort ~1 s, general gathers ~20 ms).

2. ``_composite_kernel`` — grid (coarse tile, fine row): streams a row's
   compacted list in blocks of 128 through an early-exiting
   ``lax.while_loop``: Cholesky-factored alpha evaluation, the sequential
   over-operator as an exclusive prefix-sum of log(1-alpha) via one
   strict-lower-triangular ones matmul, color accumulation via a second
   matmul, log-transmittance carried in scratch. The loop stops when
   every pixel of the row saturates (max T < 1/255) or the candidates run
   out — the CUDA rasterizer's per-pixel early termination (gsplat
   rasterize_to_pixels) at row granularity, which static-shape XLA cannot
   express. Valid-slot counts from kernel 1 arrive via scalar prefetch.

Forward-only: training/backward keeps the XLA path (ops/gs_raster.py) for
autodiff + absgrad.

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
_KCH = 2048        # candidate-axis CHUNK streamed per grid step. A
# [kch, A<=16] f32 VMEM block pads its lane dim to 128 (Mosaic (8,128)
# tiling) -> ~512 B per candidate per buffer; bringing the WHOLE kc list
# in at once is what hit Mosaic's 16 MB scoped-VMEM wall at kc just above
# 4096 (kc=43008 demanded 126 MB, round-3 bench). Chunking bounds every
# kc-dependent buffer at _KCH regardless of capacity class.
_KF_CAP = 2048     # per-16px-row compacted capacity cap: the [CF, kf, A]
# output block (and the composite kernel's [kf, A] row block) still pad
# A to 128 lanes, so kf is VMEM-bounded independently of kc. Rows fill in
# DEPTH ORDER, so truncation drops only the farthest (mostly occluded)
# tail; row_dropped stats report it. On synthetic ultra-dense tiles the
# row cap dominates quality vs exact (30.8 dB at kf=2048 vs 82 dB at
# full rows) — round-4 on-chip TODO: with chunking + row-wise zeroing the
# scoped-VMEM temporaries are bounded per statement, so probe whether the
# 16 MB comp BLOCK at kf=4096 compiles (block buffers draw on the 128 MB
# VMEM, not the 16 MB scoped pool) and raise this cap to the measured
# limit.
# saturation threshold: T < 1/255 (CUDA uses 1e-4; 1/255 matches our XLA
# path's alpha cutoff scale). Carried in log space by the kernel.
_LOG_STOP_T = -5.545      # log(1/255)
_LOG_CLAMP = -0.0010005   # log(ALPHA_CLAMP) = log(0.999)

# Row-capacity cap for EVAL escalated/high-capacity passes. The round-4
# compile gate proved kf=4096 lowers on the real v5e compiler
# (raster_eval_1066x1600_kc16384_kf4096 ok — BASELINE.md Aug 20); the
# round-4 bench then measured the kf=2048 cap to be the escalated path's
# residual quality gap (43.9 dB vs 50.7 global on the 600k scene: the
# densest rows reach 2401 > 2048). Composite work scales with per-row
# COUNTS, not kf, so the higher cap costs only tiles that actually hold
# more. Train keeps _KF_CAP (its bwd classes were gate-cleared there).
_KF_CAP_HI = 4096


def _compact_kernel(cand_ref, yb_ref, comp_ref, cnt_ref, st_ref, *,
                    kch: int, NB: int, kf: int, A: int, ts: int, CF: int,
                    TWc: int):
    """Compact one coarse tile's depth-sorted candidates into CF per-row
    lists, streaming the candidate axis in NB chunks of ``kch`` (grid =
    (Tc, NB), chunk axis innermost/sequential). ``cand_ref`` [1, kch, A]
    sublane-major attributes; ``yb_ref`` [1, 4, kch] lane-major (y0, y1,
    depth, pad) for the mask path. Outputs (revisited across chunks, so
    they stay VMEM-resident and flush once per tile): ``comp_ref``
    [1, CF, kf, A] compacted rows, ``cnt_ref`` [1, 8, CF] i32 valid-slot
    counts (sublane dim padded to 8 for Mosaic; row 0 carries the counts).
    ``st_ref`` SMEM [CF + 1] carries the per-row write bases across chunks
    (slot CF = 1 once the depth-sorted tail goes dead, so later chunks
    skip their walk)."""
    c = pl.program_id(0)
    bc = pl.program_id(1)
    tyc = c // TWc
    ty0 = (tyc * (ts * CF)).astype(jnp.float32)

    @pl.when(bc == 0)
    def _init():
        # zero row-by-row: a whole-block zeros temp scales with CF*kf
        for r in range(CF):
            comp_ref[0, r] = jnp.zeros((kf, A), jnp.float32)
        for r in range(CF + 1):
            st_ref[r] = 0

    # exclusive prefix along LANES: mask [CF, KB] @ strict-UPPER ones
    ri = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 1)
    triu = (ri < ci).astype(jnp.float32)

    nb = kch // _KB
    WIN = min(_KB + 8, kf)   # slot window: floor is 8-sublane aligned, so
    # positions within a block span < KB + 8 rows from it
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, _KB), 0) \
        .astype(jnp.float32)

    def cbody(carry):
        b = carry[0]
        bases = carry[1:CF + 1]
        blk = cand_ref[0, pl.ds(b * _KB, _KB), :]          # [KB, A]
        yrow = yb_ref[0, :, pl.ds(b * _KB, _KB)]           # [4, KB]
        y0r = yrow[0:1, :]
        y1r = yrow[1:2, :]
        alive = yrow[2:3, :] < 1e10                        # [1, KB]
        rr = jax.lax.broadcasted_iota(jnp.int32, (CF, 1), 0) \
            .astype(jnp.float32)
        rb0 = ty0 + rr * ts                                # [CF, 1]
        mask = (y0r < rb0 + ts) & (y1r > rb0) & alive      # [CF, KB]
        maskf = mask.astype(jnp.float32)
        epos = jax.lax.dot_general(                        # [CF, KB]
            maskf, triu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        new_bases = []
        for r in range(CF):   # CF independent chains per iteration
            base_r = bases[r]
            floor_r = jnp.clip((base_r // 8) * 8, 0, kf - WIN)
            # masked candidates -> position row; -1 never matches the iota
            rel = jnp.where(mask[r:r + 1, :], epos[r:r + 1, :]
                            + (base_r - floor_r).astype(jnp.float32),
                            -1.0)                          # [1, KB]
            ind = (slot_iota == rel).astype(jnp.float32)   # [WIN, KB]
            upd = jax.lax.dot_general(
                ind, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            comp_ref[0, r, pl.ds(floor_r, WIN), :] += upd
            new_bases.append(
                base_r + jnp.sum(maskf[r:r + 1, :]).astype(jnp.int32))
        return (b + 1, *new_bases, jnp.all(alive))

    def ccond(carry):
        b = carry[0]
        bases = carry[1:CF + 1]
        tail = carry[-1]
        any_open = bases[0] < kf
        for r in range(1, CF):
            any_open = any_open | (bases[r] < kf)
        return (b < nb) & any_open & tail

    init = (jnp.int32(0),) + tuple(st_ref[r] for r in range(CF)) \
        + (st_ref[CF] == 0,)
    out = jax.lax.while_loop(ccond, cbody, init)
    for r in range(CF):
        st_ref[r] = out[r + 1]
    st_ref[CF] = jnp.where(out[-1], 0, 1)   # dead depth-sorted tail

    @pl.when(bc == NB - 1)
    def _finalize():
        # scatter the CF scalar counts into output lanes via iota selects
        cnt = jnp.zeros((8, CF), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, CF), 1)
        for r in range(CF):
            cnt = jnp.where(lane == r, jnp.minimum(st_ref[r], kf), cnt)
        cnt_ref[0] = cnt


def round_coarse_capacity(kc: int) -> int:
    """Round a coarse capacity to what the chunked compaction kernel
    requires: a multiple of _KB, and of _KCH once above one chunk."""
    kc = max(_KB, -(-kc // _KB) * _KB)
    if kc > _KCH:
        kc = -(-kc // _KCH) * _KCH
    return kc


def default_row_capacity(kc: int, cap: int = _KF_CAP) -> int:
    """Default per-16px-row compacted capacity: kc/4 (rows saturate or run
    dry long before the coarse list), VMEM-capped at ``cap`` — the
    [CF, kf, A] comp block pads A to 128 lanes, so kf cannot scale with
    unbounded kc. Depth-ordered fill makes the cap drop only the farthest
    row tail (reported in row_dropped stats). Eval/escalation callers pass
    cap=_KF_CAP_HI (gate-verified); the train raster keeps _KF_CAP — its
    bwd buffer classes were gate-cleared at that kf."""
    kf = min(kc // 4, cap)
    return min(kc, max(_KB, -(-kf // _KB) * _KB))


def scoped_vmem_limit(block_bytes: int, n_blocks: int) -> int:
    """Per-kernel Mosaic scoped-VMEM limit for kernels whose VMEM-resident
    blocks outgrow the conservative 16 MB default (Mosaic charges revisited
    output blocks ~2x, and bwd kernels stage several kf-sized buffers).
    ``n_blocks * block_bytes`` models the kernel's resident blocks incl.
    that double-charge; +8 MB margin covers scratch/double-buffering. v5e
    has 128 MB VMEM total, so the 100 MB cap leaves the runtime headroom.
    Shared by the chunked compaction kernel and the train composite fwd/bwd
    (ADVICE r4: three hand-rolled variants had drifted)."""
    return min(100 * 2**20, max(32 * 2**20, n_blocks * block_bytes + 2**23))


def run_compact_chunked(cand, yb, *, Tc: int, kc: int, kf: int, A: int,
                        ts: int, CF: int, TWc: int, interpret: bool):
    """pallas_call plumbing for ``_compact_kernel``, shared by the eval
    (gs_raster_fused) and train (gs_raster_train) rasters. Grid (Tc, NB)
    streams the candidate axis in _KCH chunks (innermost/sequential);
    comp/cnt output blocks revisit the same block index across chunks so
    they stay VMEM-resident and flush once per coarse tile."""
    kch = min(kc, _KCH)
    assert kc % kch == 0, (kc, kch)
    NB = kc // kch
    compact = functools.partial(_compact_kernel, kch=kch, NB=NB, kf=kf,
                                A=A, ts=ts, CF=CF, TWc=TWc)
    # The revisited comp output block [1, CF, kf, A] pads A to 128 lanes
    # (CF*kf*128*4 B = 8.4 MB at CF=8/kf=2048); Mosaic charges ~2x that
    # against its default 16 MB scoped-VMEM budget (measured 18 MB at
    # kc=43008 on v5e, round 4) — constant in kc now that the candidate
    # axis streams in chunks. Raise the per-kernel limit with headroom for
    # the kf=4096 class; v5e has 128 MB VMEM total so 3x-block + margin is
    # conservative.
    vmem_limit = scoped_vmem_limit(CF * kf * 128 * 4, 3)
    return pl.pallas_call(
        compact,
        grid=(Tc, NB),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        in_specs=[pl.BlockSpec((1, kch, A), lambda c, b: (c, b, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, kch), lambda c, b: (c, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, CF, kf, A), lambda c, b: (c, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, CF), lambda c, b: (c, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Tc, CF, kf, A), jnp.float32),
                   jax.ShapeDtypeStruct((Tc, 8, CF), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((CF + 1,), jnp.int32)],
        interpret=interpret,
    )(cand, yb)


def _composite_kernel(cnt_ref, comp_ref, out_ref, acc_ref, lt_ref, *,
                      kf: int, A: int, C: int, ts: int, cts: int,
                      TWc: int, bf16_prefix: bool = False,
                      stop_lt: float = _LOG_STOP_T):
    """Composite one fine-tile row (ts x cts pixels) over its compacted
    candidate list (see module docstring). Candidate columns 0..A-1:
    [l11, l21, c1, l22, c2, lopa, colors...] with c1/c2 pre-shifted to
    coarse-tile-local pixel coordinates."""
    c = pl.program_id(0)
    fy = pl.program_id(1)
    P = ts * cts
    base = jnp.minimum(cnt_ref[c, fy], kf).astype(jnp.float32)

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

    acc_ref[:] = jnp.zeros_like(acc_ref)
    lt_ref[:] = jnp.zeros_like(lt_ref)
    nkf = kf // _KB

    def body(carry):
        b, _ = carry
        blk = comp_ref[0, 0, pl.ds(b * _KB, _KB), :]      # [KB, A]
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
        if bf16_prefix:
            # prefix matmul in bf16: tri is 0/1 (exact), log1m entries are
            # in [log(1-0.999), 0] so bf16 rounding is <=0.2% relative.
            pre = jax.lax.dot_general(
                tri.astype(jnp.bfloat16), log1m.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            pre = jax.lax.dot_general(                    # exclusive prefix
                tri, log1m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        lt = lt_ref[0:1, :]                               # [1, P] log T
        w = alpha * jnp.exp(pre + lt)                     # [KB, P]

        col_t = blk[:, 6:6 + C].T                         # [C, KB]
        if bf16_prefix:
            acc_ref[0:C, :] += jax.lax.dot_general(
                col_t.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            acc_ref[0:C, :] += jax.lax.dot_general(
                col_t, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        # block total = exclusive prefix at the last row + its own term
        lt_new = lt + pre[_KB - 1:_KB, :] + log1m[_KB - 1:_KB, :]
        lt_ref[0:1, :] = lt_new

        return b + 1, jnp.max(lt_new)

    def cond(carry):
        b, ltmax = carry
        return (b < nkf) & (b * _KB < base) & (ltmax > stop_lt)

    jax.lax.while_loop(cond, body, (0, jnp.float32(0.0)))

    out_ref[0, 0] = acc_ref[:]
    out_ref[0, 0, C:C + 1, :] = 1.0 - jnp.exp(lt_ref[0:1, :])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "coarse_factor",
                     "max_per_coarse", "max_per_row", "select_method",
                     "recall_target", "bf16_composite", "with_stats",
                     "escalate_tiles", "escalate_per_coarse",
                     "escalate_per_row", "escalate_classes",
                     "_debug_no_kernel", "_debug_phase1"))
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
    bf16_composite: bool = False,   # bf16 MXU for the prefix + color
    # matmuls; the elementwise chain stays f32 (log1p near alpha=1 needs
    # f32, and Mosaic lacks bf16 compares/log1p on v5e)
    with_stats: bool = False,   # capacity-overflow counters
    # --- overflow-tile escalation (round 4) ---------------------------
    # gsplat sizes its worklists per frame and pays per tile exactly what
    # the tile holds (street_gaussian_renderer.py:243-280). Static-shape
    # XLA cannot, and paying a dense scene's coarse_max for EVERY tile
    # collapsed drop-free dense renders to ~9 FPS (kc=43008 for all 117
    # tiles when only 25 overflow kc=4096). Escalation restores gsplat's
    # economics under static shapes: render at the base capacity, then
    # re-select/compact/composite ONLY the ``escalate_tiles`` densest
    # tiles at ``escalate_per_coarse`` and scatter their finished pixel
    # blocks over the base image. Tiles whose exact count fits the base
    # capacity keep their base render (the scatter drops them).
    escalate_tiles: int = 0,          # static budget of dense tiles (0=off)
    escalate_per_coarse: int = 0,     # capacity for escalated tiles
    escalate_per_row: int | None = None,  # their per-16px-row capacity
    # multi-class escalation (round 5): ((budget_tiles, kc_hi), ...) —
    # tiles pay the SMALLEST gate-cleared class that covers their measured
    # need instead of every overflowing tile paying the global maximum.
    # gsplat's per-tile worklist economics approximated at bucket
    # granularity: total re-render work ~ sum over tiles of their own
    # class, not n_overflow * kc_max. Overrides the single-class args.
    escalate_classes: tuple = (),
    _debug_no_kernel: bool = False,   # bench: run everything but kernels
    _debug_phase1: bool = False,      # bench: compaction kernel only
) -> RasterOutput:
    ts = tile_size
    CF = coarse_factor
    cts = ts * CF
    TWc = -(-width // cts)
    THc = -(-height // cts)
    Tc = THc * TWc
    n = u.shape[0]
    kc = round_coarse_capacity(min(max_per_coarse, n) if n >= _KB else _KB)
    C = colors.shape[-1]
    assert C <= 7, "packed output carries C color rows + 1 alpha row"

    x0 = u - radii
    x1 = u + radii
    y0 = v - radii
    y1 = v + radii
    depth_key = jnp.where(valid, depths, _INF)

    # packed attribute table in the kernel's Cholesky layout (see
    # _composite_kernel): conic M = [[ca, cb], [cb, cc]] = L L^T with
    # L = [[l11, 0], [l21, l22]] so sigma = 0.5*((l11 dx + l21 dy)^2 +
    # (l22 dy)^2) — evaluated by MXU matmul in the kernel,
    # cancellation-free
    l11 = jnp.sqrt(jnp.maximum(conic_a, 1e-12))
    l21 = conic_b / l11
    l22 = jnp.sqrt(jnp.maximum(conic_c - l21 * l21, 1e-12))
    lopa = jnp.where(valid & (opacities > 0),
                     jnp.log(jnp.maximum(opacities, 1e-30)), -1e30)
    attrs = jnp.concatenate(
        [jnp.stack([l11, l21, u, l22, v, lopa], -1), colors,
         jnp.stack([y0, y1], -1)], -1)
    A = 6 + C
    assert A >= 8, "kernel matmul reads candidate columns 0..7"

    # select_method="sort" (round 5): ONE global (tile, depth) lexsort of
    # the <=4N expanded pairs (ops/gs_raster._sort_pairs — the gsplat
    # worklist layout); every tile set / capacity class then reads its
    # depth-ordered candidates as contiguous windows. MEASURED LIMITATION
    # (BASELINE.md r5 decision record): the 4-corner-tile expansion misses
    # wide splats' interior tiles (18.4 dB vs exact on the full-res 600k
    # heavy-tail scene, where ~52% of pair mass comes from splats wider
    # than a coarse tile) and the [T, kc] window gathers are slow at high
    # kc — kept as an experimental mode for narrow-splat scenes; the
    # production quality path uses approx selection at recall 0.95
    sort_state = None
    if select_method == "sort":
        from .gs_raster import _sort_pairs
        sort_state = _sort_pairs(x0, x1, y0, y1, depth_key, TWc, THc, cts)

    def select_pack(cx0_, cy0_, kc_):
        """Coarse depth-selection + packed gather for one tile set: tiles
        given by their pixel origins [T, 1]. Returns (cand [T, kc_, A],
        yb [T, 4, kc_] lane-major mask columns, counts [T] exact per-tile
        candidate counts)."""
        if select_method == "sort":
            from .gs_raster import _sort_windows
            tids = ((cy0_[:, 0] / cts).astype(jnp.int32) * TWc
                    + (cx0_[:, 0] / cts).astype(jnp.int32))
            idxc, cand_depth = _sort_windows(*sort_state, tids, kc_)
            seg = sort_state[2]
            counts_ = seg[tids + 1] - seg[tids]
        else:
            inter_ = ((x0[None, :] < cx0_ + cts) & (x1[None, :] > cx0_)
                      & (y0[None, :] < cy0_ + cts) & (y1[None, :] > cy0_))
            key_ = jnp.where(inter_, depth_key[None, :], _INF)
            counts_ = (key_ < _INF).sum(axis=1)
            if select_method == "exact":
                neg_top, idxc = jax.lax.top_k(-key_, min(kc_, n))
                cand_depth = -neg_top
            else:
                cand_depth, idxc = jax.lax.approx_min_k(
                    key_, min(kc_, n), recall_target=recall_target,
                    aggregate_to_topk=True)
            if cand_depth.shape[1] < kc_:   # pad to a _KB multiple
                pad = kc_ - cand_depth.shape[1]
                cand_depth = jnp.pad(cand_depth, ((0, 0), (0, pad)),
                                     constant_values=_INF)
                idxc = jnp.pad(idxc, ((0, 0), (0, pad)))
        cnd = attrs[idxc]                                 # [T, kc_, 8+C]
        # shift the constant terms to coarse-tile-local pixel coordinates
        # (global 1600-px coords would cost ~3 digits of f32 in the kernel)
        ctrx = cx0_[:, 0] + 0.5 * cts
        ctry = cy0_[:, 0] + 0.5 * cts
        ul = cnd[..., 2] - ctrx[:, None]
        vl = cnd[..., 4] - ctry[:, None]
        c1 = -(cnd[..., 0] * ul + cnd[..., 1] * vl)
        c2 = -(cnd[..., 3] * vl)
        # lane-major mask columns for the compaction kernel:
        # (y0, y1, depth, 0). y bounds are shifted to TILE-LOCAL coords
        # (the kernel is then run with ty0=0 for every program — see
        # compose(): escalated tiles' grid indices are ranks, not tile
        # ids, so the kernel cannot derive tile origins from them)
        yb_ = jnp.stack([cnd[..., 6 + C] - cy0_, cnd[..., 7 + C] - cy0_,
                         cand_depth,
                         jnp.zeros_like(cand_depth)], axis=1)  # [T, 4, kc_]
        # columns: [l11, l21, c1, l22, c2, lopa, colors(C)]
        cnd = jnp.concatenate(
            [cnd[..., 0:2], c1[..., None], cnd[..., 3:4], c2[..., None],
             cnd[..., 5:6 + C]], -1)
        return cnd, yb_, counts_

    # coarse binning (phase 1 of ops/gs_raster.py), vectorized over tiles
    tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                            jnp.arange(TWc, dtype=jnp.float32),
                            indexing="ij")
    cx0 = (txc.reshape(-1) * cts)[:, None]
    cy0 = (tyc.reshape(-1) * cts)[:, None]
    cand, yb, counts_c = select_pack(cx0, cy0, kc)
    escalating = escalate_tiles > 0 or bool(escalate_classes)
    stats = None
    if with_stats:
        stats = {
            "coarse_max": counts_c.max(),
            "coarse_overflow_tiles": (counts_c > kc).sum(),
            "coarse_dropped": jnp.maximum(counts_c - kc, 0).sum(),
        }
        # per-class occupancy histogram: how many tiles exceed each
        # gate-cleared capacity class — sizes multi-class escalation
        # budgets (a probe needs the distribution, not just the max)
        for cls in (4096, 8192, 16384, 32768):
            stats[f"tiles_over_{cls}"] = (counts_c > cls).sum()
    cand_depth = yb[:, 2, :]

    # per-row capacity for the compaction kernel (a 16px row intersects
    # ~kc/8 of its coarse tile's candidates); VMEM-capped, see
    # default_row_capacity
    if max_per_row is not None:
        kf = min(kc, max(_KB, -(-max_per_row // _KB) * _KB))
    else:
        # eval path: the HI cap is gate-verified and composite work scales
        # with counts, so high-capacity global renders (kc>=16384) get the
        # row headroom their scenes imply instead of walling at 2048
        kf = default_row_capacity(kc, cap=_KF_CAP_HI)
    row_max_t = None
    if with_stats or escalating:
        # per-(tile, row) intersect counts over the SELECTED candidates:
        # exact for tiles whose total fits kc (complete candidate set); an
        # undercount for coarse-overflowing tiles, which the coarse term of
        # the escalation score already captures
        y0g = yb[:, 0, :]                                 # [Tc, kc] tile-local
        y1g = yb[:, 1, :]
        ry0s = (jnp.arange(CF, dtype=jnp.float32)
                * ts).reshape(1, -1, 1)                   # tile-local rows
        rinter = ((y0g[:, None, :] < ry0s + ts) & (y1g[:, None, :] > ry0s)
                  & (cand_depth[:, None, :] < _INF))      # [Tc, CF, kc]
        rcounts = rinter.sum(-1)
        row_max_t = rcounts.max(-1)                       # [Tc]
    if with_stats:
        stats = dict(stats or {})
        stats["row_max"] = rcounts.max()
        stats["row_dropped"] = jnp.maximum(rcounts - kf, 0).sum()
        # tiles the escalation score would pick: coarse OR row overflow
        stats["escalation_candidate_tiles"] = (
            jnp.maximum(counts_c / kc, row_max_t / kf) > 1.0).sum()

    P = ts * cts
    if _debug_no_kernel:
        z = jnp.full((height, width, C), jnp.sum(cand) * 1e-20
                     + jnp.sum(yb) * 1e-20)
        return RasterOutput(colors=z, alpha=z[..., 0], stats=stats)

    interpret = jax.default_backend() == "cpu"   # CPU tests

    # SPMD bridge: under a sharded jit (camera-DP batch render) the vmapped
    # camera axis enters the shard_map via vmap(spmd_axis_name=...); the
    # wrapped leading dim here is Tc, NOT a batch axis — guard misuse
    from ..parallel.kernel_shard import assert_no_context_axes, wrap_kernel
    assert_no_context_axes("gs_raster_fused")

    def compose(cand_, yb_, Tn, kc_, kf_, want_phase1=False):
        """Compaction + composite kernels over one tile set -> packed
        [Tn, CF, 8, P] pixel blocks (rows: C colors, then alpha)."""
        def _run_compact(c_, y_):
            # TWc=Tn makes the kernel's tile row index (c // TWc) zero for
            # every program: y bounds arrive TILE-LOCAL from select_pack
            return run_compact_chunked(c_, y_, Tc=Tn, kc=kc_, kf=kf_, A=A,
                                       ts=ts, CF=CF, TWc=Tn,
                                       interpret=interpret)

        comp, cnt = wrap_kernel(_run_compact, in_ranks=(3, 3),
                                out_ranks=(4, 3))(cand_, yb_)
        cnt = cnt[:, 0, :]                                 # [Tn, CF]
        if want_phase1:
            return comp, cnt

        composite = functools.partial(
            _composite_kernel, kf=kf_, A=A, C=C, ts=ts, cts=cts, TWc=TWc,
            bf16_prefix=bf16_composite)

        def _run_composite(cnt_, comp_):
            return pl.pallas_call(
                composite,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(Tn, CF),
                    in_specs=[pl.BlockSpec((1, 1, kf_, A),
                                           lambda c, f, cnt: (c, f, 0, 0))],
                    out_specs=pl.BlockSpec((1, 1, 8, P),
                                           lambda c, f, cnt: (c, f, 0, 0)),
                    scratch_shapes=[pltpu.VMEM((8, P), jnp.float32),
                                    pltpu.VMEM((8, P), jnp.float32)]),
                out_shape=jax.ShapeDtypeStruct((Tn, CF, 8, P), jnp.float32),
                interpret=interpret,
            )(cnt_, comp_)

        return wrap_kernel(_run_composite, in_ranks=(2, 4),
                           out_ranks=4)(cnt.reshape(Tn, CF), comp)

    if _debug_phase1:
        comp, cnt = compose(cand, yb, Tc, kc, kf, want_phase1=True)
        z = jnp.full((height, width, C),
                     jnp.sum(cnt).astype(jnp.float32) * 1e-20
                     + jnp.sum(comp[:, :, 0, 0]) * 1e-20)
        return RasterOutput(colors=z, alpha=z[..., 0], stats=stats)

    packed = compose(cand, yb, Tc, kc, kf)

    # ---- overflow-tile escalation ---------------------------------------
    # Second pass(es) over the densest tiles at higher capacity; finished
    # pixel blocks replace the base tiles' blocks. Tiles that fit the base
    # capacity keep the base render (their scatter index is pushed out of
    # range -> dropped). Multi-class (round 5): classes run from the
    # HIGHEST capacity down; each tile lands in the smallest class covering
    # its measured need (coarse count AND row max), so a 9k-count tile no
    # longer pays the 43k class alongside a 38k-count one.
    if escalate_classes:
        classes = []
        for budget, kc_c in sorted(escalate_classes, key=lambda t: -t[1]):
            kc_c = round_coarse_capacity(min(max(kc_c, kc), n))
            classes.append((min(int(budget), Tc), kc_c,
                            default_row_capacity(kc_c, cap=_KF_CAP_HI)))
    elif escalate_tiles > 0:
        kc_hi = round_coarse_capacity(min(max(escalate_per_coarse, kc), n))
        if escalate_per_row is not None:
            kf_hi = min(kc_hi, max(_KB, -(-escalate_per_row // _KB) * _KB))
        else:
            kf_hi = default_row_capacity(kc_hi, cap=_KF_CAP_HI)
        classes = [(min(escalate_tiles, Tc), kc_hi, kf_hi)]
    else:
        classes = []

    if classes:
        # escalation score: worst capacity deficit across BOTH drop sites —
        # the coarse depth-selection (counts_c vs kc) and the per-16px-row
        # compaction (row_max_t vs kf). A tile whose total fits kc can
        # still drop the far tail of a dense row at kf (the measured 6.8 dB
        # residual vs global high capacity on the 600k headline scene was
        # exactly these row drops, BASELINE.md); the escalated pass's kf_hi
        # clears them
        score = jnp.maximum(counts_c.astype(jnp.float32) / kc,
                            row_max_t.astype(jnp.float32) / kf)
        taken = jnp.zeros((Tc,), bool)
        n_escalated = jnp.zeros((), jnp.int32)
        dropped_esc = jnp.maximum(counts_c - kc, 0).sum()
        for j, (budget, kc_j, kf_j) in enumerate(classes):
            # a tile is eligible for class j only if the NEXT class down
            # (or the base pass) could not hold it — both drop sites
            kc_lo, kf_lo = (classes[j + 1][1:] if j + 1 < len(classes)
                            else (kc, kf))
            eligible = (((counts_c > kc_lo) | (row_max_t > kf_lo))
                        & ~taken)
            score_j = jnp.where(eligible, score, 0.0)
            top_scores, top_ids = jax.lax.top_k(score_j, budget)
            esc_valid = top_scores > 1.0                   # [budget]
            cand_hi, yb_hi, _ = select_pack(cx0[top_ids], cy0[top_ids],
                                            kc_j)
            packed_hi = compose(cand_hi, yb_hi, budget, kc_j, kf_j)
            ids_eff = jnp.where(esc_valid, top_ids, Tc)    # Tc = dropped
            packed = packed.at[ids_eff].set(packed_hi, mode="drop")
            taken = taken.at[ids_eff].set(True, mode="drop")
            n_escalated = n_escalated + esc_valid.sum()
            top_counts = counts_c[top_ids]
            # residual coarse-drop accounting: escalated tiles clamp at
            # their class capacity instead of the base kc
            dropped_esc = dropped_esc - jnp.where(
                esc_valid, jnp.maximum(top_counts - kc, 0), 0).sum() \
                + jnp.where(
                    esc_valid, jnp.maximum(top_counts - kc_j, 0), 0).sum()
        if with_stats:
            stats = dict(stats or {})
            stats["escalated_tiles"] = n_escalated
            stats["coarse_dropped_escalated"] = dropped_esc

    # [Tc, CF(fy), 8, ts*cts] -> [H, W, 8] -> crop
    img = packed.reshape(THc, TWc, CF, 8, ts, cts)
    img = img.transpose(0, 2, 4, 1, 5, 3)                 # tyc, fy, py, txc, px, ch
    img = img.reshape(THc * cts, TWc * cts, 8)[:height, :width]
    return RasterOutput(colors=img[..., :C], alpha=img[..., C], stats=stats)
