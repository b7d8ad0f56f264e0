"""Trainable Pallas rasterization: fused forward + analytic backward.

The training path so far differentiated the padded XLA rasterizer
(ops/gs_raster.py) by autodiff — correct, but the cumprod/transmittance
chains rematerialize poorly and dominate the 90 ms GS train step. This
module runs the same two-kernel design as the eval path
(ops/gs_raster_fused.py: batched per-row candidate compaction + compacted
compositing) with a hand-derived backward kernel, wrapped in a
``jax.custom_vjp`` whose boundary is the composite stage:

  XLA (differentiable): projection -> Cholesky/log/tile-local transforms ->
      coarse depth selection (indices stop-grad) -> candidate gather
  Pallas (custom vjp): composite fwd  == eval kernel (f32, full recall)
                       composite bwd == one kernel per fine row that
      recomputes alpha/transmittance (pass 1 stores per-block base log-T),
      then walks blocks in REVERSE accumulating the suffix term
      S_j = sum_{j'>j} w_j' (c_j' . g_c) with a strict-upper-triangular
      ones matmul, and emits per-candidate grads for every packed column:

        dalpha_jp = T_j (c_j.g_c)_p - (S_jp - g_a,p T_N,p) / (1-alpha_jp)
        dsigma    = -alpha * dalpha          (gated by cutoff+clamp)
        dz1 = dsigma z1, dz2 = dsigma z2
        d(l11,l21,c1,l22,c2) = dz1 @ X1^T + dz2 @ X2^T   (the forward's
            monomial matrices, transposed - one MXU matmul)
        dlopa = -sum_p dsigma; dcolors = w @ g_c^T
        absgrad columns (gsplat absgrad=True, renderer :183,279):
            au = |l11| sum_p |dz1|, av = sum_p |dz1 l21 + dz2 l22|
            (dL/d(dx)_p = dz1 l11, dL/d(dy)_p = dz1 l21 + dz2 l22)

XLA autodiff then chains the candidate-gather scatter-adds and the
Cholesky/log transforms back to (u, v, conic, opacity, colors) and the
absgrad sink for free.

One deliberate semantic note: the forward early-exits a row when every
pixel saturates (T < 1/255); the backward walks the full compacted list,
so candidates the forward skipped receive their (sub-1/255-weight)
gradients instead of exact zeros — the same class of cutoff approximation
the CUDA rasterizer makes per pixel.

Reference parity: gsplat rasterize_to_pixels fwd+bwd semantics
(street_gaussian_renderer.py:243-280; alpha clamp 0.999, 1/255 cutoff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gs_raster import RasterOutput, _INF
from .gs_raster_fused import (_KB, _LOG_CLAMP, _LOG_STOP_T,
                              _composite_kernel, default_row_capacity,
                              round_coarse_capacity, run_compact_chunked,
                              scoped_vmem_limit)


def _composite_bwd_kernel(cnt_ref, comp_ref, dout_ref, dcomp_ref,
                          lt_ref, *, kf: int, A: int, C: int, ts: int,
                          cts: int):
    """Backward for one fine-tile row. comp_ref [1, 1, kf, A] packed
    candidates (cols 0..5 = l11, l21, c1, l22, c2, lopa; 6..6+C-1 colors;
    6+C, 7+C absgrad sinks); dout_ref [1, 1, 8, P] cotangents (rows 0..C-1
    colors, row C alpha); dcomp_ref same shape as comp_ref.
    lt_ref scratch [max(nb,8), P]: per-block base log-transmittance."""
    c = pl.program_id(0)
    fy = pl.program_id(1)
    P = ts * cts
    nb = kf // _KB
    base = jnp.minimum(cnt_ref[c, fy], kf).astype(jnp.float32)

    half = 0.5 * cts
    y_loc0 = (fy * ts).astype(jnp.float32) - half
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxl = (pid % cts).astype(jnp.float32) + 0.5 - half    # [1, P]
    pyl = y_loc0 + (pid // cts).astype(jnp.float32) + 0.5

    zero = jnp.zeros((1, P), jnp.float32)
    one = jnp.ones((1, P), jnp.float32)
    # monomial rows paired with candidate cols (l11, l21, c1, l22, c2,
    # lopa, color0, color1); X3 routes -dsigma into the lopa column
    x1m = jnp.concatenate([pxl, pyl, one, zero, zero, zero, zero, zero], 0)
    x2m = jnp.concatenate([zero, zero, zero, pyl, one, zero, zero, zero], 0)
    x3m = jnp.concatenate([zero, zero, zero, zero, zero, -one, zero, zero], 0)

    ri = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 1)
    triu = (ci > ri).astype(jnp.float32)   # strict upper: suffix sums

    gc = dout_ref[0, 0, 0:C, :]                           # [C, P] f32
    ga = dout_ref[0, 0, C:C + 1, :]                       # [1, P]

    def alphas(b):
        """Recompute the block's (alpha, log1m, z1, z2, active, w-parts)."""
        blk = comp_ref[0, 0, pl.ds(b * _KB, _KB), :]
        slot = jax.lax.broadcasted_iota(jnp.int32, (_KB, 1), 0) \
            .astype(jnp.float32) + float(b * _KB)
        alive = slot < base
        a = blk[:, 0:8]
        z1 = jax.lax.dot_general(a, x1m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        z2 = jax.lax.dot_general(a, x2m, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lraw = blk[:, 5:6] - 0.5 * (z1 * z1 + z2 * z2)    # pre-clamp
        keep = (lraw >= _LOG_STOP_T) & alive
        lalpha = jnp.minimum(lraw, _LOG_CLAMP)
        alpha = jnp.where(keep, jnp.exp(lalpha), 0.0)
        active = keep & (lraw < _LOG_CLAMP)   # clamp kills the gradient
        log1m = jnp.log1p(-alpha)
        return blk, z1, z2, alpha, log1m, active

    # pass 1: forward walk storing each block's base log-T (static unroll,
    # nb is small — kf/128)
    lt = jnp.zeros((1, P), jnp.float32)
    for b in range(nb):
        lt_ref[b, :] = lt[0]
        _, _, _, _, log1m, _ = alphas(b)
        lt = lt + jnp.sum(log1m, axis=0, keepdims=True)
    t_fin = jnp.exp(lt)                                   # [1, P] T_N

    # pass 2: reverse walk with the suffix accumulator
    suffix = jnp.zeros((1, P), jnp.float32)
    for b in range(nb - 1, -1, -1):
        blk, z1, z2, alpha, log1m, active = alphas(b)
        lt0 = lt_ref[b, :][None]                          # [1, P]
        pre = jax.lax.dot_general(                        # exclusive prefix
            (ci < ri).astype(jnp.float32), log1m,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = jnp.exp(lt0 + pre)                            # [KB, P] T_j
        w = alpha * t
        cdot = jax.lax.dot_general(                       # [KB, P]
            blk[:, 6:6 + C], gc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        wc = w * cdot
        s = suffix + jax.lax.dot_general(                 # within-block suffix
            triu, wc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        inv1m = 1.0 / (1.0 - alpha)                       # alpha <= 0.999
        dalpha = t * cdot - (s - ga * t_fin) * inv1m
        dsig = jnp.where(active, -alpha * dalpha, 0.0)
        # gate z before the product: inactive rows may hold non-finite z
        # (degenerate splats) and 0 * NaN = NaN
        dz1 = dsig * jnp.where(active, z1, 0.0)
        dz2 = dsig * jnp.where(active, z2, 0.0)

        dattr = jax.lax.dot_general(dz1, x1m, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dattr += jax.lax.dot_general(dz2, x2m, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dattr += jax.lax.dot_general(dsig, x3m, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dcol = jax.lax.dot_general(w, gc, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        l21 = blk[:, 1:2]
        l22 = blk[:, 3:4]
        au = jnp.abs(blk[:, 0:1]) * jnp.sum(jnp.abs(dz1), axis=1,
                                            keepdims=True)
        av = jnp.sum(jnp.abs(dz1 * l21 + dz2 * l22), axis=1, keepdims=True)

        out = jnp.concatenate([dattr[:, 0:6], dcol, au, av], axis=1)
        pad = A - out.shape[1]
        if pad > 0:
            out = jnp.concatenate(
                [out, jnp.zeros((_KB, pad), jnp.float32)], axis=1)
        dcomp_ref[0, 0, b * _KB:(b + 1) * _KB, :] = out
        suffix = suffix + jnp.sum(wc, axis=0, keepdims=True)


@functools.lru_cache(maxsize=32)
def _make_composite_train(kf: int, A: int, C: int, ts: int, cts: int,
                          Tc: int, CF: int, interpret: bool,
                          TWc: int = 0):
    """Returns composite(comp, cnt) -> [THc*cts, TWc*cts, 8] image.

    The packed<->image transposes live INSIDE the custom_vjp: the Pallas
    custom-calls constrain their operands to default layouts, and exposing
    the packed [Tc, CF, 8, P] tensor at the vjp boundary lets those
    constraints propagate into whatever produces the cotangent — measured
    catastrophically with SSIM in the loss (its conv-transpose backward
    compiled into pathological layouts: 45 -> 215 ms for the whole step).
    With an [H, W, 8] boundary the cotangent is a plain image and the
    repack transpose is explicit."""
    P = ts * cts
    THc = Tc // TWc

    def unpack(packed):
        img = packed.reshape(THc, TWc, CF, 8, ts, cts)
        img = img.transpose(0, 2, 4, 1, 5, 3)
        return img.reshape(THc * cts, TWc * cts, 8)

    def pack_cotangent(d_img):
        d = d_img.reshape(THc, CF, ts, TWc, cts, 8)
        d = d.transpose(0, 3, 1, 5, 2, 4)
        return d.reshape(Tc, CF, 8, P)

    # training saturation stop at T < 1e-4 (the CUDA rasterizer's own
    # threshold) rather than the eval path's 1/255 — keeps fwd/bwd
    # discrepancy from dropped candidates below 1e-4 of a color unit
    fwd_kernel = functools.partial(
        _composite_kernel, kf=kf, A=A, C=C, ts=ts, cts=cts, TWc=0,
        bf16_prefix=False, stop_lt=-9.22)

    def run_fwd(comp, cnt):
        return pl.pallas_call(
            fwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Tc, CF),
                in_specs=[pl.BlockSpec((1, 1, kf, A),
                                       lambda c, f, cnt: (c, f, 0, 0))],
                out_specs=pl.BlockSpec((1, 1, 8, P),
                                       lambda c, f, cnt: (c, f, 0, 0)),
                scratch_shapes=[pltpu.VMEM((8, P), jnp.float32),
                                pltpu.VMEM((8, P), jnp.float32)]),
            out_shape=jax.ShapeDtypeStruct((Tc, CF, 8, P), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=scoped_vmem_limit(kf * 128 * 4, 4)),
            interpret=interpret,
        )(cnt, comp)

    bwd_kernel = functools.partial(
        _composite_bwd_kernel, kf=kf, A=A, C=C, ts=ts, cts=cts)
    nb = kf // _KB
    # The [1, 1, kf, A] comp/dcomp blocks pad A=12 to 128 lanes (kf*128*4 B
    # = 1 MB at kf=2048) and the bwd stages comp in + dcomp out (+ double
    # buffering); the default 16 MB scoped-VMEM stack walls kf>=2048
    # classes (gate round 4: "allocating on stack for ... f32[40,8,2048,12]
    # custom-call"). Same cure as the compaction kernel: raise the
    # per-kernel limit — v5e has 128 MB VMEM (scoped_vmem_limit).
    train_params = pltpu.CompilerParams(
        vmem_limit_bytes=scoped_vmem_limit(kf * 128 * 4, 6))

    def run_bwd(comp, cnt, dout):
        # dcomp ALIASES comp (operand 1 counting the scalar prefetch):
        # each (c, fy) program owns its block exclusively and pass 2 reads
        # chunk b before writing it, so in-place is safe; comp is dead
        # after this call (it exists only as this vjp's residual). Beyond
        # the Tc*CF*kf*A*4-byte HBM saving, this removes the out-of-place
        # output buffer that XLA allocated ON THE VMEM STACK for the bwd
        # custom-call — the allocation that walled kf=2048 classes
        # (gate round 4: f32[40,8,2048,12] = 31 MB vs the 16 MB stack;
        # kf=1024's 15.7 MB fit, which is why the default class passed)
        return pl.pallas_call(
            bwd_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Tc, CF),
                in_specs=[pl.BlockSpec((1, 1, kf, A),
                                       lambda c, f, cnt: (c, f, 0, 0)),
                          pl.BlockSpec((1, 1, 8, P),
                                       lambda c, f, cnt: (c, f, 0, 0))],
                out_specs=pl.BlockSpec((1, 1, kf, A),
                                       lambda c, f, cnt: (c, f, 0, 0)),
                scratch_shapes=[pltpu.VMEM((max(nb, 8), P), jnp.float32)]),
            out_shape=jax.ShapeDtypeStruct((Tc, CF, kf, A), jnp.float32),
            input_output_aliases={1: 0},
            compiler_params=train_params,
            interpret=interpret,
        )(cnt, comp, dout)

    @jax.custom_vjp
    def composite(comp, cnt):
        return unpack(run_fwd(comp, cnt))

    def composite_fwd(comp, cnt):
        return unpack(run_fwd(comp, cnt)), (comp, cnt)

    def composite_bwd(res, d_img):
        comp, cnt = res
        return run_bwd(comp, cnt, pack_cotangent(d_img)), None

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "coarse_factor",
                     "max_per_coarse", "max_per_row", "select_method",
                     "recall_target", "with_stats"))
def rasterize_pixels_trainable(
    u: jax.Array,
    v: jax.Array,
    conic_a: jax.Array,
    conic_b: jax.Array,
    conic_c: jax.Array,
    colors: jax.Array,     # [N, C]
    opacities: jax.Array,  # [N]
    depths: jax.Array,
    valid: jax.Array,
    radii: jax.Array,
    absgrad_sink: jax.Array | None = None,   # [N, 2] zeros; cotangent =
    # per-pixel |dL/d(u,v)| sums (gsplat absgrad channel)
    width: int = 0,
    height: int = 0,
    tile_size: int = 16,
    coarse_factor: int = 8,
    max_per_coarse: int = 4096,
    max_per_row: int | None = None,
    select_method: str = "approx",
    recall_target: float = 0.95,   # training default (gradient coverage)
    with_stats: bool = False,
) -> RasterOutput:
    ts = tile_size
    CF = coarse_factor
    cts = ts * CF
    TWc = -(-width // cts)
    THc = -(-height // cts)
    Tc = THc * TWc
    n = u.shape[0]
    kc = round_coarse_capacity(min(max_per_coarse, n) if n >= _KB else _KB)
    assert kc <= 65536, ("compacted index hi/lo bytes are bf16-exact only "
                         "to 65535 (see the pos packing below)")
    C = colors.shape[-1]
    assert C <= 7, "packed output carries C color rows + 1 alpha row"

    x0 = u - radii
    x1 = u + radii
    y0 = v - radii
    y1 = v + radii
    depth_key = jnp.where(valid, depths, _INF)

    tyc, txc = jnp.meshgrid(jnp.arange(THc, dtype=jnp.float32),
                            jnp.arange(TWc, dtype=jnp.float32),
                            indexing="ij")
    cx0 = (txc.reshape(-1) * cts)[:, None]
    cy0 = (tyc.reshape(-1) * cts)[:, None]
    inter = ((x0[None, :] < cx0 + cts) & (x1[None, :] > cx0)
             & (y0[None, :] < cy0 + cts) & (y1[None, :] > cy0))
    key = jnp.where(inter, depth_key[None, :], _INF)
    stats = None
    if with_stats:
        counts_c = (key < _INF).sum(axis=1)
        stats = {
            "coarse_max": counts_c.max(),
            "coarse_overflow_tiles": (counts_c > kc).sum(),
            "coarse_dropped": jnp.maximum(counts_c - kc, 0).sum(),
        }
    if select_method == "exact":
        neg_top, idxc = jax.lax.top_k(-key, min(kc, n))
        cand_depth = -neg_top
    else:
        cand_depth, idxc = jax.lax.approx_min_k(
            key, min(kc, n), recall_target=recall_target,
            aggregate_to_topk=True)
    if cand_depth.shape[1] < kc:
        pad = kc - cand_depth.shape[1]
        cand_depth = jnp.pad(cand_depth, ((0, 0), (0, pad)),
                             constant_values=_INF)
        idxc = jnp.pad(idxc, ((0, 0), (0, pad)))
    idxc = jax.lax.stop_gradient(idxc)
    cand_depth = jax.lax.stop_gradient(cand_depth)

    # ---- index compaction (stop-grad; reuses the eval compaction kernel
    # with the candidate's own position as its single attribute) ----------
    yb = jnp.stack([y0[idxc], y1[idxc], cand_depth,
                    jnp.zeros_like(cand_depth)], axis=1)    # [Tc, 4, kc]
    yb = jax.lax.stop_gradient(yb)
    # candidate positions split into bf16-exact byte components: the
    # compaction kernel's one-hot accumulation matmul runs on the MXU,
    # which demotes f32 operands to bf16 — a raw index 4093 would round to
    # 4096 (out of range). hi/lo <= 255 are exact in bf16.
    ar = jnp.arange(kc, dtype=jnp.int32)
    pos = jnp.stack([(ar // 256).astype(jnp.float32),
                     (ar % 256).astype(jnp.float32)], axis=-1)
    pos = jnp.broadcast_to(pos[None], (Tc, kc, 2))
    pos = jnp.concatenate(
        [pos, jnp.zeros((Tc, kc, 6), jnp.float32)], axis=-1)  # [Tc, kc, 8]

    if max_per_row is not None:
        kf = min(kc, max(_KB, -(-max_per_row // _KB) * _KB))
    else:
        kf = default_row_capacity(kc)
    interpret = jax.default_backend() == "cpu"

    def _run_compact(pos_, yb_):
        return run_compact_chunked(pos_, yb_, Tc=Tc, kc=kc, kf=kf, A=8,
                                   ts=ts, CF=CF, TWc=TWc,
                                   interpret=interpret)

    # SPMD bridge (parallel/kernel_shard.py): under a camera-DP mesh the
    # vmapped camera axis enters via vmap(spmd_axis_name=...); all
    # per-camera dims are replicated in the inner specs. Leading dim is Tc,
    # NOT a batch axis — guard non-empty-axes contexts (ADVICE r3)
    from ..parallel.kernel_shard import assert_no_context_axes, wrap_kernel
    assert_no_context_axes("gs_raster_train")
    _run_compact = wrap_kernel(_run_compact, in_ranks=(3, 3),
                               out_ranks=(4, 3))
    comp_pos, cnt = _run_compact(jax.lax.stop_gradient(pos), yb)
    cnt = cnt[:, 0, :]                                      # [Tc, CF]
    comp_idx = jax.lax.stop_gradient(
        jnp.round(comp_pos[..., 0]).astype(jnp.int32) * 256
        + jnp.round(comp_pos[..., 1]).astype(jnp.int32))    # [Tc, CF, kf]
    comp_idx = jnp.clip(comp_idx, 0, kc - 1)

    if with_stats:
        ry0s = cy0.reshape(-1, 1, 1) + (jnp.arange(CF, dtype=jnp.float32)
                                        * ts).reshape(1, -1, 1)
        y0g = yb[:, 0, :]
        y1g = yb[:, 1, :]
        rinter = ((y0g[:, None, :] < ry0s + ts) & (y1g[:, None, :] > ry0s)
                  & (cand_depth[:, None, :] < _INF))
        rcounts = rinter.sum(-1)
        stats["row_max"] = rcounts.max()
        stats["row_dropped"] = jnp.maximum(rcounts - kf, 0).sum()

    # ---- differentiable packing: Cholesky + tile-local coords ------------
    # invalid splats may carry garbage/NaN conics from the projection; pin
    # their geometry to benign constants (their lopa = -1e30 already zeroes
    # alpha, but NaN z1/z2 would poison the backward via 0*NaN)
    ok = valid & (opacities > 0)
    safe = lambda x, alt=0.0: jnp.where(ok, x, alt)
    l11 = jnp.sqrt(jnp.maximum(safe(conic_a, 1.0), 1e-12))
    l21 = safe(conic_b) / l11
    l22 = jnp.sqrt(jnp.maximum(safe(conic_c, 1.0) - l21 * l21, 1e-12))
    u = safe(u)
    v = safe(v)
    lopa = jnp.where(ok, jnp.log(jnp.maximum(opacities, 1e-30)), -1e30)
    parts = [jnp.stack([l11, l21, u, l22, v, lopa], -1), colors]
    if absgrad_sink is not None:
        parts.append(absgrad_sink)
    else:
        parts.append(jnp.zeros((n, 2), jnp.float32))
    attrs = jnp.concatenate(parts, -1)                      # [N, 6+C+2]
    cand = attrs[idxc]                                      # [Tc, kc, A]
    ctrx = (jnp.arange(Tc) % TWc).astype(jnp.float32) * cts + 0.5 * cts
    ctry = (jnp.arange(Tc) // TWc).astype(jnp.float32) * cts + 0.5 * cts
    ul = cand[..., 2] - ctrx[:, None]
    vl = cand[..., 4] - ctry[:, None]
    c1 = -(cand[..., 0] * ul + cand[..., 1] * vl)
    c2 = -(cand[..., 3] * vl)
    cand = jnp.concatenate(
        [cand[..., 0:2], c1[..., None], cand[..., 3:4], c2[..., None],
         cand[..., 5:]], -1)
    A = cand.shape[-1]
    assert A >= 8

    comp = jnp.take_along_axis(cand[:, None], comp_idx[..., None],
                               axis=2)                  # [Tc, CF, kf, A]

    composite = _make_composite_train(kf, A, C, ts, cts, Tc, CF, interpret,
                                      TWc=TWc)
    composite = wrap_kernel(composite, in_ranks=(4, 2), out_ranks=3)
    img = composite(comp, cnt)[:height, :width]
    return RasterOutput(colors=img[..., :C], alpha=img[..., C], stats=stats)
