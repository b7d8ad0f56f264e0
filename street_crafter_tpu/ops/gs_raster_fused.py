"""Fused Pallas compositing for the Gaussian rasterizer (eval/render path).

Replaces phase 2 of ops/gs_raster.py (fine binning + cumprod compositing)
with one Pallas kernel. The XLA path materializes several [kf, pixels]
intermediates per fine row in HBM (alpha, 1-alpha, inclusive/exclusive
transmittance, weights) and pays a per-fine-tile ``approx_min_k``; here the
whole chain runs in VMEM with NO fine selection at all — each fine-tile row
walks its parent coarse tile's depth-sorted candidate list directly:

- grid = (coarse_tile, fine_row): the [kc, A] candidate block is fetched
  into VMEM once per coarse tile and reused by its CF fine rows (Pallas
  skips the DMA when the block index is unchanged);
- per step, candidates stream in blocks of 128 through an early-exiting
  ``lax.while_loop``: compute alpha [128, ts*cts], turn the sequential
  over-operator into one MXU matmul (exclusive prefix-sum of log(1-alpha)
  via a strict-lower-triangular ones matrix — no cumprod primitive needed),
  accumulate color via a second matmul, carry transmittance in scratch;
- the loop stops as soon as every pixel of the row is saturated
  (max T < 1/255) or the (depth-sorted) candidate list runs out — the CUDA
  rasterizer's per-pixel early termination (gsplat rasterize_to_pixels), at
  row granularity, which static-shape XLA cannot express.

Compared to the XLA fine stage this composites from the FULL coarse
candidate list (no max_per_tile capacity, no fine-stage recall loss), so it
is both faster and closer to the oracle. Forward-only: training/backward
keeps the XLA path (ops/gs_raster.py) for autodiff + absgrad.

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

from .gs_raster import ALPHA_CLAMP, ALPHA_MIN, RasterOutput, _INF

_KB = 128          # candidate block (sublane axis of the alpha matrix)
_STOP_T = ALPHA_MIN  # transmittance saturation threshold (CUDA uses 1e-4;
# 1/255 matches our XLA path's alpha cutoff scale)


def _composite_kernel(cand_ref, out_ref, acc_ref, t_ref, *,
                      kc: int, A: int, C: int, ts: int, cts: int,
                      CF: int, TWc: int):
    """One fine-tile row (ts x cts pixels) of one coarse tile."""
    c = pl.program_id(0)           # coarse tile index (row-major)
    fy = pl.program_id(1)          # fine row within the coarse tile
    P = ts * cts

    # global pixel-center coords of this row, pixel order p = py*cts + px
    tyc = c // TWc
    txc = c % TWc
    x0 = (txc * cts).astype(jnp.float32)
    y0 = (tyc * cts + fy * ts).astype(jnp.float32)
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    pxg = x0 + (pid % cts).astype(jnp.float32) + 0.5     # [1, P]
    pyg = y0 + (pid // cts).astype(jnp.float32) + 0.5

    # strict lower-triangular ones: exclusive prefix over the block via MXU
    ri = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 1)
    tri = (ci < ri).astype(jnp.float32)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    t_ref[:] = jnp.ones_like(t_ref)

    nb = kc // _KB

    def body(carry):
        b, _ = carry
        blk = cand_ref[0, pl.ds(b * _KB, _KB), :]        # [KB, A]
        u = blk[:, 0:1]
        v = blk[:, 1:2]
        ca = blk[:, 2:3]
        cb = blk[:, 3:4]
        cc = blk[:, 4:5]
        opa = blk[:, 5:6]
        depth = blk[:, A - 1:A]
        alive = depth < 1e10                              # [KB, 1]

        dx = pxg - u                                      # [KB, P]
        dy = pyg - v
        sigma = (0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy)
        alpha = opa * jnp.exp(-jnp.maximum(sigma, 0.0))
        alpha = jnp.minimum(alpha, ALPHA_CLAMP)
        keep = (alpha >= ALPHA_MIN) & (sigma >= 0.0) & alive
        alpha = jnp.where(keep, alpha, 0.0)

        log1m = jnp.log1p(-alpha)                         # [KB, P]
        pre = jax.lax.dot_general(                        # exclusive prefix
            tri, log1m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_row = t_ref[0:1, :]                             # [1, P]
        w = alpha * jnp.exp(pre) * t_row                  # [KB, P]

        col_t = blk[:, 6:6 + C].T                         # [C, KB]
        acc_ref[0:C, :] += jax.lax.dot_general(
            col_t, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        t_new = t_row * jnp.exp(jnp.sum(log1m, axis=0, keepdims=True))
        t_ref[0:1, :] = t_new

        # stop when saturated or the sorted candidate list ran out
        any_tail = jnp.all(alive)     # block full => more may follow
        tmax = jnp.max(t_new)
        return b + 1, jnp.where(any_tail, tmax, 0.0)

    def cond(carry):
        b, tmax = carry
        return (b < nb) & (tmax > _STOP_T)

    jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))

    out_ref[0, 0] = acc_ref[:]
    out_ref[0, 0, C:C + 1, :] = 1.0 - t_ref[0:1, :]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "coarse_factor",
                     "max_per_coarse", "select_method", "recall_target",
                     "with_stats"))
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
    select_method: str = "approx",
    recall_target: float = 0.95,
    with_stats: bool = False,   # coarse-capacity overflow counters (the
    # fused path has NO fine capacity: every coarse candidate is composited)
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
    if cand_depth.shape[1] < kc:   # pad to a _KB multiple
        pad = kc - cand_depth.shape[1]
        cand_depth = jnp.pad(cand_depth, ((0, 0), (0, pad)),
                             constant_values=_INF)
        idxc = jnp.pad(idxc, ((0, 0), (0, pad)))

    # packed gather: [u, v, conic(3), opacity, color(C), depth]
    attrs = jnp.concatenate(
        [jnp.stack([u, v, conic_a, conic_b, conic_c, opacities], -1),
         colors], -1)
    cand = attrs[idxc]                                    # [Tc, kc, 6+C]
    cand = jnp.concatenate([cand, cand_depth[..., None]], -1)
    A = 6 + C + 1

    P = ts * cts
    kernel = functools.partial(
        _composite_kernel, kc=kc, A=A, C=C, ts=ts, cts=cts, CF=CF, TWc=TWc)
    packed = pl.pallas_call(
        kernel,
        grid=(Tc, CF),
        in_specs=[pl.BlockSpec((1, kc, A), lambda c, f: (c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, P), lambda c, f: (c, f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tc, CF, 8, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, P), jnp.float32),
                        pltpu.VMEM((8, P), jnp.float32)],
        interpret=jax.default_backend() == "cpu",   # CPU tests
    )(cand)

    # [Tc, CF(fy), 8, ts*cts] -> [H, W, 8] -> crop
    img = packed.reshape(THc, TWc, CF, 8, ts, cts)
    img = img.transpose(0, 2, 4, 1, 5, 3)                 # tyc, fy, py, txc, px, ch
    img = img.reshape(THc * cts, TWc * cts, 8)[:height, :width]
    return RasterOutput(colors=img[..., :C], alpha=img[..., C], stats=stats)
