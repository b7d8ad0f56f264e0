"""Fused Pallas kernel for the temporal (VideoTransformerBlock) stage.

The temporal transformer at 576x1024/f8 is 16 independent [T=25, C]
sequences per spatial token — every op in the block (LayerNorm, GEGLU FFs,
self-attention over T, the length-1 cross-attention, the AlphaBlender mix)
is LOCAL to one (batch, spatial-token) row. The XLA path pays ~56 ms per
level-0 block, of which only ~18 ms is attention — the rest is HBM round
trips for 4 LayerNorms, 2 feed-forwards and the (b t) s c -> (b s) t c
transposes (scripts/bench_transformer_parts.py). This kernel runs the
ENTIRE stage — ``+ time_pos_embed``, ff_in, temporal self-attention,
cross-attention bias, ff, AlphaBlender — with ONE read and ONE write of
the activation tensor, weights VMEM-resident across the whole grid:

- grid = (batch, S/RS): each program takes a [T, RS, C] block of the
  [B*T, S, C] activation directly from its natural layout — no transposes
  anywhere; tokens are t-major in-kernel and the self-attention's
  block-diagonal structure is expressed with a (i % RS == j % RS) mask
  instead of a reshape (25-frame groups are strided, the MXU doesn't care);
- attention per head: [M, 64] x [64, M] scores + masked f32 softmax +
  PV matmul, M = T*RS tokens. The RS-fold score waste is ~13% of the
  block's FLOPs at RS=16;
- the length-1 cross-attention is EXACTLY a per-batch bias
  (softmax over one key is 1): computed outside as to_out(to_v(ctx)) and
  added in-kernel (see layers.CrossAttention);
- LayerNorm statistics in f32 (flax force_float32_reductions semantics),
  matmuls bf16 with f32 accumulation.

Forward-only: the fine-tune path keeps the XLA modules (autodiff). Gated
in SpatialVideoTransformer (models/vdm/layers.py) on C <= 384 — level-1+
weight sets (>= 23 MB bf16) exceed VMEM residency.

Reference parity: vwm/modules/diffusionmodules/video_attention.py:111-141
(VideoTransformerBlock with extra_ff_mix_layer=True) + util.py:277-318
(AlphaBlender) — numerics mirrored from models/vdm/layers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * s.astype(jnp.float32)[None] + b.astype(jnp.float32)[None]
    return y.astype(jnp.bfloat16)


def _mm(a, w, b=None):
    out = jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)[None]
    return out


def _geglu(x, w1, b1, w2, b2, inner):
    u = _mm(x, w1, b1)                       # [M, 2*inner] f32
    a = u[:, :inner]
    g = u[:, inner:]
    y = (a * jax.nn.gelu(g)).astype(jnp.bfloat16)
    return _mm(y, w2, b2)


def _kernel(alpha_ref, h_ref, emb_ref, bias_ref,
            nins_ref, ninb_ref, fiw1_ref, fib1_ref, fiw2_ref, fib2_ref,
            n1s_ref, n1b_ref, wqkv_ref, wout_ref, bout_ref,
            n3s_ref, n3b_ref, fw1_ref, fb1_ref, fw2_ref, fb2_ref,
            o_ref, *, T: int, RS: int, C: int, heads: int, dh: int):
    M = T * RS
    inner = 4 * C
    h = h_ref[...].reshape(M, C)                       # [T*RS, C] t-major
    emb = emb_ref[0].astype(jnp.bfloat16)              # [T, C]
    # Row m = t*RS + s_local needs emb[t]. A broadcast+reshape across the
    # sublane dim is an unsupported shape cast in Mosaic; gather the frame
    # embedding with an indicator matmul instead (6.4 MFLOP, MXU noise).
    mi = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0) // RS
    tj = jax.lax.broadcasted_iota(jnp.int32, (M, T), 1)
    ind = (mi == tj).astype(jnp.bfloat16)
    embb = jax.lax.dot_general(ind, emb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    x = h + embb.astype(h.dtype)

    # ff_in
    x = (x + _geglu(_ln(x, nins_ref[...], ninb_ref[...]),
                    fiw1_ref[...], fib1_ref[...],
                    fiw2_ref[...], fib2_ref[...], inner)
         .astype(jnp.bfloat16))

    # temporal self-attention: groups are the strided {s_local + t*RS} rows
    xn = _ln(x, n1s_ref[...], n1b_ref[...])
    qkv = _mm(xn, wqkv_ref[...]).astype(jnp.bfloat16)  # [M, 3C]
    ri = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    allowed = (ri % RS) == (ci % RS)
    scale = 1.0 / (dh ** 0.5)
    outs = []
    for hd in range(heads):
        q = qkv[:, hd * dh:(hd + 1) * dh]
        k = qkv[:, C + hd * dh:C + (hd + 1) * dh]
        v = qkv[:, 2 * C + hd * dh:2 * C + (hd + 1) * dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pr = (p / l).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            pr, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    attn = jnp.concatenate(outs, axis=1)               # [M, C]
    x = x + _mm(attn, wout_ref[...], bout_ref[...]).astype(jnp.bfloat16)

    # length-1 cross-attention == per-batch bias
    x = x + bias_ref[0, 0:1, :].astype(x.dtype)

    # ff
    x = (x + _geglu(_ln(x, n3s_ref[...], n3b_ref[...]),
                    fw1_ref[...], fb1_ref[...],
                    fw2_ref[...], fb2_ref[...], inner)
         .astype(jnp.bfloat16))

    # AlphaBlender: a*h_spatial + (1-a)*h_temporal
    a = alpha_ref[0, 0]
    out = (a * h.astype(jnp.float32)
           + (1.0 - a) * x.astype(jnp.float32)).astype(h.dtype)
    o_ref[...] = out.reshape(T, RS, C)


def _attn_kernel(h_ref, bias_ref, n1s_ref, n1b_ref, wqkv_ref, wout_ref,
                 bout_ref, o_ref, *, T: int, RS: int, C: int, heads: int,
                 dh: int):
    """Temporal self-attention stage only: x + out(attn_T(LN(x))) + bias,
    directly in the (b t) s c layout (same strided block-diagonal mask
    trick as ``_kernel``). Used at the C>=640 levels where the full-stage
    weight set exceeds VMEM but the attention weights alone fit — the
    FFs/LNs are per-token ops XLA fuses well in the flat layout, while the
    XLA temporal attention is overhead-bound (11 ms at level 1 for <1 ms
    of FLOPs) and forces two [BT, S, C] transposes."""
    M = T * RS
    h = h_ref[...].reshape(M, C)
    xn = _ln(h, n1s_ref[...], n1b_ref[...])
    qkv = _mm(xn, wqkv_ref[...]).astype(jnp.bfloat16)  # [M, 3C]
    ri = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (M, M), 1)
    allowed = (ri % RS) == (ci % RS)
    scale = 1.0 / (dh ** 0.5)
    outs = []
    for hd in range(heads):
        q = qkv[:, hd * dh:(hd + 1) * dh]
        k = qkv[:, C + hd * dh:C + (hd + 1) * dh]
        v = qkv[:, 2 * C + hd * dh:2 * C + (hd + 1) * dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(allowed, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pr = (p / l).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            pr, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    attn = jnp.concatenate(outs, axis=1)               # [M, C]
    out = _mm(attn, wout_ref[...], bout_ref[...])      # f32
    res = h.astype(jnp.float32) + out \
        + bias_ref[0, 0:1, :].astype(jnp.float32)
    o_ref[...] = res.astype(h.dtype).reshape(T, RS, C)


@functools.partial(
    jax.jit, static_argnames=("num_frames", "heads", "dim_head",
                              "rows_per_block", "interpret"))
def temporal_attention_fused(
    h: jax.Array,            # [B*T, S, C] bf16, (b t) s c layout
    bias: jax.Array,         # [B, C] cross-attn bias (len-1 ctx shortcut)
    norm1_s, norm1_b, wqkv, wout, bout,
    *, num_frames: int, heads: int, dim_head: int,
    rows_per_block: int = 16, interpret: bool | None = None,
) -> jax.Array:
    BT, S, C = h.shape
    T = num_frames
    B = BT // T
    RS = rows_per_block
    assert S % RS == 0 and heads * dim_head == C
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    bias8 = jnp.broadcast_to(bias[:, None, :], (B, 8, C)).astype(jnp.bfloat16)
    kernel = functools.partial(_attn_kernel, T=T, RS=RS, C=C, heads=heads,
                               dh=dim_head)
    wspec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bi, si: (0,) * arr.ndim,
        memory_space=pltpu.VMEM)
    weights = [w.astype(jnp.bfloat16)
               for w in (norm1_s, norm1_b, wqkv, wout, bout)]
    return pl.pallas_call(
        kernel,
        grid=(B, S // RS),
        in_specs=[
            pl.BlockSpec((T, RS, C), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((T, RS, C), lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, S, C), jnp.bfloat16),
        interpret=interpret,
    )(h.astype(jnp.bfloat16), bias8, *weights)


@functools.partial(
    jax.jit, static_argnames=("num_frames", "heads", "dim_head",
                              "rows_per_block", "interpret"))
def temporal_block_fused(
    h: jax.Array,            # [B*T, S, C] bf16, (b t) s c layout
    emb: jax.Array,          # [B*T, C] frame positional embedding
    alpha: jax.Array,        # [] f32, AlphaBlender sigmoid(mix_factor)
    bias: jax.Array,         # [B, C] cross-attn bias (zeros if no context)
    norm_in_s, norm_in_b, ffin_w1, ffin_b1, ffin_w2, ffin_b2,
    norm1_s, norm1_b, wqkv, wout, bout,
    norm3_s, norm3_b, ff_w1, ff_b1, ff_w2, ff_b2,
    *, num_frames: int, heads: int, dim_head: int,
    rows_per_block: int = 16, interpret: bool | None = None,
) -> jax.Array:
    BT, S, C = h.shape
    T = num_frames
    B = BT // T
    RS = rows_per_block
    assert S % RS == 0 and heads * dim_head == C
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from ..parallel.kernel_shard import active_kernel_sharding
    ctx = active_kernel_sharding()
    if ctx is not None and ctx[1]:
        # mixed-rank args (replicated weights + batched activations) don't
        # fit the generic leading-dim shard_map wrap; the sharded sampler
        # keeps fused_temporal off (parallel/sample.py) — fail loudly
        # rather than hit GSPMD's Mosaic auto-partition error
        raise ValueError(
            "fused temporal kernel is not shard-mapped for mesh axes "
            f"{ctx[1]}; disable fused_temporal under a sharded mesh")

    bias8 = jnp.broadcast_to(bias[:, None, :], (B, 8, C)).astype(jnp.bfloat16)
    alpha11 = jnp.reshape(alpha.astype(jnp.float32), (1, 1))
    emb3 = emb.reshape(B, T, C).astype(jnp.bfloat16)

    kernel = functools.partial(_kernel, T=T, RS=RS, C=C, heads=heads,
                               dh=dim_head)
    wspec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bi, si: (0,) * arr.ndim,
        memory_space=pltpu.VMEM)
    weights = [norm_in_s, norm_in_b, ffin_w1, ffin_b1, ffin_w2, ffin_b2,
               norm1_s, norm1_b, wqkv, wout, bout,
               norm3_s, norm3_b, ff_w1, ff_b1, ff_w2, ff_b2]
    weights = [w.astype(jnp.bfloat16) for w in weights]
    return pl.pallas_call(
        kernel,
        grid=(B, S // RS),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, si: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, RS, C), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, C), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda bi, si: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [wspec(w) for w in weights],
        out_specs=pl.BlockSpec((T, RS, C), lambda bi, si: (bi, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, S, C), jnp.bfloat16),
        interpret=interpret,
    )(alpha11, h.astype(jnp.bfloat16), emb3, bias8, *weights)
