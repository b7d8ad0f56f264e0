"""Flash attention Pallas kernel (TPU).

Replaces xformers.ops.memory_efficient_attention for the spatial transformer
blocks (head_dim 64, sequence up to 72*128=9216 tokens at 576x1024/f8,
vwm/modules/attention.py:384-407). Online-softmax tiling: queries are blocked
over the grid, K/V stream through VMEM in chunks inside a fori_loop, with
running (max, denominator, accumulator) carried in f32.

Backward: jax.custom_vjp whose bwd recomputes attention per (batch*head)
chunk with standard XLA math under lax.map — O(S^2) memory only per chunk,
exact gradients. A fused Pallas backward kernel is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, seq_len_kv: int, need_mask: bool):
    """Grid-streamed online softmax: grid = (bh, nq, nk); the kv axis is the
    innermost grid dim so K/V blocks stream through VMEM while running
    (max, denom, acc) live in scratch — per-step VMEM is O(block sizes), not
    O(seq_kv) (the previous whole-KV-resident variant blew the 16 MB scoped
    VMEM at 9216 tokens)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # keep the dots in the input dtype (bf16 runs the MXU at full rate; the
    # f32 upcast would cost ~8x) and accumulate in f32
    q = q_ref[0]                                       # [BQ, D]
    bq, d = q.shape
    k = k_ref[0]                                       # [BK, D]
    v = v_ref[0]
    block_k = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # [BQ, BK] f32
    if need_mask:  # static: only when kv was padded
        kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) \
            + j * block_k
        s = jnp.where(kidx < seq_len_kv, s, NEG_INF)

    m = m_scr[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    m_scr[:] = m_new
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)
                    ).astype(o_ref.dtype)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_forward(q, k, v, block_q: int = 512, block_k: int = 1024):
    """[BH, S, D] x [BH, Skv, D] -> [BH, S, D]."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d ** 0.5)

    bq = min(block_q, max(8, sq))
    sq_p = -(-sq // bq) * bq
    bk = min(block_k, max(128, skv))
    skv_p = -(-skv // bk) * bk

    qp = _pad_to(q, sq_p, 1)
    kp = _pad_to(k, skv_p, 1)
    vp = _pad_to(v, skv_p, 1)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, seq_len_kv=skv,
                          need_mask=skv_p != skv),
        grid=(bh, sq_p // bq, skv_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )(qp, kp, vp)
    return out[:, :sq]


def _attention_bwd_chunk(q, k, v, g):
    """Exact per-(b*h)-chunk gradients via standard math, f32."""
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bqk,bqd->bkd", p, g.astype(jnp.float32))
    dp = jnp.einsum("bqd,bkd->bqk", g.astype(jnp.float32), v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q.astype(jnp.float32)) * scale
    return dq, dk, dv


@jax.custom_vjp
def _flash(q, k, v):
    return _flash_forward(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    bh = q.shape[0]
    # chunk the fused batch*head axis to bound the O(S^2) transient
    chunk = max(1, min(bh, 4))
    nch = -(-bh // chunk)
    qp = _pad_to(q, nch * chunk, 0).reshape(nch, chunk, *q.shape[1:])
    kp = _pad_to(k, nch * chunk, 0).reshape(nch, chunk, *k.shape[1:])
    vp = _pad_to(v, nch * chunk, 0).reshape(nch, chunk, *v.shape[1:])
    gp = _pad_to(g, nch * chunk, 0).reshape(nch, chunk, *g.shape[1:])
    dq, dk, dv = jax.lax.map(
        lambda args: _attention_bwd_chunk(*args), (qp, kp, vp, gp))
    dq = dq.reshape(-1, *q.shape[1:])[:bh].astype(q.dtype)
    dk = dk.reshape(-1, *k.shape[1:])[:bh].astype(k.dtype)
    dv = dv.reshape(-1, *v.shape[1:])[:bh].astype(v.dtype)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, S, H, D] interface matching ops.attention.attention_xla."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    out = _flash(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
