"""Attention dispatch: XLA reference + Pallas flash kernel.

Replaces xformers.ops.memory_efficient_attention (vwm/modules/attention.py:
384-407). The reference chunks rows at 32768 to dodge an xformers limit; XLA
needs no such workaround. ``multi_head_attention`` is the single entry point
used by every transformer block; on TPU it lowers to the Pallas flash kernel
(ops/flash_attention.py) above a size threshold, otherwise to a fused XLA
softmax attention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                  scale: float | None = None) -> jax.Array:
    """[B, S, H, D] x [B, Skv, H, D] -> [B, S, H, D], f32 softmax accumulation."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    if q.shape[1] <= 32 and k.shape[1] <= 32 and q.shape[1] > 1:
        # tiny sequence (the 25-frame temporal axis): fold heads into the
        # batched-matmul batch dim up front — 21.0 vs 27.4 ms at
        # [18432, 25, 5, 64] on v5e (scripts/bench_temporal_attn.py).
        # The [BH, T, T] logits tensor lane-pads T->128 (5x physical blowup
        # at T=25), so the whole softmax runs at HBM rate: keep it in the
        # compute dtype (bf16 halves the padded traffic; T=25 exp-sums are
        # well within bf16 range).
        B, T, H, D = q.shape
        Tk = k.shape[1]
        qt = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        kt = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
        vt = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
        logits = jnp.einsum("btd,bsd->bts", qt, kt,
                            preferred_element_type=jnp.float32) * scale
        if q.dtype == jnp.bfloat16:
            logits = logits.astype(jnp.bfloat16)
        probs = jax.nn.softmax(logits, axis=-1).astype(vt.dtype)
        o = jnp.einsum("bts,bsd->btd", probs, vt)
        return o.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         use_pallas: bool | None = None) -> jax.Array:
    """Dispatch attention for [B, S, H, D] tensors.

    use_pallas=None auto-selects: Pallas flash kernel on TPU for sequence
    lengths worth tiling, XLA otherwise (CPU tests, tiny temporal attention
    over 25 frames).
    """
    if use_pallas is None:
        # short KV (cross-attention against a length-1 CLIP embedding, or
        # the 25-frame temporal axis) is faster in XLA: the flash kernel
        # pads kv to >=128 and its grid dispatch dominates (13.9 ms vs ~1 ms
        # at [50, 9216, 5, 64] x kv=1, measured on v5e).
        # SC_TPU_FORCE_XLA_ATTENTION=1 forces the XLA path — needed under a
        # sharded jit on a multi-chip mesh (parallel/sample.py): XLA can
        # partition the einsum attention freely, while an opaque Pallas
        # call would be all-gathered onto one chip.
        import os
        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and not os.environ.get("SC_TPU_FORCE_XLA_ATTENTION")
            and q.shape[1] >= 256 and k.shape[1] >= 256
            and q.shape[-1] in (64, 128))
    if use_pallas:
        try:
            from .flash_attention import flash_attention
            return flash_attention(q, k, v)
        except Exception:
            pass
    return attention_xla(q, k, v)
