"""Flash attention Pallas kernel (TPU).

Replaces xformers.ops.memory_efficient_attention for the spatial transformer
blocks (head_dim 64, sequence up to 72*128=9216 tokens at 576x1024/f8,
vwm/modules/attention.py:384-407). Online-softmax tiling: queries are blocked
over the grid, K/V stream through VMEM in chunks inside a fori_loop, with
running (max, denominator, accumulator) carried in f32.

Backward: fused Pallas kernels (FlashAttention-2 style). The forward also
writes the per-row logsumexp; backward runs two streaming kernels — dK/dV
(kv blocks resident, q streams) and dQ (q blocks resident, kv streams) —
recomputing p = exp(qk*scale - lse) on the fly, so no O(S^2) tensor ever
touches HBM. An XLA recompute path is kept for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, vv_ref, o_ref, *lse_refs,
                  scale: float, seq_len_kv: int, block_k: int,
                  need_mask: bool, fold_scale: bool):
    """Online softmax with the WHOLE (padded) K/V resident in VMEM and the
    kv loop INSIDE the kernel (fori_loop over chunks, running max/denom/acc
    as loop carries). Grid = (bh, nq): K/V are fetched once per batch-head
    and reused across q blocks; the previous (bh, nq, nk) grid spent more
    time in per-step dispatch than in its 0.3 us of MXU work per step
    (40500 steps at the 9216-token level).

    VPU-offload tricks (see scripts/bench_flash_tuning.py):
    - ``vv`` carries V with a ones column at lane ``d``: the PV matmul
      computes the softmax denominator for free in the otherwise-idle
      output lanes (the PV output is only d=64 of 128 lanes wide), killing
      the per-chunk [BQ, BK] lane-reduction for ``l``;
    - when the softmax scale is an exact power of two (head_dim 64 ->
      0.125) it is folded into q up front (exact in bf16: exponent shift),
      removing a [BQ, BK] multiply per chunk.
    (A software-pipelined variant carrying chunk j+1's QK^T across the
    loop was tried and LOST — the [BQ, BK] f32 carry copy costs more than
    the MXU/VPU overlap buys: 92 -> 101 ms at the level-0 shape.)"""
    q = q_ref[0]                                       # [BQ, D]
    if fold_scale:
        q = (q * scale).astype(q.dtype)
    bq, d = q.shape
    skv_p = k_ref.shape[1]
    nk = skv_p // block_k

    def get_s(j):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]   # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [BQ, BK] f32
        if not fold_scale:
            s = s * scale
        if need_mask:  # static: only when kv was padded
            kidx = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) \
                + j * block_k
            s = jnp.where(kidx < seq_len_kv, s, NEG_INF)
        return s

    def chunk(j, carry):
        m, acc = carry
        s = get_s(j)
        vv = vv_ref[0, pl.ds(j * block_k, block_k), :]  # [BK, 128]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vv.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [BQ, 128]
        return m_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    acc0 = jnp.zeros((bq, vv_ref.shape[2]), jnp.float32)
    if nk <= 12:
        # static unroll: no loop-carry copies, and Mosaic overlaps chunk
        # j+1's QK^T (MXU) with chunk j's softmax (VPU) across iterations
        # (76.6 -> 68.8 ms at the level-0 shape; an explicit two-stream
        # even/odd variant measured the same, so the scheduler already
        # extracts the overlap)
        m, acc = m0, acc0
        for j in range(nk):
            m, acc = chunk(j, (m, acc))
    else:
        m, acc = jax.lax.fori_loop(0, nk, chunk, (m0, acc0))

    l = acc[:, d:d + 1]                                # [BQ, 1]
    o_ref[0] = (acc[:, :d] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_refs:
        lse = m + jnp.log(jnp.maximum(l, 1e-30))       # [BQ, 1]
        lse_refs[0][0] = jnp.broadcast_to(lse, lse_refs[0].shape[1:])


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _auto_blocks_fwd(sq: int, skv: int) -> tuple[int, int]:
    """Shape-adaptive forward block sizes (swept on-chip:
    scripts/bench_flash_shapes.py). The level-0 shape (S=9216) keeps the
    VMEM-tuned (512, 1024); smaller sequences prefer EXACT tiling — under
    fixed blocks S=2304 pads kv to 3072 (+33% masked chunks, 22.3 ms) and
    S=576 pads q to 1024 (+78%, 10.4 ms) vs 15.4 / 8.2 ms exact."""
    if sq >= 4096 or skv >= 4096:
        return 512, 1024
    # q blocks are sublane-aligned (x16); kv chunks lane-aligned (x128).
    # minimize padded work, tie -> largest block; keep s = [bq, bk] f32
    # within the swept VMEM budget (<= 1024x1024).
    bq_cands = [b for b in range(16, min(1024, sq) + 16, 16)]
    bq = min(bq_cands, key=lambda b: (-(-sq // b) * b - sq, -b))
    bk_cands = [b for b in range(128, min(1280, skv + 127) + 1, 128)
                if b * bq <= 1024 * 1024]
    bk = min(bk_cands, key=lambda b: (-(-skv // b) * b - skv, -b))
    return bq, bk


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "need_lse"))
def _flash_forward(q, k, v, block_q: int | None = None,
                   block_k: int | None = None, need_lse: bool = True):
    """[BH, S, D] x [BH, Skv, D] -> ([BH, S, D], lse [BH, S] | None).

    ``need_lse=False`` (the no-grad eval path) skips computing and writing
    the per-row logsumexp — at the level-0 shape that write alone is
    bh*S*128 f32 = 1.2 GB of HBM traffic."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    # fold the scale into q when it is an exact power of two (always, for
    # the UNet's head_dim 64): exact in bf16, kills a per-chunk multiply
    fold_scale = float(scale).hex().startswith("0x1.0000000000000p")

    abq, abk = _auto_blocks_fwd(sq, skv)
    block_q = abq if block_q is None else block_q
    block_k = abk if block_k is None else block_k
    bq = min(block_q, max(8, sq))
    sq_p = -(-sq // bq) * bq
    bk = min(block_k, max(128, skv))
    skv_p = -(-skv // bk) * bk

    qp = _pad_to(q, sq_p, 1)
    kp = _pad_to(k, skv_p, 1)
    # V with a ones column at lane d, padded to the 128-lane register width:
    # the PV matmul's idle output lanes compute the softmax denominator
    dv = 128 * -(-(d + 1) // 128)
    vvp = jnp.concatenate(
        [_pad_to(v, skv_p, 1),
         jnp.ones((bh, skv_p, 1), v.dtype)], axis=-1)
    vvp = _pad_to(vvp, dv, 2)

    out_specs = [pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, bq, 128), lambda b, i: (b, i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((bh, sq_p, 128), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, seq_len_kv=skv,
                          block_k=bk, need_mask=skv_p != skv,
                          fold_scale=fold_scale),
        grid=(bh, sq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, dv), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if need_lse else out_specs[0],
        out_shape=out_shape if need_lse else out_shape[0],
    )(qp, kp, vvp)
    if need_lse:
        out, lse = res
        return out[:, :sq], lse[:, :sq, 0]
    return res[:, :sq], None


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, dl_ref, k_ref, v_ref,
                    dk_ref, dv_ref, *, scale: float, seq_len_q: int,
                    block_q: int, need_mask_q: bool):
    """dK/dV for one kv block; the WHOLE q/do/lse/delta stay VMEM-resident
    per batch-head and the q loop runs inside the kernel (grid = (bh, nkv)).
    All matrices are computed k-major ([BK, BQ]) so the per-row lse/delta
    broadcast along lanes — no in-kernel transposes."""
    k = k_ref[0]                                        # [BK, D]
    v = v_ref[0]
    bk = k.shape[0]
    d = k.shape[1]
    sq_p = q_ref.shape[1]
    nq = sq_p // block_q

    def chunk(iq, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(iq * block_q, block_q), :]   # [BQ, D]
        do = do_ref[0, pl.ds(iq * block_q, block_q), :]
        lse = lse_ref[0, 0:1, pl.ds(iq * block_q, block_q)]  # [1, BQ]
        dl = dl_ref[0, 0:1, pl.ds(iq * block_q, block_q)]
        s_t = jax.lax.dot_general(                      # K @ Q^T [BK, BQ]
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p_t = jnp.exp(s_t - lse)
        if need_mask_q:  # zero padded q rows (their lse is garbage)
            qidx = jax.lax.broadcasted_iota(
                jnp.int32, (bk, block_q), 1) + iq * block_q
            p_t = jnp.where(qidx < seq_len_q, p_t, 0.0)
        dv = dv + jax.lax.dot_general(                  # p^T @ dO
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(                     # V @ dO^T [BK, BQ]
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - dl) * scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(                  # ds^T @ Q
            ds_t, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((bk, d), jnp.float32)
    if nq <= 20:   # static unroll (same scheduling win as the forward)
        dk, dv = z, z
        for iq in range(nq):
            dk, dv = chunk(iq, (dk, dv))
    else:
        dk, dv = jax.lax.fori_loop(0, nq, chunk, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, dl_ref, k_ref, v_ref,
                   dq_ref, *, scale: float, seq_len_kv: int,
                   block_k: int, need_mask: bool):
    """dQ for one q block; whole K/V VMEM-resident, kv loop inside
    (grid = (bh, nq)). k-major like the dkv kernel."""
    q = q_ref[0]                                        # [BQ, D]
    do = do_ref[0]
    lse = lse_ref[0, 0:1, :]                            # [1, BQ]
    dl = dl_ref[0, 0:1, :]
    bq, d = q.shape
    skv_p = k_ref.shape[1]
    nk = skv_p // block_k

    def chunk(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]    # [BK, D]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BK, BQ]
        if need_mask:  # padded kv rows contribute nothing
            kidx = jax.lax.broadcasted_iota(
                jnp.int32, (block_k, bq), 0) + j * block_k
            s_t = jnp.where(kidx < seq_len_kv, s_t, NEG_INF)
        p_t = jnp.exp(s_t - lse)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_t = (p_t * (dp_t - dl) * scale).astype(q.dtype)
        return dq + jax.lax.dot_general(                # ds^T... [BQ, D]
            ds_t, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jnp.zeros((bq, d), jnp.float32)
    if nk <= 20:   # static unroll (same scheduling win as the forward)
        for j in range(nk):
            dq = chunk(j, dq)
    else:
        dq = jax.lax.fori_loop(0, nk, chunk, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _auto_blocks_bwd(sq: int, skv: int) -> tuple[int, int]:
    """Shape-adaptive backward blocks (swept: bench_flash_shapes.py --bwd).
    S=9216 keeps the VMEM-tuned (512, 512); S=2304 fwd+bwd 53.5 -> 43.9 ms
    with (384, 768); S=576 25.9 -> 16.5 ms with (576, 640). Constraint: the
    q block is a LANE dim of the lse/delta row blocks, so its grid offsets
    must be 128-aligned — any bq works only when it spans the whole
    (16-aligned) sequence, otherwise bq must be a multiple of 128."""
    if sq >= 4096 or skv >= 4096:
        return 512, 512
    if sq <= 1024:
        bq = sq   # single q block: lane offsets stay 0, any size lowers
    else:
        cands = range(128, min(384, sq) + 1, 128)
        bq = min(cands, key=lambda b: (-(-sq // b) * b - sq, -b))
    bk_cands = range(128, min(768, skv + 127) + 1, 128)
    bk = min(bk_cands, key=lambda b: (-(-skv // b) * b - skv, -b))
    return bq, bk


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_backward(q, k, v, o, lse, g, block_q: int | None = None,
                    block_k: int | None = None):
    # default (512, 512) at the level-0 shape (not the forward's 1024): the
    # dkv kernel additionally holds whole q/do/lse/delta resident, and
    # [1024, 512] f32 s/p/dp intermediates blow the 16 MB scoped VMEM at
    # 9216 tokens
    bh, sq, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d ** 0.5)

    abq, abk = _auto_blocks_bwd(sq, skv)
    block_q = abq if block_q is None else block_q
    block_k = abk if block_k is None else block_k
    bq = min(block_q, max(8, sq))
    sq_p = -(-sq // bq) * bq
    bk = min(block_k, max(128, skv))
    skv_p = -(-skv // bk) * bk

    qp = _pad_to(q, sq_p, 1)
    dop = _pad_to(g, sq_p, 1)
    # delta = rowsum(dO * O); padded q rows get lse=+inf => p = 0.
    # 8-sublane broadcast [bh, 8, sq_p]: row slices [1, BQ] broadcast along
    # lanes inside the k-major kernels (no transposes)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dlp = _pad_to(delta, sq_p, 1)
    lsep = jnp.pad(lse, ((0, 0), (0, sq_p - sq)), constant_values=1e30) \
        if sq_p != sq else lse
    dlp = jnp.broadcast_to(dlp[:, None, :], (bh, 8, sq_p))
    lsep = jnp.broadcast_to(lsep[:, None, :], (bh, 8, sq_p))
    kp = _pad_to(k, skv_p, 1)
    vp = _pad_to(v, skv_p, 1)

    q_res = pl.BlockSpec((1, sq_p, d), lambda b, jk: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    r_res = pl.BlockSpec((1, 8, sq_p), lambda b, jk: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, bk, d), lambda b, jk: (b, jk, 0),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len_q=sq,
                          block_q=bq, need_mask_q=sq_p != sq),
        grid=(bh, skv_p // bk),
        in_specs=[q_res, q_res, r_res, r_res, kv_blk, kv_blk],
        out_specs=[kv_blk, kv_blk],
        out_shape=[
            jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
        ],
    )(qp, dop, lsep, dlp, kp, vp)

    q_blk = pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    r_blk = pl.BlockSpec((1, 8, bq), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
    kv_res = pl.BlockSpec((1, skv_p, d), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len_kv=skv,
                          block_k=bk, need_mask=skv_p != skv),
        grid=(bh, sq_p // bq),
        in_specs=[q_blk, q_blk, r_blk, r_blk, kv_res, kv_res],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
    )(qp, dop, lsep, dlp, kp, vp)

    return dq[:, :sq], dk[:, :skv], dv[:, :skv]


@jax.custom_vjp
def _flash(q, k, v):
    # primal (no-grad eval) path: skip the logsumexp residual entirely
    out, _ = _flash_forward(q, k, v, need_lse=False)
    return out


def _flash_fwd(q, k, v):
    out, lse = _flash_forward(q, k, v)
    # named per-sequence-length for remat_policy="flash*" (unet.py): under
    # save_only_these_names("flash_out_s9216", ...) the rematerialized
    # backward reuses these instead of re-running the O(S^2) kernel.
    # (Heads are folded into batch here, so seq length — not width — is
    # what identifies a UNet level; it lets the policy save only the
    # sites whose recompute is expensive when HBM is tight.)
    sq = q.shape[-2]
    out = checkpoint_name(out, f"flash_out_s{sq}")
    lse = checkpoint_name(lse, f"flash_lse_s{sq}")
    return out, (q, k, v, out, lse)


def _flash_bwd(res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, S, H, D] interface matching ops.attention.attention_xla.

    Under a sharded jit (multi-chip mesh) the pallas call cannot be
    auto-partitioned by GSPMD; when a ``parallel.kernel_shard`` context is
    active the custom-vjp kernel is wrapped in a shard_map over the
    context's batch axes (plus the vmapped clip axis via
    ``vmap(spmd_axis_name=...)`` in the trainer). Leading dim not divisible
    by the mesh axes raises — multi_head_attention falls back to the
    partitionable XLA path."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    fl = _flash
    from ..parallel.kernel_shard import active_kernel_sharding, wrap_kernel
    ctx = active_kernel_sharding()
    if ctx is not None:
        mesh, axes = ctx
        div = 1
        for a in axes:
            div *= mesh.shape[a]
        if (b * h) % div:
            raise ValueError(
                f"flash batch dim {b * h} not divisible by mesh axes "
                f"{axes} ({div}); caller falls back to XLA attention")
        fl = wrap_kernel(_flash, in_ranks=(3, 3, 3), out_ranks=3)
    out = fl(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)
