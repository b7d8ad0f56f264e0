"""Phase-1 (in-kernel row compaction) variant microbench.

Local copies of the compaction kernel over a synthetic candidate tensor
shaped like the headline scene ([117, 4096, 11], depth-sorted, ~12% of a
coarse tile's candidates hitting a given 16px row) so variants iterate
without the 10 ms projection/selection pipeline.

Variants: baseline (KB=128, WIN=256, f32 matmuls), no-upd (mask+epos only),
no-ind (mask+epos, no one-hot), bf16 matmuls, WIN=KB+8 8-aligned anchor.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

Tc, CF, TWc = 117, 8, 13
kc, kf, A = 4096, 1024, 11
ts, cts = 16, 128
DEPTH = 10 - 2   # depth col = A-3
_KB = 128


def make_cand(seed):
    rng = np.random.default_rng(seed)
    # depth-sorted alive candidates, heavy-tailed y-spans within the tile
    depth = np.sort(rng.uniform(1, 100, (Tc, kc)).astype(np.float32), axis=1)
    cy = rng.uniform(0, cts, (Tc, kc)).astype(np.float32)
    half = np.minimum(rng.lognormal(1.5, 1.0, (Tc, kc)), 64).astype(np.float32)
    cand = rng.normal(size=(Tc, kc, A)).astype(np.float32)
    ty0 = (np.arange(Tc) // TWc * cts).astype(np.float32)[:, None]
    cand[..., DEPTH] = depth
    cand[..., DEPTH + 1] = ty0 + cy - half
    cand[..., DEPTH + 2] = ty0 + cy + half
    return jnp.asarray(cand)


def kernel(cand_ref, out_ref, comp_ref, *, variant):
    c = pl.program_id(0)
    fy = pl.program_id(1)
    tyc = c // TWc
    ry0 = (tyc * cts + fy * ts).astype(jnp.float32)
    ry1 = ry0 + ts

    ri = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (_KB, _KB), 1)
    if variant == "bf16":
        tri = (ci < ri).astype(jnp.bfloat16)
    else:
        tri = (ci < ri).astype(jnp.float32)

    comp_ref[:] = jnp.zeros_like(comp_ref)
    nb = kc // _KB
    if variant == "win8":
        WIN = _KB + 8
    else:
        WIN = min(2 * _KB, kf)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, _KB), 0) \
        .astype(jnp.float32)

    def cbody(carry):
        b, base, _ = carry
        blk = cand_ref[0, pl.ds(b * _KB, _KB), :]
        depth = blk[:, DEPTH:DEPTH + 1]
        cy0 = blk[:, DEPTH + 1:DEPTH + 2]
        cy1 = blk[:, DEPTH + 2:DEPTH + 3]
        alive = depth < 1e10
        mask = (cy0 < ry1) & (cy1 > ry0) & alive
        maskf = mask.astype(tri.dtype)
        epos = jax.lax.dot_general(
            tri, maskf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant == "noind":
            comp_ref[pl.ds(0, _KB), :] += epos * blk[:, 0:1] + blk
        else:
            if variant == "win8":
                floor = jnp.clip((base // 8) * 8, 0, kf - WIN)
            else:
                floor = jnp.clip((base // _KB) * _KB, 0, kf - WIN)
            rel = jnp.where(mask[:, 0], epos[:, 0]
                            + (base - floor).astype(jnp.float32),
                            -1.0)[None, :]
            ind = (slot_iota == rel).astype(tri.dtype)
            if variant == "noupd":
                # keep ind alive, skip the compaction matmul + windowed RMW
                comp_ref[pl.ds(0, 8), :] += (jnp.zeros((8, A), jnp.float32)
                                             + jnp.sum(ind.astype(jnp.float32)))
            else:
                blkm = blk.astype(tri.dtype)
                upd = jax.lax.dot_general(
                    ind, blkm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                comp_ref[pl.ds(floor, WIN), :] += upd
        base = base + jnp.sum(mask.astype(jnp.float32)).astype(jnp.int32)
        return b + 1, base, jnp.all(alive)

    def ccond(carry):
        b, base, tail = carry
        return (b < nb) & (base < kf) & tail

    _, base_i, _ = jax.lax.while_loop(
        ccond, cbody, (0, jnp.int32(0), jnp.bool_(True)))
    out_ref[0, 0] = (jnp.zeros_like(out_ref[0, 0])
                     + base_i.astype(jnp.float32)
                     + jnp.sum(comp_ref[0:1, :]))


def rowbatch_kernel(cand_ref, yb_ref, out_ref, comp_ref, *, KB):
    """All 8 fine rows of a coarse tile in one program: the y/depth mask
    columns arrive LANE-major ([4, kc]) so masks, the batched exclusive
    prefix, rel and the one-hot all stay in lane orientation (no
    transposes, no lane-offset slices); the compaction matmul uses the
    sublane-major cand block as today. 8 independent per-row chains per
    iteration -> 8x fewer serial iterations."""
    c = pl.program_id(0)
    tyc = c // TWc
    ty0 = (tyc * cts).astype(jnp.float32)

    # exclusive prefix along LANES: m [R, KB] @ triU [KB, KB] (strict upper)
    ri = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    triu = (ri < ci).astype(jnp.float32)

    comp_ref[:] = jnp.zeros_like(comp_ref)
    nb = kc // KB
    WIN = KB + 8
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN, KB), 0) \
        .astype(jnp.float32)

    def cbody(carry):
        b = carry[0]
        bases = carry[1:CF + 1]
        blk = cand_ref[0, pl.ds(b * KB, KB), :]           # [KB, A]
        yrow = yb_ref[0, :, pl.ds(b * KB, KB)]            # [4, KB] lane-major
        y0r = yrow[0:1, :]
        y1r = yrow[1:2, :]
        dr = yrow[2:3, :]
        alive = dr < 1e10                                  # [1, KB]
        # all-rows mask [CF, KB]: row r covers [ty0 + r*ts, ty0 + (r+1)*ts)
        rr = jax.lax.broadcasted_iota(jnp.int32, (CF, 1), 0) \
            .astype(jnp.float32)
        rb0 = ty0 + rr * ts                                # [CF, 1]
        mask = (y0r < rb0 + ts) & (y1r > rb0) & alive      # [CF, KB]
        maskf = mask.astype(jnp.float32)
        epos = jax.lax.dot_general(                        # [CF, KB]
            maskf, triu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        new_bases = []
        for r in range(CF):
            base_r = bases[r]
            floor_r = jnp.clip((base_r // 8) * 8, 0, kf - WIN)
            rel = jnp.where(mask[r:r + 1, :], epos[r:r + 1, :]
                            + (base_r - floor_r).astype(jnp.float32),
                            -1.0)                          # [1, KB]
            ind = (slot_iota == rel).astype(jnp.float32)   # [WIN, KB]
            upd = jax.lax.dot_general(
                ind, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            comp_ref[r, pl.ds(floor_r, WIN), :] += upd
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

    init = (0,) + tuple(jnp.int32(0) for _ in range(CF)) + (jnp.bool_(True),)
    out = jax.lax.while_loop(ccond, cbody, init)
    total = out[1].astype(jnp.float32)
    for r in range(2, CF + 1):
        total = total + out[r].astype(jnp.float32)
    out_ref[0] = (jnp.zeros_like(out_ref[0]) + total
                  + jnp.sum(comp_ref[0, 0:1, :]))


def run_rowbatch(cands, KB):
    k = functools.partial(rowbatch_kernel, KB=KB)
    f = pl.pallas_call(
        k,
        grid=(Tc,),
        in_specs=[pl.BlockSpec((1, kc, A), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 4, kc), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tc, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CF, kf, A), jnp.float32)],
    )

    def prep(cand):
        yb = jnp.stack([cand[..., DEPTH + 1], cand[..., DEPTH + 2],
                        cand[..., DEPTH],
                        jnp.zeros_like(cand[..., 0])], axis=1)  # [Tc, 4, kc]
        return cand, yb

    fj = jax.jit(lambda x: jnp.sum(f(*prep(x))))
    out = fj(cands[0])
    _ = float(out)
    for rep in range(2):
        t0 = time.perf_counter()
        iters = 10
        outs = [fj(cands[i % len(cands)]) for i in range(iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
    print(f"rowbatch KB={KB:4d}: {dt*1e3:8.2f} ms", flush=True)


def run(variant, cands):
    k = functools.partial(kernel, variant=variant)
    f = pl.pallas_call(
        k,
        grid=(Tc, CF),
        in_specs=[pl.BlockSpec((1, kc, A), lambda c, f: (c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda c, f: (c, f, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tc, CF, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kf, A), jnp.float32)],
    )
    fj = jax.jit(lambda x: jnp.sum(f(x)))
    out = fj(cands[0])
    _ = float(out)
    for rep in range(2):
        t0 = time.perf_counter()
        iters = 10
        outs = [fj(cands[i % len(cands)]) for i in range(iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
    print(f"{variant:10s}: {dt*1e3:8.2f} ms", flush=True)


def main():
    cands = [make_cand(s) for s in range(3)]
    if "--all" in sys.argv:
        for v in ("base", "noupd", "noind", "bf16", "win8"):
            run(v, cands)
    else:
        run("base", cands)
    for KB in (128, 256):
        run_rowbatch(cands, KB)


if __name__ == "__main__":
    main()
