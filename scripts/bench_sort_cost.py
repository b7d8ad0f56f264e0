"""Measure TPU sort primitives at rasterizer scales — the go/no-go datum
for a gsplat-style exact-binning render path (VERDICT r4 next #5).

The gsplat layout (flat (tile,depth)-sorted worklist + per-tile segment
offsets, street_gaussian_renderer.py:243-280) needs ONE global sort per
frame: either a lexsort of ~4N (tile, depth) pair keys (the XLA
`select_method="sort"` strategy, ops/gs_raster._sort_binning) or a single
depth sort of N splats feeding a counting-sort-by-tile. Round 2 measured
BATCHED small sorts as catastrophic (lax.sort [936, 4096] ~1 s on v5e),
but a single large 1-D sort is a different code path — this script
produces the actual number.

Timing discipline per CLAUDE.md: chained iterations inside jit where
possible, two timed loops, report the second, one host fetch at the end.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_list, iters=10):
    """bench.py discipline: DISTINCT inputs per call, scalar outputs, ONE
    host float() fetch at the end (block_until_ready is unreliable over
    the axon tunnel — the first cut of this script "measured" 2.4M-element
    sorts at 0.01 ms), two timed loops, report the second."""
    _ = float(fn(*args_list[0]))
    for _loop in range(2):
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % len(args_list)]) for i in range(iters)]
        _ = float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
    return dt * 1e3


def main():
    rng = np.random.default_rng(0)
    rows = {}

    for n in (600_000, 2_400_000):
        keysets = [(jnp.asarray(rng.random(n, dtype=np.float32)),
                    jnp.asarray(rng.integers(0, 117, n).astype(np.int32)))
                   for _ in range(4)]
        vals = jnp.arange(n, dtype=jnp.int32)

        sort1 = jax.jit(lambda k: jnp.sort(k)[n // 2])
        rows[f"sort_f32_{n}"] = round(
            timed(sort1, [(k,) for k, _ in keysets]), 2)

        argsort1 = jax.jit(lambda k: jnp.argsort(k)[n // 2])
        rows[f"argsort_f32_{n}"] = round(
            timed(argsort1, [(k,) for k, _ in keysets]), 2)

        kv = jax.jit(
            lambda k, v: jax.lax.sort((k, v), num_keys=1)[1][n // 2])
        rows[f"sort_kv_{n}"] = round(
            timed(kv, [(k, vals) for k, _ in keysets]), 2)

        lex = jax.jit(lambda t, k: jnp.lexsort((k, t))[n // 2])
        rows[f"lexsort_tile_depth_{n}"] = round(
            timed(lex, [(t, k) for k, t in keysets]), 2)

        # counting-sort building block: per-tile histogram via one matmul
        # (one-hot [N, 117] @ ones) — the MXU alternative to sort
        def hist(t):
            oh = jax.nn.one_hot(t, 117, dtype=jnp.float32)
            return oh.sum(0)[60]
        rows[f"tile_histogram_{n}"] = round(
            timed(jax.jit(hist), [(t,) for _, t in keysets]), 2)

    print(json.dumps({"metric": "sort_cost_ms", "rows": rows,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
