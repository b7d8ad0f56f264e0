"""Mesh-sharded conditioned sampling (frames-axis sequence parallelism).

The reference samples on a single GPU (sample_condition.py:418-473); the
distillation phase's wall-clock is dominated by these 50-step CFG windows.
On a TPU mesh the same frames-axis design used by the fine-tune step
(training/vdm_trainer.py: spatial UNet work stays frame-local, temporal
stages cross the axis through XLA-inserted all-to-alls) applies unchanged
at inference: annotate the leading T axis of the window inputs with the
``frames`` mesh axis, replicate the params, and jit ``engine.sample``.
XLA propagates the shardings through the whole sampler — EDM loop, CFG
batch doubling, VAE encode/decode included — and inserts the collectives.

Pallas kernels under the sharded jit go through the kernel_shard bridge
(parallel/kernel_shard.py): the flash-attention custom-vjp call is wrapped
in a shard_map over the frames axis at trace time, so the fast kernel stays
on the multi-chip path (GSPMD cannot auto-partition Mosaic calls). Where a
kernel's batch dim is not divisible by the axis it raises and
multi_head_attention falls back to the freely-partitionable XLA path;
``SC_TPU_FORCE_XLA_ATTENTION=1`` remains as a manual escape hatch.
``fused_temporal`` (forward-only Pallas temporal stage) stays an engine
config flag — off for sharded sampling.

Verified on the virtual 8-device CPU mesh against the single-device
sampler (tests/test_sample_mesh.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .kernel_shard import kernel_sharding
from .mesh import axis_size


def shard_window_inputs(mesh: Mesh, num_frames: int, tree: Any,
                        frames_axis: str = "frames") -> Any:
    """device_put every array leaf: leading dim == num_frames -> sharded
    over ``frames_axis``; everything else replicated."""
    fr = NamedSharding(mesh, P(frames_axis))
    rep = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_frames:
            return jax.device_put(x, fr)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def sample_on_mesh(
    engine,
    params,
    key: jax.Array,
    guide_images: jax.Array,          # [T, H, W, 3]
    cond_image: jax.Array,            # [n_cond, H, W, 3]
    mesh: Mesh,
    render_images: jax.Array | None = None,
    frames_axis: str = "frames",
    **sample_kw,
) -> jax.Array:
    """``engine.sample`` jitted over ``mesh`` with the window's frame axis
    sharded. Params are replicated (they fit per chip in bf16 — no TP axis,
    parallel/mesh.py). Returns the [T, H, W, 3] sample, frame-sharded."""
    T = engine.cfg.num_frames
    if T % axis_size(mesh, frames_axis) != 0:
        raise ValueError(
            f"num_frames {T} not divisible by mesh axis "
            f"'{frames_axis}'={axis_size(mesh, frames_axis)}")
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    key = jax.device_put(key, rep)
    guide_images = shard_window_inputs(mesh, T, guide_images, frames_axis)
    cond_image = jax.device_put(cond_image, rep)
    if render_images is not None:
        render_images = shard_window_inputs(mesh, T, render_images,
                                            frames_axis)

    def fn(p, k, g, c, r):
        return engine.sample(p, k, g, c, render_images=r, **sample_kw)

    jfn = jax.jit(fn, static_argnames=())
    with mesh, kernel_sharding(mesh, (frames_axis,)):
        # the kernel_sharding context is trace-time state: it matters on
        # the first (tracing) call and is free on cached executions
        return jfn(params, key, guide_images, cond_image, render_images)
