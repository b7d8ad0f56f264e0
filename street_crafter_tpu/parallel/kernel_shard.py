"""SPMD bridge for Pallas kernels (round 3).

GSPMD cannot auto-partition Mosaic custom calls: a sharded ``jit`` whose
traced graph contains a ``pallas_call`` fails to compile on a real
multi-chip mesh with "Mosaic kernels cannot be automatically partitioned.
Please wrap the call in a shard_map." The CPU dryruns never see this (the
kernels dispatch to XLA fallbacks off-TPU); it surfaced on the first
v5e:2x4 topology AOT compile of the fine-tune step
(scripts/check_fsdp_memory_aot.py).

Every hot kernel in this codebase is batch-parallel in its leading dim
(flash attention [B*H, S, D], fused temporal block, raster tiles), so the
fix is mechanical: wrap the kernel call in a ``jax.shard_map`` whose specs
shard the leading dim over the mesh axes the surrounding computation
already uses, and replicate the rest. Two composition rules make this
exact rather than approximate:

- Under ``jax.vmap`` (the per-clip loss in training/vdm_trainer.py), the
  vmapped clip axis is injected into the inner shard_map's specs by
  ``jax.vmap(..., spmd_axis_name=data_axis)`` — verified end-to-end:
  grad(vmap(spmd_axis_name, shard_map(custom_vjp(pallas)))) compiles on a
  v5e:2x4 topology with per-device argument sizes exactly 1/8th.
- Outside vmap (mesh-sharded sampling, parallel/sample.py), the context's
  ``axes`` shard the kernel's own leading dim (frames-axis SP).

The context is TRACE-TIME state: ``kernel_sharding(mesh, axes)`` is entered
inside the step function body, so it is active exactly while jit traces the
step (and on every retrace), costs nothing at runtime, and cannot leak
across differently-sharded step variants compiled in one process (the
dryrun compiles five).

Single-chip paths never enter the context and are byte-identical to
round 2.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

_TLS = threading.local()


def _stack():
    if not hasattr(_TLS, "stack"):
        _TLS.stack = []
    return _TLS.stack


@contextlib.contextmanager
def kernel_sharding(mesh: Mesh | None, axes: Sequence[str] = ()):
    """Declare that Pallas kernels traced inside this block run under a
    sharded jit on ``mesh``, with their leading (batch) dim sharded over
    ``axes`` (possibly empty — e.g. when jax.vmap(spmd_axis_name=...)
    carries the only sharded axis)."""
    if mesh is None:
        yield
        return
    axes = tuple(a for a in axes if mesh.shape.get(a, 1) > 1)
    _stack().append((mesh, axes))
    try:
        yield
    finally:
        _stack().pop()


def active_kernel_sharding() -> tuple[Mesh, tuple[str, ...]] | None:
    st = _stack()
    return st[-1] if st else None


def assert_no_context_axes(what: str) -> None:
    """Fail at trace time when the active kernel-sharding context carries
    mesh axes a kernel would misapply to a NON-batch leading dim.

    The raster kernels' leading dim is the coarse-tile axis Tc — only
    correct to wrap because all current callers enter the context with
    ``axes=()`` (the camera axis rides in via vmap(spmd_axis_name=...)).
    If such a kernel is ever traced inside a non-empty-axes context (e.g.
    the frames-axis context sample_on_mesh installs), sharding Tc over the
    mesh would silently corrupt the output — mirror temporal_block_fused's
    loud failure instead (ADVICE r3)."""
    ctx = active_kernel_sharding()
    if ctx is not None and ctx[1]:
        raise ValueError(
            f"{what}: active kernel-sharding context carries mesh axes "
            f"{ctx[1]}, but this kernel's leading dim is not a batch axis "
            "— enter kernel_sharding with axes=() (vmap spmd_axis_name "
            "carries the batch axis) or use the XLA path")


def wrap_kernel(fn: Callable, in_ranks: Sequence[int],
                out_ranks: Sequence[int] | int) -> Callable:
    """Wrap a leading-dim-batched kernel entry in shard_map when a
    kernel-sharding context is active at trace time; identity otherwise.

    ``in_ranks``/``out_ranks``: array ranks of the positional args/outputs
    (dim 0 is the shared batch dim; all other dims are replicated).
    """
    ctx = active_kernel_sharding()
    if ctx is None:
        return fn
    mesh, axes = ctx
    lead = axes if axes else None

    def spec(rank):
        return P(lead, *([None] * (rank - 1)))

    single = isinstance(out_ranks, int)
    in_specs = tuple(spec(r) for r in in_ranks)
    out_specs = spec(out_ranks) if single \
        else tuple(spec(r) for r in out_ranks)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
