"""Device mesh construction — the framework's communication backend.

The reference's entire distributed story is NCCL hidden behind Lightning DDP /
DeepSpeed ZeRO-2 (video_diffusion/train.py:745-758,
configs/condition/waymo_high_res_mix.yaml:250). On TPU the analog is a single
``jax.sharding.Mesh`` with named axes; all collectives are inserted by XLA
from sharding annotations and ride ICI. This module owns mesh construction:

- ``data``   : batch / clip axis (DP; optimizer states sharded here = ZeRO-2)
- ``frames`` : video frame axis (sequence parallelism for the 25-frame clips;
  the reference has no SP — temporal attention is a local reshape — but the
  TPU design makes the frame axis a first-class mesh axis, SURVEY §2.3:
  spatial UNet work stays frame-local, temporal attention crosses the axis
  through an XLA-inserted all-to-all).

No tensor-parallel axis: the 1.5B UNet fits per chip in bf16 (SURVEY §2.3
"TP/PP/EP not required for parity").
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Named axis sizes. A size of -1 absorbs all remaining devices."""

    axes: Mapping[str, int]

    def resolve(self, n_devices: int) -> dict[str, int]:
        axes = dict(self.axes)
        fixed = 1
        wildcard = None
        for name, size in axes.items():
            if size == -1:
                if wildcard is not None:
                    raise ValueError("at most one mesh axis may be -1")
                wildcard = name
            else:
                fixed *= size
        if wildcard is not None:
            if n_devices % fixed != 0:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes product {fixed}")
            axes[wildcard] = n_devices // fixed
        else:
            if fixed != n_devices:
                raise ValueError(
                    f"mesh axes product {fixed} != device count {n_devices}")
        return axes


def make_mesh(
    spec: MeshSpec | Mapping[str, int],
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a Mesh laying axes out so the innermost (last) axis maps to
    physically adjacent devices — collectives over it ride ICI neighbors."""
    if not isinstance(spec, MeshSpec):
        spec = MeshSpec(dict(spec))
    if devices is None:
        devices = jax.devices()
    axes = spec.resolve(len(devices))
    names = tuple(axes.keys())
    shape = tuple(axes[n] for n in names)
    # jax.make_mesh applies device-topology-aware reordering when available.
    # Force Auto axis types: this framework uses sharding annotations +
    # with_sharding_constraint (Auto mode), not the Explicit sharding dialect.
    from jax.sharding import AxisType
    axis_types = tuple(AxisType.Auto for _ in names)
    try:
        return jax.make_mesh(shape, names, axis_types, devices=tuple(devices))
    except (TypeError, ValueError):
        dev_array = np.asarray(devices).reshape(shape)
        return Mesh(dev_array, names, axis_types=axis_types)


def make_virtual_cpu_mesh(n_devices: int, axes: Mapping[str, int]) -> Mesh:
    """Mesh over host-platform virtual devices (for tests / dryruns with
    ``--xla_force_host_platform_device_count=N``)."""
    devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, found {len(devices)}; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} before jax import")
    return make_mesh(MeshSpec(dict(axes)), devices[:n_devices])


def axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name] if name in mesh.shape else 1
