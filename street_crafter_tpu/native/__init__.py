"""Native host kernels (C++). Optional: pure-python/numpy fallbacks exist
for every function; build with ``python -m street_crafter_tpu.native.build``.
"""

from __future__ import annotations

try:
    from . import _native  # type: ignore
    HAVE_NATIVE = True
except ImportError:
    _native = None
    HAVE_NATIVE = False


def read_ply(path: str):
    """Returns (points, colors|None, mask|None) or None when the file needs
    the python fallback (ascii / exotic layouts)."""
    if _native is None:
        return None
    return _native.read_ply(path)


def voxel_downsample(points, colors, voxel_size: float):
    if _native is None:
        return None
    return _native.voxel_downsample(points, colors, float(voxel_size))


def radius_outliers(points, nb_points: int, radius: float):
    if _native is None:
        return None
    return _native.radius_outliers(points, int(nb_points), float(radius))
