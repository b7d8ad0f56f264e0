"""Native C++ host kernels vs python fallbacks (equivalence)."""

import numpy as np
import pytest

from street_crafter_tpu import native
from street_crafter_tpu.utils import ply as plymod

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native module not built")


def test_read_ply_native_matches_python(tmp_path, rng):
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    cols = rng.uniform(size=(500, 3)).astype(np.float32)
    mask = rng.uniform(size=500) > 0.3
    path = str(tmp_path / "x.ply")
    plymod.write_ply(path, pts, cols, mask)

    native_out = native.read_ply(path)
    assert native_out is not None
    py_out = plymod._read_ply_py(path)
    np.testing.assert_allclose(native_out[0], py_out.points, atol=1e-6)
    np.testing.assert_allclose(native_out[1], py_out.colors, atol=1e-6)
    np.testing.assert_array_equal(native_out[2], py_out.mask)


def test_read_ply_native_errors(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"garbage")
    with pytest.raises(ValueError):
        native.read_ply(str(bad))
    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(b"ply\nformat binary_little_endian 1.0\n"
                      b"element vertex 10\nproperty float x\n"
                      b"property float y\nproperty float z\nend_header\nxx")
    with pytest.raises(ValueError):
        native.read_ply(str(trunc))


def test_voxel_downsample_equivalence(rng):
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    cols = rng.uniform(size=(2000, 3)).astype(np.float32)
    n_pts, n_cols = native.voxel_downsample(pts, cols, 0.7)
    # python reference (bypass the native fast path)
    keys = np.floor(pts / 0.7).astype(np.int64)
    uniq = np.unique(keys, axis=0)
    assert n_pts.shape[0] == uniq.shape[0]
    # voxel means must match when sorted consistently
    order_n = np.lexsort(n_pts.T)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    ref = np.zeros((len(uniq), 3))
    np.add.at(ref, inv, pts)
    ref /= counts[:, None]
    order_r = np.lexsort(ref.T)
    np.testing.assert_allclose(n_pts[order_n], ref[order_r], atol=1e-5)


def test_radius_outliers_equivalence(rng):
    cluster = (rng.normal(size=(200, 3)) * 0.2).astype(np.float32)
    outliers = rng.uniform(50, 60, (5, 3)).astype(np.float32)
    pts = np.concatenate([cluster, outliers])
    keep = native.radius_outliers(pts, 5, 0.5)
    assert keep.dtype == bool
    assert not keep[200:].any()
    # brute force check
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    brute = (d2 <= 0.25).sum(-1) >= 6  # includes self
    np.testing.assert_array_equal(keep, brute)


def test_native_speedup(rng):
    """The native radius filter must beat the python dict-loop by a wide
    margin at scene-init scale."""
    import time
    pts = rng.uniform(-50, 50, (200_000, 3)).astype(np.float32)
    t0 = time.perf_counter()
    native.radius_outliers(pts, 10, 0.5)
    t_native = time.perf_counter() - t0
    assert t_native < 5.0, f"native too slow: {t_native:.2f}s"
