"""Condition-render parity vs an independent torch implementation of the
reference's diff_point_rasterization semantics (VERDICT r1 #9).

A true reference-produced condition png is unobtainable here (the CUDA
extension can't build, no sample outputs ship in the repo, zero egress), so
parity is established against tests/torch_ref/point_raster_torch.py — a
from-scratch torch CPU transcription of render_utils.py:83-183 — at the
reference settings (use_ndc_scale=True, scale=0.01, occ=1.0,
waymo_render_lidar_pcd.py:264) for the straight camera and a 3 m lane
shift. Done-criterion: PSNR >= 40 dB.
"""

import jax.numpy as jnp
import numpy as np

from street_crafter_tpu.ops.point_raster import render_pointcloud_gaussian
from tests.torch_ref.point_raster_torch import render_pointcloud_torch


def make_street_points(rng, n=2500):
    """Street-like LiDAR: ground plane + two walls + a car-ish blob."""
    ground = np.stack([rng.uniform(-12, 12, n // 2), np.full(n // 2, 1.6),
                       rng.uniform(2, 50, n // 2)], -1)
    walls = np.stack([rng.choice([-7.0, 7.0], n // 3)
                      + rng.normal(0, 0.2, n // 3),
                      rng.uniform(-4, 1.6, n // 3),
                      rng.uniform(2, 50, n // 3)], -1)
    car = np.stack([rng.normal(1.5, 0.8, n // 6), rng.uniform(0.1, 1.6, n // 6),
                    rng.normal(12, 1.5, n // 6)], -1)
    pts = np.concatenate([ground, walls, car]).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (len(pts), 3)).astype(np.float32)
    return pts, cols


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return -10 * np.log10(mse + 1e-12)


def run_case(shift_x):
    rng = np.random.default_rng(0)
    pts, cols = make_street_points(rng)
    H, W = 96, 160
    K = np.array([[110.0, 0, W / 2], [0, 110.0, H / 2], [0, 0, 1]],
                 np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[0, 3] = shift_x   # lane shift (waymo novel-view shift semantics)

    out = render_pointcloud_gaussian(
        jnp.asarray(c2w), jnp.asarray(K), jnp.asarray(pts),
        jnp.asarray(cols), H, W, scale=0.01, use_ndc_scale=True, occ=1.0,
        select_method="exact")
    ref_rgb, ref_acc = render_pointcloud_torch(
        c2w, K, pts, cols, H, W, scale=0.01, occ=1.0)
    return (np.asarray(out.rgb), np.asarray(out.acc), ref_rgb, ref_acc)


def test_condition_parity_shift0():
    rgb, acc, ref_rgb, ref_acc = run_case(0.0)
    p = psnr(rgb, ref_rgb)
    assert p >= 40.0, p
    assert psnr(acc, ref_acc) >= 40.0
    assert ref_acc.max() > 0.9   # scene actually covers pixels


def test_condition_parity_shift3():
    rgb, acc, ref_rgb, ref_acc = run_case(3.0)
    p = psnr(rgb, ref_rgb)
    assert p >= 40.0, p
    assert psnr(acc, ref_acc) >= 40.0


def test_processor_gaussian_mode_is_default():
    import inspect
    from street_crafter_tpu.data_processor.pointcloud import (
        PointCloudProcessor)
    sig = inspect.signature(PointCloudProcessor.render_condition)
    assert sig.parameters["splat_mode"].default == "gaussian"
