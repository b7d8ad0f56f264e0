"""Camera-parallel scene rendering over a device mesh.

The reference's 3DGS side is strictly single-GPU (SURVEY §2.3); here
trajectory rendering / evaluation scales over chips: scene params replicate,
the camera batch shards over the ``data`` mesh axis, and every device
renders its cameras independently (no collectives needed — rendering is
embarrassingly parallel across views).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ...datasets.cameras import Camera
from .renderer import render_scene
from .scene import SceneMeta, SceneParams


def stack_cameras(cameras: list[Camera], frame_idx: list[int] | None = None):
    """[B] camera batch arrays (w2c, K, meta ints) from same-size cameras.
    ``frame_idx`` (frame - start_frame, for tracklet lookup) defaults to the
    raw frame number (correct when selected_frames starts at 0)."""
    assert cameras, "empty camera batch"
    w, h = cameras[0].width, cameras[0].height
    assert all(c.width == w and c.height == h for c in cameras), \
        "sharded rendering needs a uniform resolution batch"
    if frame_idx is None:
        frame_idx = [c.frame for c in cameras]
    return {
        "w2c": jnp.stack([c.w2c for c in cameras]),
        "K": jnp.stack([c.K for c in cameras]),
        "frame_idx": jnp.asarray(frame_idx, jnp.int32),
        "frame": jnp.asarray([c.frame for c in cameras], jnp.float32),
        "cam_id": jnp.asarray([c.cam for c in cameras], jnp.int32),
        "timestamp": jnp.asarray([c.timestamp for c in cameras],
                                 jnp.float32),
    }, (h, w)


def make_sharded_renderer(mesh, width: int, height: int,
                          sh_degree: int = 3, tile_size: int = 16,
                          max_per_tile: int = 512,
                          data_axis: str = "data", **render_kw) -> Callable:
    """Jitted (params, meta, camera_batch) -> rgb [B, H, W, 3], with the
    batch axis sharded over ``data`` and params/meta replicated."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(data_axis))

    def render_one(params, meta, w2c, K, frame_idx, frame, cam_id, ts):
        cam = Camera(R=jnp.transpose(w2c[:3, :3]), T=w2c[:3, 3], K=K,
                     width=width, height=height)
        out = render_scene(
            params, meta, cam, frame_idx=frame_idx, frame=frame,
            cam_id=cam_id, timestamp=ts, sh_degree=sh_degree,
            tile_size=tile_size, max_per_tile=max_per_tile,
            interpolate_pose=True, clamp=True, **render_kw)
        return out["rgb"], out["depth"], out["acc"]

    @jax.jit
    def render_batch(params: SceneParams, meta: SceneMeta, batch: dict):
        from ...parallel.kernel_shard import kernel_sharding
        batch = {k: jax.lax.with_sharding_constraint(v, shard)
                 for k, v in batch.items()}
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, rep), params)
        # kernel_sharding + spmd_axis_name: Pallas raster kernels under the
        # sharded jit run inside a shard_map over the camera axis
        with kernel_sharding(mesh, ()):
            rgb, depth, acc = jax.vmap(
                lambda w2c, K, fi, f, cid, ts: render_one(
                    params, meta, w2c, K, fi, f, cid, ts),
                spmd_axis_name=data_axis)(
                batch["w2c"], batch["K"], batch["frame_idx"],
                batch["frame"], batch["cam_id"], batch["timestamp"])
        return {"rgb": rgb, "depth": depth, "acc": acc}

    return render_batch
