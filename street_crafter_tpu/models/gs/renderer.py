"""Scene renderer: projection + SH + rasterization + sky/color composition.

Functional analog of StreetGaussianRenderer (street_gaussian_renderer.py):
- foreground pass renders background+objects (sky excluded), sky is rendered
  separately (gaussian sky) or sampled from the cubemap along camera rays,
  then alpha-blended: rgb += sky * (1 - acc) (:95-134);
- depth is rendered as an extra color channel and normalized by alpha
  (:265-287, gsplat use_depth convention);
- the viewspace-gradient hook for densification (means2d.retain_grad of the
  reference) is the explicit ``viewspace_zero`` input: callers differentiate
  the render w.r.t. it to obtain per-gaussian screen gradients.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ...ops import sh as SH
from ...ops.cubemap import sample_cubemap
from ...ops.gs_projection import project_gaussians
from ...ops.gs_raster import rasterize_pixels
from ...ops.gs_raster_fused import rasterize_pixels_fused
from ...ops.maths import get_rays
from ..gs.scene import FlatGaussians, SceneMeta, SceneParams, flatten_scene


def render_flat(
    flat: FlatGaussians,
    w2c: jax.Array,
    K: jax.Array,
    cam_center: jax.Array,
    width: int,
    height: int,
    sh_degree: int = 3,
    tile_size: int = 16,
    max_per_tile: int = 1024,
    antialiasing: bool = True,
    scaling_modifier: float = 1.0,
    viewspace_zero: jax.Array | None = None,
    absgrad_sink: jax.Array | None = None,
    near_plane: float = 0.01,
    far_plane: float = 1e8,
    bf16_composite: bool = False,
    recall_target: float = 0.95,
    with_stats: bool = False,
    method: str = "xla",   # "fused": Pallas forward-only compositing
    # (eval/trajectory rendering; no fine-capacity drops, early-exit on
    # saturation); "xla": differentiable path (training, absgrad)
    coarse_factor: int = 8,
    max_per_coarse: int = 4096,
    max_per_row: int | None = None,
    select_method: str = "approx",  # "approx" | "exact" | "sort" coarse
    # binning (exact = top_k, drop-free up to max_per_coarse; see
    # ops/gs_raster.py)
    escalate_tiles: int = 0,        # fused path: re-render the densest
    escalate_per_coarse: int = 0,   # tiles at high capacity instead of
    escalate_per_row: int | None = None,  # paying it for every tile
    escalate_classes: tuple = (),   # multi-class: ((budget, kc), ...)
    extra_channels: jax.Array | None = None,  # [N, Ks] per-gaussian values
    # alpha-composited alongside color (e.g. semantic logits,
    # street_gaussian_renderer.py:195-200); XLA path only. Returned under
    # "semantic" (un-normalized composite, matching the depth convention
    # before its alpha division)
) -> dict[str, jax.Array]:
    """Render a flat gaussian soup. Returns rgb [H,W,3], acc, depth, radii,
    visibility."""
    proj = project_gaussians(
        flat.xyz, flat.rotation, flat.scaling * scaling_modifier, w2c, K,
        width, height, near_plane=near_plane, far_plane=far_plane,
        antialiasing=antialiasing, mask=flat.valid)

    u, v = proj.u, proj.v
    if viewspace_zero is not None:
        # densification-gradient hook (the retain_grad analog)
        u = u + viewspace_zero[:, 0]
        v = v + viewspace_zero[:, 1]

    opacities = flat.opacity * proj.compensations

    # SH colors in world frame: dirs from camera center (renderer :256-262)
    dirs = flat.xyz - cam_center
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    # NOTE: a column-layout SH eval (eval_sh_columns) was measured SLOWER
    # on-chip here (4.20 vs 3.22 ms at 600k): the 48 strided [N] slices of
    # the [N, 16, 3] coefficients cost more than the einsum's narrow-lane
    # contraction, which XLA already vectorizes well. Keep the einsum.
    colors = SH.eval_sh(sh_degree, jnp.swapaxes(flat.shs, -1, -2), dirs)
    colors = jnp.maximum(colors + 0.5, 0.0)

    # depth as extra channel (renderer :265-287)
    chan = jnp.concatenate([colors, proj.depths[:, None]], -1)
    if extra_channels is not None:
        assert method == "xla", "extra channels need the generic XLA path"
        chan = jnp.concatenate([chan, extra_channels], -1)

    if method == "fused":
        out = rasterize_pixels_fused(
            u, v, proj.conic_a, proj.conic_b, proj.conic_c, chan, opacities,
            proj.depths, proj.valid, proj.radii,
            width=width, height=height, tile_size=tile_size,
            coarse_factor=coarse_factor, max_per_coarse=max_per_coarse,
            max_per_row=max_per_row, bf16_composite=bf16_composite,
            select_method=select_method,
            escalate_tiles=escalate_tiles,
            escalate_per_coarse=escalate_per_coarse,
            escalate_per_row=escalate_per_row,
            escalate_classes=escalate_classes,
            recall_target=recall_target, with_stats=with_stats)
    elif method == "fused_train":
        # differentiable Pallas path: fused forward + analytic backward
        # kernel (ops/gs_raster_train.py); same absgrad/viewspace contract
        # as the XLA path, ~1.5x faster fwd+bwd at training shapes
        from ...ops.gs_raster_train import rasterize_pixels_trainable
        out = rasterize_pixels_trainable(
            u, v, proj.conic_a, proj.conic_b, proj.conic_c, chan, opacities,
            proj.depths, proj.valid, proj.radii, absgrad_sink=absgrad_sink,
            width=width, height=height, tile_size=tile_size,
            coarse_factor=coarse_factor, max_per_coarse=max_per_coarse,
            max_per_row=max_per_row,
            recall_target=recall_target, with_stats=with_stats)
    else:
        out = rasterize_pixels(
            u, v, proj.conic_a, proj.conic_b, proj.conic_c, chan, opacities,
            proj.depths, proj.valid, proj.radii, absgrad_sink=absgrad_sink,
            width=width, height=height, tile_size=tile_size,
            max_per_tile=max_per_tile, coarse_factor=coarse_factor,
            max_per_coarse=max_per_coarse, bf16_composite=bf16_composite,
            select_method=select_method,
            recall_target=recall_target, with_stats=with_stats)

    rgb = out.colors[..., :3]
    depth = out.colors[..., 3] / jnp.maximum(out.alpha, 1e-10)
    result = {
        "rgb": rgb,
        "acc": out.alpha,
        "depth": depth,
        "radii": proj.radii / float(max(height, width)),
        "visibility": proj.valid & (proj.radii > 0),
    }
    if extra_channels is not None:
        result["semantic"] = out.colors[..., 4:]
    if out.stats is not None:
        result["raster_stats"] = out.stats
    return result


def render_scene(
    params: SceneParams,
    meta: SceneMeta | None,
    camera: Any,                 # datasets.cameras.Camera
    frame_idx: jax.Array | int = 0,
    frame: jax.Array | float = 0.0,
    cam_id: jax.Array | int = 0,
    timestamp: jax.Array | None = None,
    image_idx: jax.Array | int = 0,   # color/pose-correction table index
    include_bkgd: bool = True,
    include_obj: bool = True,
    include_sky: bool = True,
    sh_degree: int = 3,
    tile_size: int = 16,
    max_per_tile: int = 1024,
    antialiasing: bool = True,
    interpolate_pose: bool = False,
    use_track_residual: bool = True,
    flip_mask: jax.Array | None = None,
    viewspace_zero: jax.Array | None = None,
    absgrad_sink: jax.Array | None = None,
    viewspace_zero_sky: jax.Array | None = None,
    absgrad_sink_sky: jax.Array | None = None,
    clamp: bool = False,
    white_background: bool = False,
    bf16_composite: bool = False,
    recall_target: float = 0.95,
    with_stats: bool = False,
    method: str = "xla",
    max_per_coarse: int = 4096,
    max_per_row: int | None = None,
    select_method: str = "approx",        # foreground coarse selection
    escalate_tiles: int = 0,              # fused eval path only: overflow-
    escalate_per_coarse: int = 0,         # tile escalation for the
    escalate_per_row: int | None = None,  # FOREGROUND pass (sky is sparse)
    escalate_classes: tuple = (),         # multi-class: ((budget, kc), ...)
) -> dict[str, jax.Array]:
    """Full composition: foreground -> sky blend -> color correction."""
    w2c = camera.w2c
    K = camera.K
    if params.pose_corr_quat is not None:
        from ...ops import quaternion as Q
        from ...ops.maths import world_to_view
        dq = Q.normalize(params.pose_corr_quat[image_idx])
        dt = params.pose_corr_trans[image_idx]
        corr = world_to_view(Q.to_matrix(dq), dt)
        w2c = corr @ w2c
    cam_center = -(w2c[:3, :3].T @ w2c[:3, 3])

    # foreground pass always excludes sky (renderer :95-110: sky is rendered
    # separately and alpha-blended behind the foreground)
    flat = flatten_scene(
        params, meta, jnp.asarray(cam_id), jnp.asarray(frame_idx),
        jnp.asarray(frame, jnp.float32), timestamp,
        include_bkgd=include_bkgd, include_obj=include_obj,
        include_sky=False,
        interpolate=interpolate_pose, use_residual=use_track_residual,
        flip_mask=flip_mask)

    result = render_flat(
        flat, w2c, K, cam_center, camera.width, camera.height,
        sh_degree=sh_degree, tile_size=tile_size, max_per_tile=max_per_tile,
        antialiasing=antialiasing, viewspace_zero=viewspace_zero,
        absgrad_sink=absgrad_sink,
        bf16_composite=bf16_composite, recall_target=recall_target,
        with_stats=with_stats, method=method,
        max_per_coarse=max_per_coarse, max_per_row=max_per_row,
        select_method=select_method,
        escalate_tiles=escalate_tiles if method == "fused" else 0,
        escalate_per_coarse=escalate_per_coarse,
        escalate_per_row=escalate_per_row,
        escalate_classes=escalate_classes if method == "fused" else ())

    if include_sky and params.sky is not None:
        sky_flat = flatten_scene(
            params, meta, jnp.asarray(cam_id), jnp.asarray(frame_idx),
            jnp.asarray(frame, jnp.float32), timestamp,
            include_bkgd=False, include_obj=False, include_sky=True)
        sky_res = render_flat(
            sky_flat, w2c, K, cam_center, camera.width, camera.height,
            sh_degree=sh_degree, tile_size=tile_size,
            max_per_tile=max_per_tile, antialiasing=antialiasing,
            viewspace_zero=viewspace_zero_sky,
            absgrad_sink=absgrad_sink_sky,
            bf16_composite=bf16_composite, method=method,
            max_per_coarse=max_per_coarse, max_per_row=max_per_row)
        result["rgb"] = result["rgb"] + sky_res["rgb"] * (1.0 - result["acc"][..., None])
        result["acc_sky"] = sky_res["acc"]
        result["radii_sky"] = sky_res["radii"]
        result["visibility_sky"] = sky_res["visibility"]
    elif include_sky and params.sky_cubemap is not None:
        c2w_rot = w2c[:3, :3].T
        c2w = jnp.eye(4).at[:3, :3].set(c2w_rot).at[:3, 3].set(cam_center)
        _, dirs = get_rays(K, c2w, camera.height, camera.width)
        sky_rgb = sample_cubemap(params.sky_cubemap, dirs)
        acc = jax.lax.stop_gradient(result["acc"])[..., None]
        result["rgb"] = result["rgb"] + sky_rgb * (1.0 - acc)
        result["sky_rgb"] = sky_rgb
    elif white_background:
        result["rgb"] = result["rgb"] + (1.0 - result["acc"][..., None])

    if params.color_corr is not None:
        cc = params.color_corr[image_idx]  # [3, 4]
        rgb = result["rgb"]
        result["rgb"] = jnp.einsum("hwc,dc->hwd", rgb, cc[:, :3]) + cc[:, 3]
    elif getattr(params, "color_mlp", None) is not None:
        # pose-conditioned MLP mode (color_correction.py:117-127)
        from .color_mlp import apply_color_mlp
        cc = apply_color_mlp(params.color_mlp, w2c)
        rgb = result["rgb"]
        result["rgb"] = jnp.einsum("hwc,dc->hwd", rgb, cc[:, :3]) + cc[:, 3]
        result["cc_mat"] = cc
        if params.color_mlp_sky is not None:
            result["cc_mat_sky"] = apply_color_mlp(params.color_mlp_sky, w2c)

    if clamp:
        result["rgb"] = jnp.clip(result["rgb"], 0.0, 1.0)
    return result
