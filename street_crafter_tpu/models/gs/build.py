"""Host-side scene assembly: SceneInfo + input plys -> SceneParams/SceneMeta.

The create_scene analog (create_scene.py:9-35 + Scene.__init__,
street_gaussian/models/scene.py:14-61 + per-sub-model create_from_pcd,
gaussian_model.py:55-80, gaussian_model_actor.py:78-157): pools are built at
fixed capacity from the scene-init plys, actors are stacked into one
[A, cap_obj, ...] pool, tracklets become SceneMeta arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...config import Config
from ...datasets.readers import CameraInfo, SceneInfo
from ...utils.ply import read_ply
from .params import GaussianPool, empty_pool, init_pool_from_points
from .scene import SceneMeta, SceneParams


def build_scene_meta(info: SceneInfo, fourier_scale: float = 1.0) -> SceneMeta:
    """Tracklet tensors [C, F, A, ...] -> SceneMeta."""
    tr = np.asarray(info.metadata["camera_tracklets"])  # [C, F, A, 8]
    C, F, A, _ = tr.shape
    ts = np.zeros((C, F), np.float64)
    for cam, stamps in info.metadata["camera_timestamps"].items():
        ts[cam, : len(stamps)] = stamps

    obj_meta = info.metadata["obj_meta"]
    start = info.metadata.get("start_frame", 0)
    ranges = np.zeros((A, 2), np.float32)
    bboxes = np.ones((A, 3), np.float32)
    for o in obj_meta:
        ranges[o.id] = (o.start_frame, o.end_frame)
        bboxes[o.id] = (o.length, o.width, o.height)

    return SceneMeta(
        track_trans=jnp.asarray(tr[..., :3], jnp.float32),
        track_quats=jnp.asarray(tr[..., 3:7], jnp.float32),
        track_valid=jnp.asarray(tr[..., 7] > 0),
        timestamps=jnp.asarray(ts, jnp.float32),
        actor_frame_range=jnp.asarray(ranges),
        actor_bbox=jnp.asarray(bboxes),
        fourier_scale=float(fourier_scale),
    )


def _grid_init_points(bbox: np.ndarray, points_dim: int = 20,
                      seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Random-color regular grid filling the actor bbox
    (gaussian_model_actor.py:92-107, used when <2000 LiDAR points)."""
    lin = np.linspace(-1.0, 1.0, points_dim)
    gx, gy, gz = np.meshgrid(lin, lin, lin)
    xyz = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1) * (bbox / 2.0)
    rgb = np.random.default_rng(seed).random(xyz.shape).astype(np.float32)
    return xyz.astype(np.float32), rgb


def build_actor_pools(info: SceneInfo, ply_paths: dict[str, str],
                      cfg: Config
                      ) -> tuple[GaussianPool | None, np.ndarray | None]:
    """Stacked per-actor pool [A, cap_obj, ...] in canonical frames, plus a
    per-actor random-initialization flag (grid init when <2000 LiDAR points,
    gaussian_model_actor.py:78-107 — random-init actors densify on the
    absgrad column regardless of densify_grad_abs_obj, :201-210)."""
    obj_meta = info.metadata["obj_meta"]
    if not obj_meta:
        return None, None
    cap = int(cfg.optim.capacity_obj)
    sh_degree = cfg.model.gaussian.sh_degree
    fourier = cfg.model.gaussian.fourier_dim

    pools = []
    random_init = []
    for obj in sorted(obj_meta, key=lambda o: o.id):
        key = f"obj_{obj.object_id:03d}"
        pts = rgb = None
        if key in ply_paths:
            pc = read_ply(ply_paths[key])
            if len(pc.points) >= 2000:
                pts, rgb = pc.points, pc.colors
        random_init.append(pts is None)
        if pts is None:
            bbox = np.array([obj.length, obj.width, obj.height], np.float32)
            pts, rgb = _grid_init_points(bbox, seed=obj.id)
        # deformable actors get no Fourier time dimension richer than pose
        pools.append(init_pool_from_points(
            pts, rgb if rgb is not None else np.full_like(pts, 0.5),
            capacity=cap, sh_degree=sh_degree, fourier_dim=fourier))

    import jax
    return (jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pools),
            np.asarray(random_init, bool))


def build_scene_params(info: SceneInfo, ply_paths: dict[str, str],
                       cfg: Config) -> tuple[SceneParams, SceneMeta]:
    """Assemble all trainable leaves of the scene."""
    sh_degree = cfg.model.gaussian.sh_degree
    meta = build_scene_meta(info, cfg.model.gaussian.fourier_scale)

    # LiDAR scene-sphere normalization for the sky specialization
    # (gaussian_model_sky.py:20-35: get_Sphere_Norm of points3D_lidar.ply)
    sphere_src = ply_paths.get("lidar") or ply_paths.get("bkgd")
    if sphere_src:
        from ...data_processor.pointcloud import sphere_norm
        pc = read_ply(sphere_src)
        center, radius = sphere_norm(pc.points)
        import dataclasses as _dc
        meta = _dc.replace(
            meta, sphere_center=jnp.asarray(center, jnp.float32),
            sphere_radius=jnp.float32(radius))

    bkgd = None
    if cfg.model.nsg.include_bkgd and "bkgd" in ply_paths:
        pc = read_ply(ply_paths["bkgd"])
        bkgd = init_pool_from_points(
            pc.points, pc.colors if pc.colors is not None
            else np.full_like(pc.points, 0.5),
            capacity=int(cfg.optim.capacity_bkgd), sh_degree=sh_degree)

    actors = None
    if cfg.model.nsg.include_obj:
        actors, actor_random_init = build_actor_pools(info, ply_paths, cfg)
        if actor_random_init is not None:
            import dataclasses as _dc
            meta = _dc.replace(meta, actor_random_init=jnp.asarray(
                actor_random_init))

    sky = None
    sky_cubemap = None
    if cfg.model.nsg.include_sky:
        if cfg.model.sky.use_cube_map:
            r = int(cfg.model.sky.resolution)
            sky_cubemap = jnp.full((6, r, r, 3), 0.5, jnp.float32)
        elif "sky" in ply_paths:
            pc = read_ply(ply_paths["sky"])
            sky = init_pool_from_points(
                pc.points, pc.colors if pc.colors is not None
                else np.full_like(pc.points, 0.5),
                capacity=int(cfg.optim.capacity_sky), sh_degree=sh_degree)

    opt_trans = opt_theta = None
    if cfg.model.nsg.opt_track and actors is not None:
        C, F, A = meta.track_valid.shape
        opt_trans = jnp.zeros((C, F, A, 3), jnp.float32)
        opt_theta = jnp.zeros((C, F, A, 1), jnp.float32)

    color_corr = color_corr_sky = None
    color_mlp = color_mlp_sky = None
    if cfg.model.use_color_correction:
        if cfg.model.color_correction.get("use_mlp", False):
            from .color_mlp import init_color_mlp
            color_mlp = init_color_mlp(jax.random.PRNGKey(0))
            if cfg.model.color_correction.use_sky:
                color_mlp_sky = init_color_mlp(jax.random.PRNGKey(1))
        else:
            n = (info.metadata["num_images"]
                 if cfg.model.color_correction.mode == "image"
                 else info.metadata["num_cams"])
            eye = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
            color_corr = jnp.tile(eye[None], (n, 1, 1))
            if cfg.model.color_correction.use_sky:
                color_corr_sky = jnp.tile(eye[None], (n, 1, 1))

    pose_quat = pose_trans = None
    if cfg.model.use_pose_correction:
        n = info.metadata["num_images"]
        pose_quat = jnp.tile(
            jnp.array([1.0, 0, 0, 0], jnp.float32)[None], (n, 1))
        pose_trans = jnp.zeros((n, 3), jnp.float32)

    params = SceneParams(
        bkgd=bkgd, actors=actors, sky=sky,
        opt_trans=opt_trans, opt_theta=opt_theta, sky_cubemap=sky_cubemap,
        color_corr=color_corr, color_corr_sky=color_corr_sky,
        pose_corr_quat=pose_quat, pose_corr_trans=pose_trans,
        color_mlp=color_mlp, color_mlp_sky=color_mlp_sky)
    return params, meta


def load_guidance_arrays(cam: CameraInfo) -> dict[str, np.ndarray]:
    """Load guidance images referenced by the reader into arrays
    (waymo_readers.py:120-140)."""
    import imageio.v2 as imageio
    out = {}
    g = cam.guidance
    if "obj_bound_path" in g:
        img = np.asarray(imageio.imread(g["obj_bound_path"]))
        if img.ndim == 3:
            img = img[..., 0]
        out["obj_bound"] = (img > 0)[..., None]
    if "sky_mask_path" in g:
        img = np.asarray(imageio.imread(g["sky_mask_path"]))
        if img.ndim == 3:
            img = img[..., 0]
        out["sky_mask"] = (img > 0)[..., None]
    if "lidar_depth_path" in g:
        z = np.load(g["lidar_depth_path"])
        mask = z["mask"].astype(bool)
        depth = np.zeros(mask.shape, np.float32)
        depth[mask] = z["value"].astype(np.float32)
        out["lidar_depth"] = depth[..., None]
    return out


def camera_batch(cam: CameraInfo, load_image: bool = True,
                 load_guidance: bool = True) -> dict:
    """Supervision batch for one camera (gt image + guidance + indices)."""
    batch: dict = {
        "frame_idx": jnp.asarray(cam.metadata["frame_idx"], jnp.int32),
        "frame": jnp.asarray(cam.metadata["frame"], jnp.float32),
        "cam_id": jnp.asarray(cam.metadata["cam"], jnp.int32),
        "timestamp": jnp.asarray(cam.metadata.get("timestamp", 0.0),
                                 jnp.float32),
        "image_idx": jnp.asarray(cam.uid, jnp.int32),
    }
    if load_image:
        batch["gt_image"] = jnp.asarray(cam.load_image())
    if load_guidance:
        for k, v in load_guidance_arrays(cam).items():
            batch[k] = jnp.asarray(v)
    return batch


def to_device_camera(cam: CameraInfo, downscale: float = 1.0):
    """CameraInfo -> jit-friendly Camera pytree (loadCam analog,
    camera_utils.py:146-171: cap the longer side at 1600 px)."""
    from ...datasets.cameras import Camera
    w2c = np.eye(4)
    w2c[:3, :3] = cam.R.T
    w2c[:3, 3] = cam.T
    c = Camera.from_extrinsic(
        w2c.astype(np.float32), cam.K, cam.width, cam.height,
        id=cam.uid, frame=cam.metadata.get("frame", -1),
        cam=cam.metadata.get("cam", 0),
        timestamp=float(cam.metadata.get("timestamp", 0.0)),
        image_name=cam.image_name)
    if downscale != 1.0:
        c = c.rescale(1.0 / downscale)
    return c


def auto_downscale(width: int, limit: int = 1600) -> float:
    """Reference behavior: warn + downscale when width > 1600
    (camera_utils.py:150-160)."""
    return max(1.0, width / limit)
