"""Dynamic street scene graph.

TPU redesign of StreetGaussianModel (street_gaussian_model.py): instead of
python sub-modules concatenated per camera (parse_camera + per-object loops,
:202-386), the scene is a pytree —

- ``bkgd``: one Gaussian pool in world frame;
- ``actors``: a *stacked* pool [A, cap_obj, ...] in per-object canonical
  frames, posed by a tracklet table [cams, frames, A] (quaternion + trans,
  with optional learnable residuals = opt_track, actor_pose.py:22-28);
- ``sky``: either a Gaussian pool or an optimizable cubemap;
- color / pose corrections.

``flatten_scene`` produces one fixed-size flat Gaussian soup for the
rasterizer: world-posed actor Gaussians are computed with a single vmap over
actors; per-camera object visibility is a validity mask (no host loops, the
whole render is one jitted function of (params, meta, camera, frame)).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import quaternion as Q
from .params import GaussianPool

# flip across canonical y-axis: diag(-1, 1, -1) (street_gaussian_model.py:55-58)
FLIP_AXIS = 1
FLIP_QUAT = np.array([0.0, 0.0, 1.0, 0.0], np.float32)  # wxyz of diag(-1,1,-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneParams:
    """Trainable leaves of the scene."""
    bkgd: GaussianPool | None
    actors: GaussianPool | None        # stacked [A, cap_obj, ...]
    sky: GaussianPool | None
    opt_trans: jax.Array | None        # [C, F, A, 3] tracklet residual
    opt_theta: jax.Array | None        # [C, F, A, 1] yaw residual
    sky_cubemap: jax.Array | None      # [6, R, R, 3]
    color_corr: jax.Array | None       # [M, 3, 4] affine per image/sensor
    color_corr_sky: jax.Array | None   # [M, 3, 4]
    pose_corr_quat: jax.Array | None   # [M, 4]
    pose_corr_trans: jax.Array | None  # [M, 3]
    # pose-conditioned MLP variant (color_correction.py use_mlp): flat
    # name->array dicts (models/gs/color_mlp.py); None in table mode
    color_mlp: dict | None = None
    color_mlp_sky: dict | None = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneMeta:
    """Non-trainable scene arrays (tracklets, timing, actor info)."""
    track_trans: jax.Array     # [C, F, A, 3]
    track_quats: jax.Array     # [C, F, A, 4] wxyz
    track_valid: jax.Array     # [C, F, A] bool
    timestamps: jax.Array      # [C, F] normalized per-camera timestamps
    actor_frame_range: jax.Array  # [A, 2] (start, end) frame of each actor
    actor_bbox: jax.Array | None = None  # [A, 3] (length, width, height)
    actor_random_init: jax.Array | None = None  # [A] grid-init flag
    # (<2000 LiDAR pts; forces absgrad densification, actor :201-210)
    # LiDAR scene sphere (base_readers.get_Sphere_Norm of points3D_lidar):
    # sky gaussians are pinned outside 2x this sphere and scale-clamped to
    # its radius (gaussian_model_sky.py:62-76)
    sphere_center: jax.Array | None = None  # [3]
    sphere_radius: jax.Array | None = None  # scalar
    fourier_scale: float = dataclasses.field(default=1.0, metadata=dict(static=True))

    @property
    def num_actors(self) -> int:
        return self.track_trans.shape[2]

    @property
    def num_frames(self) -> int:
        return self.track_trans.shape[1]


class FlatGaussians(NamedTuple):
    """One soup of world-space gaussians ready for projection."""
    xyz: jax.Array       # [N, 3]
    rotation: jax.Array  # [N, 4] normalized wxyz
    scaling: jax.Array   # [N, 3] activated
    opacity: jax.Array   # [N]
    shs: jax.Array       # [N, K, 3]
    valid: jax.Array     # [N]


def actor_pose(
    params: SceneParams,
    meta: SceneMeta,
    cam: jax.Array,
    frame_idx: jax.Array,
    timestamp: jax.Array | None = None,
    interpolate: bool = False,
    use_residual: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Tracked pose of every actor at (cam, frame): ([A,4], [A,3], [A] valid).

    Mirrors ActorPose.get_tracking_{translation,rotation}
    (actor_pose.py:83-144) including the optional residuals and the
    timestamp slerp interpolation between neighbor frames for val cameras.
    """
    def pose_at(f):
        trans = meta.track_trans[cam, f]
        quats = meta.track_quats[cam, f]
        if use_residual and params.opt_trans is not None:
            trans = trans + params.opt_trans[cam, f]
            # yaw residual about the object z axis (quaternion_raw_multiply_theta)
            theta = params.opt_theta[cam, f, :, 0]
            dq = jnp.stack([jnp.cos(theta / 2), jnp.zeros_like(theta),
                            jnp.zeros_like(theta), jnp.sin(theta / 2)], -1)
            quats = Q.multiply(quats, dq)
        return quats, trans

    quats, trans = pose_at(frame_idx)
    valid = meta.track_valid[cam, frame_idx]

    if interpolate and timestamp is not None:
        F = meta.num_frames
        f0 = jnp.clip(frame_idx - 1, 0, F - 1)
        f1 = jnp.clip(frame_idx + 1, 0, F - 1)
        q0, t0 = pose_at(f0)
        q1, t1 = pose_at(f1)
        ts0 = meta.timestamps[cam, f0]
        ts1 = meta.timestamps[cam, f1]
        alpha = (timestamp - ts0) / jnp.where(ts1 == ts0, 1.0, ts1 - ts0)
        can = ((frame_idx > 0) & (frame_idx < F - 1)
               & meta.track_valid[cam, f0] & meta.track_valid[cam, f1])
        trans_i = alpha * t1 + (1 - alpha) * t0
        quats_i = Q.slerp(q0, q1, jnp.broadcast_to(alpha, q0.shape[:-1]))
        trans = jnp.where(can[:, None], trans_i, trans)
        quats = jnp.where(can[:, None], quats_i, quats)

    return quats, trans, valid


def actor_time(meta: SceneMeta, frame: jax.Array) -> jax.Array:
    """Per-actor normalized Fourier time (gaussian_model_actor.py:67-69)."""
    start = meta.actor_frame_range[:, 0]
    end = meta.actor_frame_range[:, 1]
    span = jnp.maximum(end - start, 1.0)
    return meta.fourier_scale * (frame - start) / span


def sky_pin(xyz: jax.Array, scaling: jax.Array, meta: SceneMeta | None
            ) -> tuple[jax.Array, jax.Array]:
    """Sky-pool specialization (gaussian_model_sky.py:62-76): positions
    closer to the LiDAR sphere center than 2x its radius are pushed out onto
    the 2r sphere; scales are clamped at the sphere radius. No-op when the
    scene carries no sphere normalization."""
    if meta is None or meta.sphere_center is None:
        return xyz, scaling
    rel = xyz - meta.sphere_center
    dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    ratio = dist / (2.0 * meta.sphere_radius)
    pinned = meta.sphere_center + rel / jnp.maximum(ratio, 1e-12)
    xyz = jnp.where(ratio < 1.0, pinned, xyz)
    return xyz, jnp.minimum(scaling, meta.sphere_radius)


def flatten_scene(
    params: SceneParams,
    meta: SceneMeta | None,
    cam: jax.Array,
    frame_idx: jax.Array,
    frame: jax.Array,
    timestamp: jax.Array | None = None,
    include_bkgd: bool = True,
    include_obj: bool = True,
    include_sky: bool = True,
    interpolate: bool = False,
    use_residual: bool = True,
    flip_mask: jax.Array | None = None,  # [A, cap_obj] random symmetry flips
) -> FlatGaussians:
    parts_xyz, parts_rot, parts_scale, parts_op, parts_sh, parts_valid = \
        [], [], [], [], [], []

    def add_pool(xyz, rot, scale, op, shs, valid):
        parts_xyz.append(xyz)
        parts_rot.append(rot)
        parts_scale.append(scale)
        parts_op.append(op)
        parts_sh.append(shs)
        parts_valid.append(valid)

    if include_bkgd and params.bkgd is not None:
        p = params.bkgd
        add_pool(p.xyz, p.get_rotation(), p.get_scaling(),
                 p.get_opacity()[:, 0], p.get_features(), p.valid)

    if include_obj and params.actors is not None and meta is not None:
        a = params.actors  # stacked [A, cap, ...]
        A, cap = a.xyz.shape[0], a.xyz.shape[1]
        quats_w, trans_w, pose_valid = actor_pose(
            params, meta, cam, frame_idx, timestamp, interpolate, use_residual)

        times = actor_time(meta, frame)  # [A]

        xyz_local = a.xyz
        rot_local = a.get_rotation()
        if flip_mask is not None:
            xyz_local = jnp.where(
                flip_mask[..., None],
                xyz_local.at[..., FLIP_AXIS].multiply(-1.0), xyz_local)
            flipped = Q.multiply(jnp.asarray(FLIP_QUAT), rot_local)
            rot_local = jnp.where(flip_mask[..., None], flipped, rot_local)

        xyz_w = Q.rotate(quats_w[:, None, :], xyz_local) + trans_w[:, None, :]
        rot_w = Q.normalize(Q.multiply(quats_w[:, None, :], rot_local))

        # Fourier time-varying DC per actor
        def feats(pool_dc, pool_rest, t):
            F = pool_dc.shape[1]
            if F == 1:
                dc = pool_dc
            else:
                from ...ops.sh import idft_basis
                basis = idft_basis(t, F).reshape(-1)
                dc = jnp.einsum("nfc,f->nc", pool_dc, basis)[:, None, :]
            return jnp.concatenate([dc, pool_rest], axis=1)

        shs = jax.vmap(feats)(a.features_dc, a.features_rest, times)

        valid = a.valid & pose_valid[:, None]
        add_pool(xyz_w.reshape(A * cap, 3), rot_w.reshape(A * cap, 4),
                 a.get_scaling().reshape(A * cap, 3),
                 a.get_opacity().reshape(A * cap),
                 shs.reshape(A * cap, -1, 3), valid.reshape(A * cap))

    if include_sky and params.sky is not None:
        p = params.sky
        xyz, scaling = sky_pin(p.xyz, p.get_scaling(), meta)
        add_pool(xyz, p.get_rotation(), scaling,
                 p.get_opacity()[:, 0], p.get_features(), p.valid)

    if not parts_xyz:
        raise ValueError("flatten_scene: nothing to render")

    # pad SH K to the max across parts
    kmax = max(s.shape[1] for s in parts_sh)
    parts_sh = [
        jnp.pad(s, ((0, 0), (0, kmax - s.shape[1]), (0, 0))) for s in parts_sh]

    return FlatGaussians(
        xyz=jnp.concatenate(parts_xyz),
        rotation=jnp.concatenate(parts_rot),
        scaling=jnp.concatenate(parts_scale),
        opacity=jnp.concatenate(parts_op),
        shs=jnp.concatenate(parts_sh),
        valid=jnp.concatenate(parts_valid),
    )
