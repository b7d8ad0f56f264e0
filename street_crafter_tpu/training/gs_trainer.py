"""3DGS distillation trainer.

Functional redesign of the reference train loop (train.py:54-332): one jitted
``train_step`` does render -> loss -> grads -> per-group Adam -> densify-stat
accumulation; ``densify_step`` (every densification_interval) and
``reset_opacity_step`` run as separate jitted calls so the hot step never
recompiles. All pool updates happen at fixed capacity.

Viewspace (screen-space) gradients for densification come from
differentiating w.r.t. an explicit zero offset added to means2d — the JAX
analog of means2d.retain_grad() (street_gaussian_renderer.py:243-245,
train.py:281-295 accumulation).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.gs.densify import (
    DensifyState, densify_and_prune, init_densify_state, reset_opacity,
)
from ..models.gs.losses import LossWeights, compute_train_loss
from ..models.gs.optim import GaussianAdamState, adam_update, init_adam
from ..models.gs.params import GaussianPool
from ..models.gs.renderer import render_scene
from ..models.gs.scene import SceneMeta, SceneParams
from ..ops.maths import expon_lr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GSTrainState:
    params: SceneParams
    adam_bkgd: GaussianAdamState | None
    adam_actors: GaussianAdamState | None   # vmapped over actor axis
    adam_sky: GaussianAdamState | None
    adam_misc: GaussianAdamState | None
    dstate_bkgd: DensifyState | None
    dstate_actors: DensifyState | None      # stacked [A, cap]
    dstate_sky: DensifyState | None
    step: jax.Array


def _misc_params(params: SceneParams) -> dict[str, jax.Array]:
    out = {}
    for name in ("opt_trans", "opt_theta", "sky_cubemap", "color_corr",
                 "color_corr_sky", "pose_corr_quat", "pose_corr_trans",
                 "color_mlp", "color_mlp_sky"):
        val = getattr(params, name, None)
        if val is None:
            continue
        if isinstance(val, dict):   # MLP param dicts -> dotted flat names
            for k, v in val.items():
                out[f"{name}.{k}"] = v
        else:
            out[name] = val
    return out


def _unflatten_misc(flat: dict[str, jax.Array]) -> dict:
    out: dict = {}
    for k, v in flat.items():
        if "." in k:
            base, sub = k.split(".", 1)
            out.setdefault(base, {})[sub] = v
        else:
            out[k] = v
    return out


def init_train_state(params: SceneParams) -> GSTrainState:
    def pool_adam(pool: GaussianPool | None, stacked: bool):
        if pool is None:
            return None, None
        if stacked:
            return (jax.vmap(lambda p: init_adam(p.trainable_dict()))(pool),
                    jax.vmap(lambda p: init_densify_state(p.xyz.shape[0]))(pool))
        return init_adam(pool.trainable_dict()), init_densify_state(pool.capacity)

    adam_b, ds_b = pool_adam(params.bkgd, False)
    adam_a, ds_a = pool_adam(params.actors, True)
    adam_s, ds_s = pool_adam(params.sky, False)
    misc = _misc_params(params)
    return GSTrainState(
        params=params,
        adam_bkgd=adam_b, adam_actors=adam_a, adam_sky=adam_s,
        adam_misc=init_adam(misc) if misc else None,
        dstate_bkgd=ds_b, dstate_actors=ds_a, dstate_sky=ds_s,
        step=jnp.zeros((), jnp.int32))


def pool_lrs(cfg: Config, step: jax.Array, spatial_lr_scale: float) -> dict[str, jax.Array]:
    """Per-group LRs (training_setup, gaussian_model.py:287-315)."""
    o = cfg.optim
    xyz_lr = expon_lr(step, o.position_lr_init * spatial_lr_scale,
                      o.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=o.position_lr_delay_mult,
                      max_steps=o.position_lr_max_steps)
    f = jnp.float32
    return {
        "xyz": xyz_lr,
        "f_dc": f(o.feature_lr),
        "f_rest": f(o.feature_lr / 20.0),
        "opacity": f(o.opacity_lr),
        "scaling": f(o.scaling_lr),
        "rotation": f(o.rotation_lr),
    }


def misc_lrs(cfg: Config, step: jax.Array, keys) -> dict[str, jax.Array]:
    o = cfg.optim
    f = jnp.float32
    table = {
        "opt_trans": expon_lr(step, o.track_position_lr_init,
                              o.track_position_lr_final, max_steps=o.position_lr_max_steps),
        "opt_theta": expon_lr(step, o.track_rotation_lr_init,
                              o.track_rotation_lr_final, max_steps=o.position_lr_max_steps),
        "sky_cubemap": f(o.sky_cube_map_lr),
        "color_corr": f(o.color_correction_lr),
        "color_corr_sky": f(o.color_correction_lr),
        "pose_corr_quat": f(o.pose_correction_lr),
        "pose_corr_trans": f(o.pose_correction_lr),
        "color_mlp": f(o.color_correction_lr),
        "color_mlp_sky": f(o.color_correction_lr),
    }
    return {k: table[k.split(".", 1)[0]] for k in keys}


class StepOutput(NamedTuple):
    state: GSTrainState
    scalars: dict[str, jax.Array]


def stack_cameras_pytree(cams):
    """One Camera pytree with leading [B] on R/T/K for the camera-DP step
    (static fields from the first camera; resolutions must match)."""
    base = cams[0]
    assert all((c.width, c.height) == (base.width, base.height)
               for c in cams), "camera-DP needs a uniform-resolution batch"
    return dataclasses.replace(
        base,
        R=jnp.stack([c.R for c in cams]),
        T=jnp.stack([c.T for c in cams]),
        K=jnp.stack([c.K for c in cams]))


def make_train_step(
    cfg: Config,
    meta: SceneMeta | None,
    spatial_lr_scale: float,
    lpips_fn: Callable | None = None,
    is_novel: bool = False,
    active_sh_degree: int | None = None,
    with_obj_acc: bool = False,
    batch_size: int = 1,
    mesh=None,
    max_per_coarse: int | None = None,
) -> Callable:
    """Build the jitted training step. ``batch`` carries camera arrays and
    supervision images; static render options come from cfg.

    ``batch_size > 1`` returns the camera-DP variant: same signature, but
    ``camera``/``batch`` leaves carry a leading [B] axis (uniform
    resolution), sharded over ``mesh``'s data axis when given.

    ``max_per_coarse`` overrides the config raster capacity — the
    capacity-aware training probe (runner.train GSTrainer) picks a
    gate-cleared class {4096, 8192, 16384} from measured scene occupancy so
    a post-densification scene does not silently train on a render that
    drops (and therefore zero-grads) its densest tiles' candidates; gsplat
    sizes per frame and drops nothing (street_gaussian_renderer.py:243-280).
    """
    weights = LossWeights(
        lambda_l1=cfg.optim.lambda_l1, lambda_dssim=cfg.optim.lambda_dssim,
        lambda_lpips=cfg.optim.lambda_lpips, lambda_sky=cfg.optim.lambda_sky,
        lambda_reg=cfg.optim.lambda_reg,
        lambda_depth_lidar=cfg.optim.lambda_depth_lidar,
        lambda_scale_flatten=cfg.optim.lambda_scale_flatten,
        lambda_color_correction=cfg.optim.lambda_color_correction,
        lambda_novel=cfg.optim.lambda_novel,
        lambda_novel_l1=cfg.optim.lambda_novel_l1,
        lambda_novel_dssim=cfg.optim.lambda_novel_dssim,
        lambda_novel_lpips=cfg.optim.lambda_novel_lpips)
    tile_size = cfg.render.tile_size
    max_per_tile = cfg.render.max_intersects_per_tile
    if max_per_coarse is None:
        max_per_coarse = int(cfg.render.get("max_intersects_per_coarse",
                                            4096))
    # training raster backend: "auto" -> the differentiable Pallas path
    # (ops/gs_raster_train.py, ~1.5x faster fwd+bwd) on TPU, the XLA
    # autodiff path on CPU (interpret-mode kernels are slow in tests)
    train_method = str(cfg.render.get("train_method", "auto"))
    if train_method == "auto":
        train_method = ("fused_train"
                        if jax.default_backend() not in ("cpu",) else "xla")
    sh_degree = (active_sh_degree if active_sh_degree is not None
                 else cfg.model.gaussian.sh_degree)
    flip_prob = cfg.model.gaussian.flip_prob

    def sizes(params: SceneParams):
        nb = params.bkgd.capacity if params.bkgd is not None else 0
        if params.actors is not None:
            A, cap = params.actors.xyz.shape[:2]
        else:
            A, cap = 0, 0
        return nb, A, cap

    def compute_grads(params: SceneParams, camera, batch: dict[str, Any],
                      key: jax.Array):
        """One camera's loss gradients + ready-to-add densification-stat
        contributions. vmap-safe: all returns are fixed-shape pytrees, so
        the batched (camera-DP) step maps this over a stacked camera/batch
        and reduces (mean grads, summed stats)."""
        nb, A, cap_o = sizes(params)
        n_flat = nb + A * cap_o  # sky rendered separately; no viewspace grads
        kf, kd = jax.random.split(key)
        flip_mask = None
        if flip_prob > 0 and A > 0:
            flip_mask = jax.random.uniform(kf, (A, cap_o)) < flip_prob

        def loss_fn(p: SceneParams, vz: jax.Array, sink: jax.Array,
                    vz_sky: jax.Array, sink_sky: jax.Array):
            out = render_scene(
                p, meta, camera,
                frame_idx=batch["frame_idx"], frame=batch["frame"],
                cam_id=batch["cam_id"], timestamp=batch.get("timestamp"),
                image_idx=batch.get("image_idx", 0),
                sh_degree=sh_degree, tile_size=tile_size,
                max_per_tile=max_per_tile, max_per_coarse=max_per_coarse,
                flip_mask=flip_mask,
                viewspace_zero=vz, absgrad_sink=sink,
                viewspace_zero_sky=vz_sky, absgrad_sink_sky=sink_sky,
                white_background=bool(cfg.data.white_background),
                method=train_method)
            acc_obj = None
            if with_obj_acc and params.actors is not None:
                # objects-only pass for the acc-entropy regularizer
                # (train.py:202-208, render_object)
                out_obj = render_scene(
                    p, meta, camera,
                    frame_idx=batch["frame_idx"], frame=batch["frame"],
                    cam_id=batch["cam_id"], timestamp=batch.get("timestamp"),
                    include_bkgd=False, include_sky=False,
                    sh_degree=sh_degree, tile_size=tile_size,
                    max_per_tile=max_per_tile,
                    max_per_coarse=max_per_coarse, flip_mask=flip_mask,
                    method=train_method)
                acc_obj = out_obj["acc"]
            scaling = p.bkgd.get_scaling() if p.bkgd is not None else None
            valid = p.bkgd.valid if p.bkgd is not None else None
            cc_reg = p.color_corr
            cc_reg_sky = p.color_corr_sky
            if cc_reg is None and "cc_mat" in out:
                # MLP mode: regularize the evaluated affine (the reference's
                # cur_affine_trans, color_correction.py:140-146)
                cc_reg = out["cc_mat"][None]
                cc_reg_sky = (out["cc_mat_sky"][None]
                              if "cc_mat_sky" in out else None)
            loss, scalars = compute_train_loss(
                out, batch, weights, is_novel=is_novel, lpips_fn=lpips_fn,
                scene_scaling=scaling, scene_valid=valid,
                color_corr=cc_reg, color_corr_sky=cc_reg_sky,
                acc_obj=acc_obj)
            return loss, (scalars, out)

        vz0 = jnp.zeros((n_flat, 2), jnp.float32)
        n_sky = params.sky.capacity if params.sky is not None else 0
        vz0_sky = jnp.zeros((n_sky, 2), jnp.float32)
        # allow_int: SceneParams carries bool validity masks (their grads are
        # float0 and unused)
        (_, (scalars, out)), (gparams, gvz, gabs, gvz_sky, gabs_sky) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True,
                allow_int=True)(params, vz0, vz0, vz0_sky, vz0_sky)
        # gsplat pixel-unit screen grads -> the reference's NDC-comparable
        # scale: x 0.5*[W, H] (street_gaussian_model.py:508), so the
        # densify_grad_threshold values (0.0002/0.0006) carry over verbatim.
        grad_scale = 0.5 * jnp.array([camera.width, camera.height],
                                     jnp.float32)
        gvz = gvz * grad_scale
        gabs = gabs * grad_scale

        # densification-stat contributions (accumulate_stats summands;
        # per-camera norms — the norm of a sum is NOT the sum of norms, so
        # the batched step must sum THESE, not raw gradients)
        vis = out["visibility"][:n_flat]
        visf = vis.astype(jnp.float32)
        stats = {
            "contrib": jnp.linalg.norm(gvz[:, :2], axis=-1) * visf,
            "contrib_abs": jnp.linalg.norm(gabs[:, :2], axis=-1) * visf,
            "visf": visf,
            "rad": jnp.where(vis, out["radii"][:n_flat], 0.0),
        }
        if params.sky is not None and "visibility_sky" in out:
            vs = out["visibility_sky"]
            vsf = vs.astype(jnp.float32)
            gvzs = gvz_sky * grad_scale
            gabss = gabs_sky * grad_scale
            stats.update({
                "contrib_sky": jnp.linalg.norm(gvzs[:, :2], -1) * vsf,
                "contrib_abs_sky": jnp.linalg.norm(gabss[:, :2], -1) * vsf,
                "visf_sky": vsf,
                "rad_sky": jnp.where(vs, out["radii_sky"], 0.0),
            })
        return scalars, gparams, stats

    def apply_update(state: GSTrainState, scalars, gparams, stats
                     ) -> StepOutput:
        params = state.params
        nb, A, cap_o = sizes(params)
        n_flat = nb + A * cap_o

        def add_stats(ds: DensifyState, sl) -> DensifyState:
            return DensifyState(
                grad_accum=ds.grad_accum + stats["contrib"][sl],
                grad_abs_accum=ds.grad_abs_accum + stats["contrib_abs"][sl],
                denom=ds.denom + stats["visf"][sl],
                max_radii2d=jnp.maximum(ds.max_radii2d, stats["rad"][sl]))

        step = state.step
        lrs = pool_lrs(cfg, step, spatial_lr_scale)
        new_params = params
        new_state = state

        # -- background pool ---------------------------------------------
        if params.bkgd is not None:
            pd, adam2 = adam_update(
                params.bkgd.trainable_dict(),
                gparams.bkgd.trainable_dict(), state.adam_bkgd, lrs,
                update_mask=params.bkgd.valid)
            new_bkgd = params.bkgd.replace(
                xyz=pd["xyz"], features_dc=pd["f_dc"],
                features_rest=pd["f_rest"], scaling=pd["scaling"],
                rotation=pd["rotation"], opacity=pd["opacity"])
            ds2 = add_stats(state.dstate_bkgd, slice(0, nb))
            new_params = dataclasses.replace(new_params, bkgd=new_bkgd)
            new_state = dataclasses.replace(new_state, adam_bkgd=adam2,
                                            dstate_bkgd=ds2)

        # -- actor pools (vmapped) ----------------------------------------
        if params.actors is not None:
            def upd(pool, gpool, adam, dstate, contrib, contrib_abs, visf,
                    rad):
                pd, adam2 = adam_update(pool.trainable_dict(),
                                        gpool.trainable_dict(), adam, lrs,
                                        update_mask=pool.valid)
                new_pool = pool.replace(
                    xyz=pd["xyz"], features_dc=pd["f_dc"],
                    features_rest=pd["f_rest"], scaling=pd["scaling"],
                    rotation=pd["rotation"], opacity=pd["opacity"])
                ds2 = DensifyState(
                    grad_accum=dstate.grad_accum + contrib,
                    grad_abs_accum=dstate.grad_abs_accum + contrib_abs,
                    denom=dstate.denom + visf,
                    max_radii2d=jnp.maximum(dstate.max_radii2d, rad))
                return new_pool, adam2, ds2

            sl = slice(nb, n_flat)
            new_actors, adam_a2, ds_a2 = jax.vmap(upd)(
                params.actors, gparams.actors, state.adam_actors,
                state.dstate_actors,
                stats["contrib"][sl].reshape(A, cap_o),
                stats["contrib_abs"][sl].reshape(A, cap_o),
                stats["visf"][sl].reshape(A, cap_o),
                stats["rad"][sl].reshape(A, cap_o))
            new_params = dataclasses.replace(new_params, actors=new_actors)
            new_state = dataclasses.replace(new_state, adam_actors=adam_a2,
                                            dstate_actors=ds_a2)

        # -- sky pool -------------------------------------------------------
        if params.sky is not None:
            pd, adam2 = adam_update(
                params.sky.trainable_dict(), gparams.sky.trainable_dict(),
                state.adam_sky, lrs, update_mask=params.sky.valid)
            new_sky = params.sky.replace(
                xyz=pd["xyz"], features_dc=pd["f_dc"],
                features_rest=pd["f_rest"], scaling=pd["scaling"],
                rotation=pd["rotation"], opacity=pd["opacity"])
            new_params = dataclasses.replace(new_params, sky=new_sky)
            ds_sky = state.dstate_sky
            if "contrib_sky" in stats:
                # sky densification stats from the sky pass
                # (add_densification_stats_sky, street_gaussian_model
                # .py:522-532)
                ds_sky = DensifyState(
                    grad_accum=ds_sky.grad_accum + stats["contrib_sky"],
                    grad_abs_accum=(ds_sky.grad_abs_accum
                                    + stats["contrib_abs_sky"]),
                    denom=ds_sky.denom + stats["visf_sky"],
                    max_radii2d=jnp.maximum(ds_sky.max_radii2d,
                                            stats["rad_sky"]))
            new_state = dataclasses.replace(new_state, adam_sky=adam2,
                                            dstate_sky=ds_sky)

        # -- misc params (cubemap / corrections / track residuals) ---------
        misc = _misc_params(params)
        if misc:
            gmisc = _misc_params(gparams)
            mlrs = misc_lrs(cfg, step, misc.keys())
            new_misc, adam_m2 = adam_update(misc, gmisc, state.adam_misc, mlrs)
            new_params = dataclasses.replace(
                new_params, **_unflatten_misc(new_misc))
            new_state = dataclasses.replace(new_state, adam_misc=adam_m2)

        new_state = dataclasses.replace(
            new_state, params=new_params, step=step + 1)
        return StepOutput(state=new_state, scalars=scalars)

    if batch_size <= 1:
        def train_step(state: GSTrainState, camera, batch: dict[str, Any],
                       key: jax.Array) -> StepOutput:
            scalars, gparams, stats = compute_grads(state.params, camera,
                                                    batch, key)
            return apply_update(state, scalars, gparams, stats)

        return jax.jit(train_step)

    # camera-DP training step (beyond the reference's single-GPU loop,
    # SURVEY §2.3): B cameras render/differentiate in parallel — sharded
    # over the mesh's data axis when one is given — with mean gradients
    # (exactly DP) and SUMMED densification-stat contributions (exactly B
    # sequential reference iterations' worth of stats).
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))

    def train_step_dp(state: GSTrainState, cameras, batch: dict[str, Any],
                      key: jax.Array) -> StepOutput:
        """``cameras``: one Camera pytree with leading [B] on R/T/K;
        ``batch`` leaves lead with [B]."""
        if mesh is not None:
            state = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, rep), state)
            cameras, batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, shard),
                (cameras, batch))
        keys = jax.random.split(key, batch_size)
        # SPMD bridge for the Pallas raster kernels (parallel/kernel_shard):
        # spmd_axis_name threads the sharded camera axis into the kernels'
        # shard_map; GSPMD cannot auto-partition Mosaic calls on a real mesh
        from ..parallel.kernel_shard import kernel_sharding
        with kernel_sharding(mesh, ()):
            scalars, gparams, stats = jax.vmap(
                compute_grads, in_axes=(None, 0, 0, 0),
                spmd_axis_name="data" if mesh is not None else None)(
                state.params, cameras, batch, keys)
        scalars = jax.tree_util.tree_map(lambda x: jnp.mean(x, 0), scalars)
        gparams = jax.tree_util.tree_map(
            lambda x: jnp.mean(x.astype(jnp.float32), 0)
            if jnp.issubdtype(x.dtype, jnp.floating) else x[0], gparams)
        stats = {k: (jnp.max(v, 0) if k.startswith("rad")
                     else jnp.sum(v, 0)) for k, v in stats.items()}
        return apply_update(state, scalars, gparams, stats)

    return jax.jit(train_step_dp)


def make_densify_step(cfg: Config) -> Callable:
    o = cfg.optim
    # Reference flag semantics (gaussian_model_bkgd.py:102-105): with gsplat
    # absgrad always on, densify_grad_abs_*=True selects the SIGNED-grad
    # column, False (default) the absgrad column.
    use_abs_bkgd = not bool(o.get("densify_grad_abs_bkgd", False))
    use_abs_obj = not bool(o.get("densify_grad_abs_obj", False))
    thresh_bkgd = float(o.get("densify_grad_threshold_bkgd") or
                        o.densify_grad_threshold)
    thresh_obj = float(o.get("densify_grad_threshold_obj") or
                       o.densify_grad_threshold)

    def densify_step(state: GSTrainState, key: jax.Array,
                     extent: float,
                     actor_bbox: jax.Array | None = None,
                     actor_random_init: jax.Array | None = None,
                     sphere_center: jax.Array | None = None,
                     sphere_radius: jax.Array | None = None
                     ) -> tuple[GSTrainState, dict]:
        params = state.params
        new = state
        info = {}
        kb, ka, ks = jax.random.split(key, 3)
        if params.bkgd is not None:
            pool, adam, ds, inf = densify_and_prune(
                params.bkgd, state.adam_bkgd, state.dstate_bkgd, kb,
                grad_threshold=thresh_bkgd,
                percent_dense=o.percent_dense, extent=extent,
                min_opacity=o.min_opacity,
                prune_big_points=bool(o.prune_big_points),
                percent_big_ws=o.percent_big_ws,
                max_screen_size=o.max_screen_size,
                use_abs=use_abs_bkgd)
            new = dataclasses.replace(
                new, params=dataclasses.replace(new.params, bkgd=pool),
                adam_bkgd=adam, dstate_bkgd=ds)
            info["bkgd"] = inf
        if params.actors is not None:
            A = params.actors.xyz.shape[0]
            keys = jax.random.split(ka, A)

            def dp(pool, adam, ds, k, bbox, rand_init):
                # random-init (grid) actors always densify on absgrad and
                # the base threshold (gaussian_model_actor.py:201-210)
                return densify_and_prune(
                    pool, adam, ds, k,
                    grad_threshold=jnp.where(rand_init,
                                             o.densify_grad_threshold,
                                             thresh_obj),
                    percent_dense=o.percent_dense, extent=extent,
                    min_opacity=o.min_opacity, bbox=bbox,
                    use_abs=rand_init | use_abs_obj)

            if actor_bbox is None:
                actor_bbox_ = jnp.full((A, 3), jnp.inf)
            else:
                actor_bbox_ = actor_bbox
            if actor_random_init is None:
                rand_init_ = jnp.zeros((A,), bool)
            else:
                rand_init_ = actor_random_init
            pool, adam, ds, inf = jax.vmap(dp)(
                params.actors, state.adam_actors, state.dstate_actors, keys,
                actor_bbox_, rand_init_)
            new = dataclasses.replace(
                new, params=dataclasses.replace(new.params, actors=pool),
                adam_actors=adam, dstate_actors=ds)
            info["actors"] = inf
        if params.sky is not None and sphere_radius is not None:
            # sky model: own extent, pinned split origins, clamped scales,
            # always the absgrad column (gaussian_model_sky.py:79-148)
            from ..models.gs.densify import sky_extent
            ext_sky = sky_extent(params.sky, sphere_radius, o.percent_dense)
            pool, adam, ds, inf = densify_and_prune(
                params.sky, state.adam_sky, state.dstate_sky, ks,
                grad_threshold=o.densify_grad_threshold,
                percent_dense=o.percent_dense, extent=ext_sky,
                min_opacity=o.min_opacity,
                prune_big_points=bool(o.prune_big_points),
                percent_big_ws=o.percent_big_ws,
                max_screen_size=o.max_screen_size,
                pin_sphere=(sphere_center, sphere_radius), use_abs=True)
            new = dataclasses.replace(
                new, params=dataclasses.replace(new.params, sky=pool),
                adam_sky=adam, dstate_sky=ds)
            info["sky"] = inf
        return new, info

    return jax.jit(densify_step, static_argnames=("extent",))


@jax.jit
def reset_opacity_step(state: GSTrainState) -> GSTrainState:
    new = state
    if state.params.bkgd is not None:
        pool, adam = reset_opacity(state.params.bkgd, state.adam_bkgd)
        new = dataclasses.replace(
            new, params=dataclasses.replace(new.params, bkgd=pool),
            adam_bkgd=adam)
    if state.params.actors is not None:
        pool, adam = jax.vmap(reset_opacity)(
            state.params.actors, state.adam_actors)
        new = dataclasses.replace(
            new, params=dataclasses.replace(new.params, actors=pool),
            adam_actors=adam)
    if state.params.sky is not None:
        # reference resets ALL sub-models incl. sky
        # (street_gaussian_model.py:560-565)
        pool, adam = reset_opacity(state.params.sky, state.adam_sky)
        new = dataclasses.replace(
            new, params=dataclasses.replace(new.params, sky=pool),
            adam_sky=adam)
    return new
