"""Adaptive density control on fixed-capacity pools.

Reimplements the 3DGS clone/split/prune cycle (gaussian_model.py:452-551) as
jitted static-shape operations: children are written into free (invalid)
slots allocated by a prefix sum over the candidate list; prune just clears
the validity mask; Adam moments at reallocated slots are zeroed (the analog
of cat_optimizer/prune_optimizer surgery). Capacity overflow silently drops
the lowest-priority candidates — mirror the reference by sizing pools with
headroom.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops import quaternion as Q
from .optim import GaussianAdamState, zero_moments_at
from .params import GaussianPool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensifyState:
    # Two accumulator columns, mirroring the reference's
    # xyz_gradient_accum[:, 0:2] (street_gaussian_model.py:504-518):
    # column 0 <-> grad_abs_accum = ||per-pixel |dL/d means2d| sum|| (gsplat
    # absgrad channel), column 1 <-> grad_accum = ||pixel-summed signed
    # gradient||.
    grad_accum: jax.Array      # [cap] signed-gradient norms
    grad_abs_accum: jax.Array  # [cap] absgrad norms
    denom: jax.Array           # [cap] number of accumulations
    max_radii2d: jax.Array     # [cap] running max screen radius (normalized)


def init_densify_state(capacity: int) -> DensifyState:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyState(grad_accum=z, grad_abs_accum=z, denom=z,
                        max_radii2d=z)


def accumulate_stats(state: DensifyState, viewspace_grad: jax.Array,
                     visible: jax.Array, radii: jax.Array,
                     viewspace_absgrad: jax.Array | None = None
                     ) -> DensifyState:
    """add_densification_stats analog (street_gaussian_model.py:504-518):
    accumulate ||dL/d means2d|| (and the absgrad norm when provided) for
    visible gaussians and track max screen radius. Gradients arrive already
    scaled by 0.5*[W, H] (the reference's gsplat pixel-unit -> NDC-threshold
    conversion, street_gaussian_model.py:508)."""
    norm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    vis = visible.astype(jnp.float32)
    abs_accum = state.grad_abs_accum
    if viewspace_absgrad is not None:
        abs_accum = abs_accum + jnp.linalg.norm(
            viewspace_absgrad[:, :2], axis=-1) * vis
    return DensifyState(
        grad_accum=state.grad_accum + norm * vis,
        grad_abs_accum=abs_accum,
        denom=state.denom + vis,
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(visible, radii, 0.0)),
    )


def sky_extent(pool: GaussianPool, sphere_radius: jax.Array,
               percent_dense: float = 0.01) -> jax.Array:
    """Sky pool's own densification extent (gaussian_model_sky.py:48-60):
    the sphere radius clamped between the 10%-smallest and 10%-largest
    max-scaling quantiles divided by percent_dense. Invalid slots are
    excluded via +/-inf masking at fixed capacity."""
    scale_max = jnp.max(jnp.minimum(pool.get_scaling(), sphere_radius),
                        axis=-1)
    n_valid = jnp.sum(pool.valid)
    k = jnp.maximum((n_valid / 10).astype(jnp.int32), 1)
    asc = jnp.sort(jnp.where(pool.valid, scale_max, jnp.inf))
    low = asc[jnp.maximum(k - 1, 0)] / percent_dense
    up = asc[jnp.maximum(n_valid - k, 0)] / percent_dense
    return jnp.clip(sphere_radius, low, up)


class DensifyInfo(NamedTuple):
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    n_valid: jax.Array


def densify_and_prune(
    pool: GaussianPool,
    adam: GaussianAdamState,
    state: DensifyState,
    key: jax.Array,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    min_opacity: float = 0.005,
    prune_big_points: bool = False,
    percent_big_ws: float = 0.1,
    max_screen_size: float = 0.0,
    bbox: jax.Array | None = None,   # [3] (l, w, h): prune outside (actors,
    # gaussian_model_actor.py:201-272, canonical-frame box test)
    pin_sphere: tuple[jax.Array, jax.Array] | None = None,  # (center [3],
    # radius): sky specialization (gaussian_model_sky.py:62-76) — split
    # children sample around the PINNED positions and scales are clamped at
    # the sphere radius for the clone/split/big-point tests
    extra: dict[str, jax.Array] | None = None,  # per-Gaussian sidecar
    # columns ([cap, ...], e.g. the semantic logits of gaussian_model.py:45)
    # that must follow the same clone/split/prune surgery; children copy the
    # parent's value (the reference cats _semantic alongside features in
    # densification_postfix)
    use_abs: bool | jax.Array = True,  # densify on the absgrad column
    # (gsplat-default behavior; gaussian_model_bkgd.py:102-105 — note the
    # reference's densify_grad_abs_* flag TRUE selects column 1, the SIGNED
    # norm, so use_abs = not densify_grad_abs_*). May be a traced bool
    # (per-actor under vmap: random-init actors always use abs,
    # gaussian_model_actor.py:201-210).
) -> tuple[GaussianPool, GaussianAdamState, DensifyState, DensifyInfo]:
    cap = pool.capacity
    accum = jnp.where(use_abs, state.grad_abs_accum, state.grad_accum)
    grads = accum / jnp.maximum(state.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scales_act = pool.get_scaling()
    base_xyz = pool.xyz
    if pin_sphere is not None:
        center, radius = pin_sphere
        rel = base_xyz - center
        dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
        ratio = dist / (2.0 * radius)
        base_xyz = jnp.where(ratio < 1.0,
                             center + rel / jnp.maximum(ratio, 1e-12),
                             base_xyz)
        scales_act = jnp.minimum(scales_act, radius)
    scale_max = jnp.max(scales_act, axis=-1)
    hot = pool.valid & (grads >= grad_threshold)
    clone_mask = hot & (scale_max <= percent_dense * extent)
    split_mask = hot & (scale_max > percent_dense * extent)

    # -- allocate children into free slots -----------------------------------
    child_count = clone_mask.astype(jnp.int32) + 2 * split_mask.astype(jnp.int32)
    offsets = jnp.cumsum(child_count) - child_count          # exclusive
    n_free = cap - jnp.sum(pool.valid)
    fits = (offsets + child_count) <= n_free
    child_count = jnp.where(fits, child_count, 0)

    # free slots in ascending index order (invalid first, stable)
    free_list = jnp.argsort(pool.valid.astype(jnp.int32), stable=True)

    rotmats = Q.to_matrix(pool.get_rotation())
    scales = scales_act  # clamped for sky pools; == get_scaling() otherwise
    k1, k2 = jax.random.split(key)
    noise = (jax.random.normal(k1, (2, cap, 3)) * scales[None])
    split_xyz = base_xyz[None] + jnp.einsum("nij,snj->sni", rotmats, noise)
    split_scaling = jnp.log(jnp.maximum(scales / 1.6, 1e-12))

    new_pool = pool
    new_valid = pool.valid & ~(split_mask & fits)   # split parents removed
    slot_reset = jnp.zeros((cap,), bool)

    arrays = {
        "xyz": pool.xyz, "features_dc": pool.features_dc,
        "features_rest": pool.features_rest, "scaling": pool.scaling,
        "rotation": pool.rotation, "opacity": pool.opacity,
    }
    if extra:
        for name, arr in extra.items():
            assert name not in arrays and arr.shape[0] == cap, name
            arrays[name] = arr
    updated = {k: v for k, v in arrays.items()}

    for j in range(2):
        write = child_count > j                                # [cap] parents
        dest = free_list[jnp.minimum(offsets + j, cap - 1)]
        dest = jnp.where(write, dest, cap)                     # gated -> pad row
        for name, src in arrays.items():
            if name == "xyz":
                val = jnp.where(split_mask[:, None], split_xyz[j], src)
            elif name == "scaling":
                val = jnp.where(split_mask[:, None], split_scaling, src)
            else:
                val = src
            padded = jnp.concatenate(
                [updated[name], jnp.zeros((1,) + src.shape[1:], src.dtype)], 0)
            updated[name] = padded.at[dest].set(val)[:cap]
        pad_valid = jnp.concatenate([new_valid, jnp.zeros((1,), bool)])
        new_valid = pad_valid.at[dest].set(write | pad_valid[dest])[:cap]
        pad_reset = jnp.concatenate([slot_reset, jnp.zeros((1,), bool)])
        slot_reset = pad_reset.at[dest].set(write | pad_reset[dest])[:cap]

    # -- prune ---------------------------------------------------------------
    opa = jax.nn.sigmoid(updated["opacity"])[:, 0]
    prune = new_valid & (opa < min_opacity)
    if prune_big_points:
        scale_new = jnp.exp(updated["scaling"])
        if pin_sphere is not None:
            scale_new = jnp.minimum(scale_new, pin_sphere[1])
        scale_max_new = jnp.max(scale_new, axis=-1)
        prune |= new_valid & (scale_max_new > extent * percent_big_ws)
        if max_screen_size > 0:
            prune |= new_valid & (state.max_radii2d > max_screen_size) & ~slot_reset
    if bbox is not None:
        outside = jnp.any(jnp.abs(updated["xyz"]) > bbox[None] / 2.0, axis=-1)
        prune |= new_valid & outside
    new_valid &= ~prune

    new_pool = GaussianPool(
        xyz=updated["xyz"], features_dc=updated["features_dc"],
        features_rest=updated["features_rest"], scaling=updated["scaling"],
        rotation=updated["rotation"], opacity=updated["opacity"],
        valid=new_valid)

    # Adam surgery: zero moments at freshly (re)written slots
    new_adam = zero_moments_at(adam, slot_reset)

    info = DensifyInfo(
        n_cloned=jnp.sum(clone_mask & fits),
        n_split=jnp.sum(split_mask & fits),
        n_pruned=jnp.sum(prune),
        n_valid=jnp.sum(new_valid))
    if extra:
        new_extra = {k: updated[k] for k in extra}
        return new_pool, new_adam, init_densify_state(cap), info, new_extra
    return new_pool, new_adam, init_densify_state(cap), info


def reset_opacity(pool: GaussianPool, adam: GaussianAdamState,
                  value: float = 0.01) -> tuple[GaussianPool, GaussianAdamState]:
    """Opacity clamp-down every opacity_reset_interval
    (gaussian_model.py:410-415) + moment reset for the opacity group."""
    logit = jnp.log(value / (1.0 - value))
    new_op = jnp.minimum(pool.opacity, logit)
    adam = zero_moments_at(adam, jnp.ones((pool.capacity,), bool),
                           keys=("opacity",))
    return pool.replace(opacity=new_op), adam
