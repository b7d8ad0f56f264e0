"""Video-diffusion fine-tune loop: data parallel + sharded optimizer state.

TPU-native replacement of the reference's Lightning DDP / DeepSpeed ZeRO-2
harness (video_diffusion/train.py:745-758, waymo_high_res_mix.yaml:250):

- params replicated over the ``data`` mesh axis; gradients mean-reduced by
  XLA from the batch sharding (DDP analog);
- Adam moments sharded over ``data`` along each leaf's largest divisible
  dimension (ZeRO-2 analog) via ShardingRules.opt_state_spec;
- gradient accumulation, global-norm clipping (0.3 in the reference config),
  EMA of the UNet parameters;
- selective trainable sets (the reference fine-tunes the UNet only; VAE/CLIP
  stay frozen — diffusion_condition.py:298-355 param groups).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.vdm.conditioner import Conditioning
from ..parallel.kernel_shard import kernel_sharding
from ..models.vdm.engine import VideoDiffusionEngine
from ..models.vdm.loss import diffusion_loss
from ..parallel.sharding import ShardingRules


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VDMTrainState:
    unet_params: Any
    frozen_params: Any          # {"vae": ..., "clip": ...}
    opt_state: Any
    ema_params: Any
    step: jax.Array


def is_temporal_param(path: tuple) -> bool:
    """Reference param-group predicate: torch names containing 'time_stack'
    (diffusion_condition.py:298-320). That substring matches the
    VideoResBlock temporal stack, the temporal transformer blocks AND
    cond_time_stack_embed (whose torch name contains 'time_stack' — the
    StreetCrafter embed is thus ALSO slowed/frozen under
    slow_temporal_layers). Our flax tree names the temporal transformer
    blocks 'time_block_<d>'; everything else matches by the same substring.
    """
    for k in path:
        name = getattr(k, "key", str(k))
        if "time_stack" in name or name.startswith("time_block"):
            return True
    return False


def is_peft_param(path: tuple) -> bool:
    """train_peft_adapters group: 'adapter' + 'cond_time_stack_embed'
    (diffusion_condition.py:321-329). All other params are excluded from the
    optimizer (frozen)."""
    for k in path:
        name = getattr(k, "key", str(k))
        if "adapter" in name or "cond_time_stack_embed" in name:
            return True
    return False


def param_group_labels(unet_params: Any,
                       slow_spatial_layers: bool = False,
                       slow_temporal_layers: bool = False,
                       train_peft_adapters: bool = False) -> Any:
    """Label pytree for optax.multi_transform: 'base' trains at the base lr,
    'slow' at lr x scale (scale 0 == frozen), 'frozen' is excluded."""
    def label(path, _):
        if slow_spatial_layers:
            return "base" if is_temporal_param(path) else "slow"
        if slow_temporal_layers:
            return "slow" if is_temporal_param(path) else "base"
        if train_peft_adapters:
            return "base" if is_peft_param(path) else "frozen"
        return "base"

    return jax.tree_util.tree_map_with_path(label, unet_params)


def make_optimizer(lr: float = 1e-5, grad_clip: float = 0.3,
                   weight_decay: float = 0.0,
                   labels: Any | None = None,
                   slow_scale: float = 1.0,
                   schedule: Any | None = None
                   ) -> optax.GradientTransformation:
    """Global-norm clip (Lightning gradient_clip_val analog: one norm over
    ALL params) then per-group Adam via multi_transform. With
    slow_scale=0 the 'slow' group's moments still update but params are
    bit-identical (torch lr=0 param-group semantics). ``schedule`` is an
    optional step->multiplier callable composed onto every group's lr (the
    LambdaLR analog, diffusion_condition.py:343-353;
    models/vdm/lr_schedule.py)."""
    def adam(alr):
        rate = alr if schedule is None else (
            lambda step, _a=alr: _a * schedule(step))
        if weight_decay > 0:
            return optax.adamw(rate, b1=0.9, b2=0.999,
                               weight_decay=weight_decay)
        return optax.adam(rate, b1=0.9, b2=0.999)

    if labels is None:
        inner = adam(lr)
    else:
        # labels may be a pytree or a callable(params) -> labels
        inner = optax.multi_transform(
            {"base": adam(lr), "slow": adam(lr * slow_scale),
             "frozen": optax.set_to_zero()},
            labels)
    return optax.chain(optax.clip_by_global_norm(grad_clip), inner)


def optimizer_from_groups(lr: float, grad_clip: float,
                          groups: dict | None,
                          schedule: Any | None = None
                          ) -> optax.GradientTransformation:
    """Build the fine-tune optimizer from the reference's param-group flags
    (slow_spatial_layers / slow_temporal_layers / train_peft_adapters +
    scales, waymo_high_res_mix.yaml:12-16) and an optional LR-multiplier
    schedule (scheduler_config analog, :163-170)."""
    groups = groups or {}
    ss = bool(groups.get("slow_spatial_layers", False))
    st = bool(groups.get("slow_temporal_layers", False))
    pa = bool(groups.get("train_peft_adapters", False))
    if not (ss or st or pa):
        return make_optimizer(lr, grad_clip, schedule=schedule)
    scale = (float(groups.get("slow_spatial_layers_scale", 0.1)) if ss
             else float(groups.get("slow_temporal_layers_scale", 0.0)))

    def labels(params):
        return param_group_labels(params, slow_spatial_layers=ss,
                                  slow_temporal_layers=st,
                                  train_peft_adapters=pa)

    return make_optimizer(lr, grad_clip, labels=labels, slow_scale=scale,
                          schedule=schedule)


def init_vdm_train_state(engine: VideoDiffusionEngine, params: dict,
                         lr: float = 1e-5, grad_clip: float = 0.3,
                         param_groups: dict | None = None,
                         schedule=None) -> VDMTrainState:
    tx = optimizer_from_groups(lr, grad_clip, param_groups, schedule)
    unet_params = params["unet"]
    return VDMTrainState(
        unet_params=unet_params,
        frozen_params={"vae": params["vae"], "clip": params["clip"]},
        opt_state=tx.init(unet_params),
        ema_params=unet_params,
        step=jnp.zeros((), jnp.int32))


def make_vdm_train_step(
    engine: VideoDiffusionEngine,
    lr: float = 1e-5,
    grad_clip: float = 0.3,
    ema_decay: float = 0.9999,
    guidance_dropout: float = 0.15,
    rules: ShardingRules | None = None,
    accum_steps: int = 1,
    param_groups: dict | None = None,
    schedule=None,
) -> Callable:
    """Build the jitted fine-tune step.

    ``batch``: {"latents": [B*T, h, w, 4], "cond": Conditioning,
    "guidance_latents": [B*T, h, w, 4]} — first-stage encoding happens in the
    input pipeline (frozen VAE), mirroring shared_step
    (diffusion_condition.py:237-247).
    """
    tx = optimizer_from_groups(lr, grad_clip, param_groups, schedule)
    T = engine.cfg.num_frames
    # Pallas-kernel SPMD bridge (parallel/kernel_shard.py): the clip axis
    # rides into the kernels' shard_map via vmap(spmd_axis_name=...), the
    # frames axis (sequence parallelism) via the kernel_sharding context.
    kmesh = rules.mesh if rules is not None else None
    kaxes = (rules.frames_axis,) if rules is not None else ()
    spmd_name = rules.data_axis if rules is not None else None

    def train_step(state: VDMTrainState, batch: dict, key: jax.Array):
        """``batch`` leaves are per-clip batched: latents [B, T, h, w, 4],
        cond leaves [B, T, ...], guidance_latents [B, T, h, w, 4]. The per-
        clip loss is vmapped over B so no op ever reshapes across the
        (sharded) clip axis."""
        k_drop, k_loss = jax.random.split(key)
        bs = batch["latents"].shape[0]
        # guidance ucg dropout 0.15 per clip (diffusion_condition.py:167-176)
        keep = jax.random.bernoulli(k_drop, 1.0 - guidance_dropout, (bs,))
        gscale = keep.astype(jnp.float32)[:, None] * jnp.ones((bs, T))
        clip_keys = jax.random.split(k_loss, bs)
        if rules is not None:
            # vmap requires every mapped input sharded alike on the clip axis
            sh = NamedSharding(rules.mesh, P(rules.data_axis))
            gscale = jax.lax.with_sharding_constraint(gscale, sh)
            clip_keys = jax.lax.with_sharding_constraint(clip_keys, sh)
            # frame-axis (sequence) sharding: annotate the clip-frame dim of
            # every [B, T, ...] leaf with the ``frames`` mesh axis. The UNet's
            # spatial path runs frame-local (the (b t) dim stays sharded);
            # at the temporal-attention reshape (b t) s c -> (b s) t c XLA
            # inserts the Ulysses-style all-to-all automatically. This is
            # the TPU design's own parallelism (SURVEY §2.3) — the reference
            # has no SP; >data-parallel meshes are no longer capped by clip
            # count at batch 1/device.
            if rules.mesh.shape.get(rules.frames_axis, 1) > 1:
                mesh = rules.mesh

                def seq_constrain(x):
                    if hasattr(x, "ndim") and x.ndim >= 2 \
                            and x.shape[:2] == (bs, T):
                        spec = P(rules.data_axis, rules.frames_axis,
                                 *([None] * (x.ndim - 2)))
                        return jax.lax.with_sharding_constraint(
                            x, NamedSharding(mesh, spec))
                    return x

                batch = jax.tree_util.tree_map(seq_constrain, batch)

        def loss_fn(unet_params):
            params = {"unet": unet_params, **state.frozen_params}

            def per_clip(lat, cond_c, guide, k, gs):
                dfn = engine.training_denoise_fn(params, cond_c, guide, gs)
                return diffusion_loss(
                    dfn, k, lat, num_frames=T,
                    offset_noise_level=0.02, use_additional_loss=True)

            losses, scalars = jax.vmap(per_clip, spmd_axis_name=spmd_name)(
                batch["latents"], batch["cond"], batch["guidance_latents"],
                clip_keys, gscale)
            return losses.mean(), jax.tree_util.tree_map(
                lambda s: s.mean(), scalars)

        if accum_steps > 1:
            # gradient accumulation (Lightning accumulate_grad_batches,
            # video_diffusion/train.py:860-866): micro-batch the clip axis
            # with a rematerialized scan, mean the gradients
            def micro(carry, mb):
                g_acc, s_acc = carry
                (l, s), g = jax.value_and_grad(
                    lambda p: _loss_on(p, mb), has_aux=True)(
                    state.unet_params)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                s_acc = jax.tree_util.tree_map(jnp.add, s_acc, s)
                return (g_acc, s_acc), None

            def _loss_on(unet_params, mb):
                params = {"unet": unet_params, **state.frozen_params}

                def per_clip(lat, cond_c, guide, k, gs):
                    dfn = engine.training_denoise_fn(params, cond_c, guide,
                                                     gs)
                    return diffusion_loss(
                        dfn, k, lat, num_frames=T,
                        offset_noise_level=0.02, use_additional_loss=True)

                losses, scalars_ = jax.vmap(
                    per_clip, spmd_axis_name=spmd_name)(
                    mb["latents"], mb["cond"], mb["guidance_latents"],
                    mb["keys"], mb["gscale"])
                return losses.mean(), jax.tree_util.tree_map(
                    lambda s: s.mean(), scalars_)

            full = dict(batch)
            full["keys"] = clip_keys
            full["gscale"] = gscale
            micro_batches = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]), full)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like,
                                            state.unet_params)
            sample_scalars = jax.eval_shape(
                lambda: _loss_on(state.unet_params,
                                 jax.tree_util.tree_map(lambda x: x[0],
                                                        micro_batches))[1])
            zero_s = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), sample_scalars)
            with kernel_sharding(kmesh, kaxes):
                (grads, scalars), _ = jax.lax.scan(
                    jax.checkpoint(micro), (zero_g, zero_s), micro_batches)
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            scalars = jax.tree_util.tree_map(lambda s: s / accum_steps,
                                             scalars)
        else:
            with kernel_sharding(kmesh, kaxes):
                (loss, scalars), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.unet_params)
        if rules is not None and rules.fsdp_params:
            # reduce-scatter the gradients straight into the FSDP layout —
            # without this the full grad tree materializes replicated
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.with_sharding_constraint(
                    g, rules.param_spec(
                        jax.ShapeDtypeStruct(g.shape, g.dtype))),
                grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.unet_params)
        new_params = optax.apply_updates(state.unet_params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: ema_decay * e + (1 - ema_decay) * p,
            state.ema_params, new_params)
        if rules is not None:
            # pin params/EMA to the configured layout: replicated (DDP) or
            # largest-dim sharded (FSDP); the compiler would otherwise be
            # free to leave them sharded like the moments (or vice versa)
            def pin(x):
                sh = rules.param_spec(
                    jax.ShapeDtypeStruct(x.shape, x.dtype))
                return jax.lax.with_sharding_constraint(x, sh)

            new_params = jax.tree_util.tree_map(pin, new_params)
            new_ema = jax.tree_util.tree_map(pin, new_ema)
        new_state = VDMTrainState(
            unet_params=new_params, frozen_params=state.frozen_params,
            opt_state=new_opt, ema_params=new_ema, step=state.step + 1)
        return new_state, scalars

    # no buffer donation: ema_params aliases unet_params at init (same
    # buffers), which trips XLA's double-donation check
    return jax.jit(train_step)


def shard_vdm_train_state(state: VDMTrainState,
                          rules: ShardingRules) -> VDMTrainState:
    """Place params per ``rules.param_spec`` (replicated for DDP, largest-
    dim sharded for FSDP) and optimizer moments ZeRO-style sharded."""
    rep = rules.params()

    def put_param(t):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, rules.param_spec(jax.ShapeDtypeStruct(x.shape, x.dtype))),
            t)

    def put_opt(t):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, rules.opt_state_spec(jax.ShapeDtypeStruct(x.shape, x.dtype))),
            t)

    return VDMTrainState(
        unet_params=put_param(state.unet_params),
        frozen_params=put_param(state.frozen_params),
        opt_state=put_opt(state.opt_state),
        ema_params=put_param(state.ema_params),
        step=jax.device_put(state.step, rep))


def shard_batch_for_mesh(batch: dict, rules: ShardingRules, num_frames: int
                         ) -> dict:
    """Shard the clip axis over ``data`` and (when the mesh has one) the
    frame axis over ``frames``: [B, T, ...] leaves land as P(data, frames);
    other leading-divisible leaves as P(data)."""
    mesh = rules.mesh
    data = rules.data_axis
    frames = mesh.shape.get(rules.frames_axis, 1)

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return jax.device_put(x, NamedSharding(mesh, P()))
        if (frames > 1 and x.ndim >= 2 and x.shape[1] == num_frames
                and x.shape[0] % mesh.shape[data] == 0):
            spec = P(data, rules.frames_axis, *([None] * (x.ndim - 2)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        if x.shape[0] % mesh.shape[data] == 0:
            return jax.device_put(x, NamedSharding(mesh, P(data)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
