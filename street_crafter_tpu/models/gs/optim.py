"""Per-group Adam for Gaussian pools.

The reference attaches one torch.optim.Adam per sub-model with per-group LRs
and performs *state surgery* on densify/prune (cat zeros / index the moments,
gaussian_model.py:287-408). With fixed-capacity pools the moments are
fixed-shape arrays too; "surgery" reduces to zeroing moment rows at slots
that were (re)allocated. eps matches the 3DGS family (1e-15).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianAdamState:
    m: dict[str, jax.Array]
    v: dict[str, jax.Array]
    count: jax.Array  # scalar int32


def init_adam(params: Mapping[str, jax.Array]) -> GaussianAdamState:
    zeros = {k: jnp.zeros_like(p) for k, p in params.items()}
    return GaussianAdamState(
        m=dict(zeros), v={k: jnp.zeros_like(p) for k, p in params.items()},
        count=jnp.zeros((), jnp.int32))


def adam_update(
    params: Mapping[str, jax.Array],
    grads: Mapping[str, jax.Array],
    state: GaussianAdamState,
    lrs: Mapping[str, jax.Array],
    update_mask: jax.Array | None = None,  # [cap] rows allowed to update
) -> tuple[dict[str, jax.Array], GaussianAdamState]:
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1 ** c
    bc2 = 1.0 - ADAM_B2 ** c
    new_params, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        gate = None
        if update_mask is not None:
            gate = update_mask.reshape(
                update_mask.shape + (1,) * (g.ndim - update_mask.ndim))
            g = jnp.where(gate, g, 0.0)
        m = ADAM_B1 * state.m[k] + (1 - ADAM_B1) * g
        v = ADAM_B2 * state.v[k] + (1 - ADAM_B2) * g * g
        step = lrs[k] * (m / bc1) / (jnp.sqrt(v / bc2) + ADAM_EPS)
        if gate is not None:
            step = jnp.where(gate, step, 0.0)
        new_params[k] = p - step
        new_m[k] = m
        new_v[k] = v
    return new_params, GaussianAdamState(m=new_m, v=new_v, count=count)


def zero_moments_at(state: GaussianAdamState, slot_mask: jax.Array,
                    keys: tuple[str, ...] | None = None) -> GaussianAdamState:
    """Zero first/second moments for slots in ``slot_mask`` (surgery analog)."""
    def z(d):
        out = {}
        for k, val in d.items():
            if keys is not None and k not in keys:
                out[k] = val
                continue
            gate = slot_mask.reshape(
                slot_mask.shape + (1,) * (val.ndim - slot_mask.ndim))
            out[k] = jnp.where(gate, 0.0, val)
        return out
    return dataclasses.replace(state, m=z(state.m), v=z(state.v))
