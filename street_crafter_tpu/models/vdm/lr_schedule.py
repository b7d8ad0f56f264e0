"""Fine-tune LR multiplier schedules.

vwm/lr_scheduler.py analogs as jittable optax schedules (step -> base-lr
multiplier, to be composed with the base lr). The reference wires
``LambdaLinearScheduler`` into the conditioned fine-tune
(waymo_high_res_mix.yaml:163-170, diffusion_condition.py:343-353 via
torch LambdaLR); its StreetCrafter config degenerates to a constant
multiplier (warm_up 0, f_min = f_max = 1) but the cycle machinery is part
of the recipe surface.

All schedules support repeated cycles via ``cycle_lengths`` (cumulative
interval lookup = ``searchsorted`` — static-shape, scan-safe inside jit).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _cycle_arrays(warm_up_steps, f_start, f_max, f_min, cycle_lengths):
    n = len(cycle_lengths)
    assert len(warm_up_steps) == len(f_start) == len(f_max) == len(f_min) == n
    return (np.asarray(warm_up_steps, np.float64),
            np.asarray(f_start, np.float64), np.asarray(f_max, np.float64),
            np.asarray(f_min, np.float64),
            np.asarray(cycle_lengths, np.float64),
            np.concatenate([[0.0], np.cumsum(cycle_lengths)]))


def _warmup(n, cyc, wu, f_start, f_max):
    """Per-cycle linear warmup f_start -> f_max over warm_up_steps
    (lr_scheduler.py:69-70,90-91)."""
    return (f_max[cyc] - f_start[cyc]) / jnp.maximum(wu[cyc], 1.0) * n \
        + f_start[cyc]


def lambda_linear_schedule(
    warm_up_steps: Sequence[float] = (0,),
    f_start: Sequence[float] = (1e-6,),
    f_max: Sequence[float] = (1.0,),
    f_min: Sequence[float] = (1.0,),
    cycle_lengths: Sequence[float] = (10_000_000_000_000,),
) -> Schedule:
    """LambdaLinearScheduler (lr_scheduler.py:82-96): linear warmup then
    linear decay f_max -> f_min across the cycle. Defaults = the
    StreetCrafter fine-tune config."""
    wu, fs, fx, fm, cl, cum = _cycle_arrays(warm_up_steps, f_start, f_max,
                                            f_min, cycle_lengths)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cyc = jnp.clip(jnp.searchsorted(jnp.asarray(cum[1:], jnp.float32),
                                        s, side="left"), 0, len(cl) - 1)
        n = s - jnp.asarray(cum)[cyc]
        warm = _warmup(n, cyc, jnp.asarray(wu), jnp.asarray(fs),
                       jnp.asarray(fx))
        lin = jnp.asarray(fm)[cyc] + (jnp.asarray(fx)[cyc]
                                      - jnp.asarray(fm)[cyc]) \
            * (jnp.asarray(cl)[cyc] - n) / jnp.asarray(cl)[cyc]
        return jnp.where(n < jnp.asarray(wu)[cyc], warm, lin).astype(
            jnp.float32)

    return schedule


def lambda_warmup_cosine_schedule(
    warm_up_steps: Sequence[float],
    f_start: Sequence[float],
    f_max: Sequence[float],
    f_min: Sequence[float],
    cycle_lengths: Sequence[float],
) -> Schedule:
    """LambdaWarmUpCosineScheduler2 (lr_scheduler.py:36-79): linear warmup
    then half-cosine decay f_max -> f_min across each cycle."""
    wu, fs, fx, fm, cl, cum = _cycle_arrays(warm_up_steps, f_start, f_max,
                                            f_min, cycle_lengths)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        cyc = jnp.clip(jnp.searchsorted(jnp.asarray(cum[1:],
                                                    jnp.float32), s,
                                        side="left"), 0, len(cl) - 1)
        n = s - jnp.asarray(cum, jnp.float32)[cyc]
        warm = _warmup(n, cyc, jnp.asarray(wu), jnp.asarray(fs),
                       jnp.asarray(fx))
        t = jnp.minimum((n - jnp.asarray(wu)[cyc])
                        / jnp.maximum(jnp.asarray(cl)[cyc]
                                      - jnp.asarray(wu)[cyc], 1.0), 1.0)
        cos = jnp.asarray(fm)[cyc] + 0.5 * (jnp.asarray(fx)[cyc]
                                            - jnp.asarray(fm)[cyc]) \
            * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < jnp.asarray(wu)[cyc], warm, cos).astype(
            jnp.float32)

    return schedule


def schedule_from_config(node) -> Schedule | None:
    """Build a multiplier schedule from the ``vdm_train.scheduler`` config
    node ({"type": "lambda_linear" | "warmup_cosine" | "", ...params}); None
    (constant 1) when unset — matching a reference run with
    scheduler_config absent (diffusion_condition.py:343: plain optimizer)."""
    if node is None:
        return None
    kind = str(node.get("type", "") or "")
    if not kind:
        return None
    kw = {k: list(node[k]) for k in ("warm_up_steps", "f_start", "f_max",
                                     "f_min", "cycle_lengths") if k in node}
    if kind == "lambda_linear":
        return lambda_linear_schedule(**kw)
    if kind == "warmup_cosine":
        return lambda_warmup_cosine_schedule(**kw)
    raise ValueError(f"unknown scheduler type {kind!r}")
