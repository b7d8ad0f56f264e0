"""LR-multiplier schedules (models/vdm/lr_schedule.py) vs the reference
formulas (vwm/lr_scheduler.py), plus optimizer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.lr_schedule import (
    lambda_linear_schedule, lambda_warmup_cosine_schedule,
    schedule_from_config)


def _ref_linear(n, wu, fs, fx, fm, cl):
    """Direct port of LambdaLinearScheduler.schedule (lr_scheduler.py:82-96)
    for a cycle list."""
    cum = np.cumsum([0] + list(cl))
    cyc = 0
    for i, c in enumerate(cum[1:]):
        if n <= c:
            cyc = i
            break
    else:
        cyc = len(cl) - 1
    n = n - cum[cyc]
    if n < wu[cyc]:
        return (fx[cyc] - fs[cyc]) / wu[cyc] * n + fs[cyc]
    return fm[cyc] + (fx[cyc] - fm[cyc]) * (cl[cyc] - n) / cl[cyc]


def test_lambda_linear_matches_reference():
    wu, fs, fx, fm, cl = [100, 50], [1e-6, 0.5], [1.0, 0.8], [0.1, 0.2], \
        [1000, 2000]
    sched = lambda_linear_schedule(wu, fs, fx, fm, cl)
    for n in [0, 1, 50, 99, 100, 500, 999, 1001, 1049, 1500, 2500, 2999]:
        got = float(sched(jnp.asarray(n)))
        want = _ref_linear(n, wu, fs, fx, fm, cl)
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), n


def test_streetcrafter_config_is_constant():
    """waymo_high_res_mix.yaml:163-170: warm_up 0, f_min=f_max=1 -> 1."""
    sched = lambda_linear_schedule()
    for n in [0, 1, 1000, 100000]:
        assert float(sched(jnp.asarray(n))) == pytest.approx(1.0, abs=1e-6)


def test_warmup_cosine():
    sched = lambda_warmup_cosine_schedule([10], [0.0], [1.0], [0.0], [110])
    assert float(sched(jnp.asarray(0))) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(jnp.asarray(5))) == pytest.approx(0.5, abs=1e-5)
    # halfway through decay: cos(pi/2) -> (fmax+fmin)/2
    assert float(sched(jnp.asarray(60))) == pytest.approx(0.5, abs=1e-5)
    assert float(sched(jnp.asarray(110))) == pytest.approx(0.0, abs=1e-6)


def test_schedule_from_config():
    assert schedule_from_config(None) is None
    assert schedule_from_config({"type": ""}) is None
    s = schedule_from_config({"type": "lambda_linear",
                              "warm_up_steps": [2], "f_start": [0.0],
                              "f_max": [1.0], "f_min": [1.0],
                              "cycle_lengths": [100]})
    assert float(s(jnp.asarray(1))) == pytest.approx(0.5)
    with pytest.raises(ValueError):
        schedule_from_config({"type": "bogus"})


def test_optimizer_uses_schedule():
    """Warmup multiplier 0 at step 0 -> first update is a no-op; later
    steps move params (schedule is threaded into every group's adam)."""
    from street_crafter_tpu.training.vdm_trainer import make_optimizer
    import optax
    sched = lambda_linear_schedule([2], [0.0], [1.0], [1.0], [1000])
    tx = make_optimizer(lr=0.1, schedule=sched)
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    st = tx.init(params)
    up0, st = tx.update(grads, st, params)
    assert float(jnp.abs(up0["w"]).max()) == pytest.approx(0.0, abs=1e-12)
    up1, st = tx.update(grads, st, params)
    assert float(jnp.abs(up1["w"]).max()) > 1e-3
