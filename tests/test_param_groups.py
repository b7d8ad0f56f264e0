"""Fine-tune param-group recipe (diffusion_condition.py:298-355).

The StreetCrafter conditioned fine-tune sets slow_temporal_layers=True with
scale 0. (waymo_high_res_mix.yaml:12-16): every torch param whose name
contains 'time_stack' — temporal res stacks, temporal transformer blocks AND
cond_time_stack_embed — gets lr x 0, i.e. stays bit-identical while the
spatial weights train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_crafter_tpu.models.vdm.engine import (
    EngineConfig, VideoDiffusionEngine,
)
from street_crafter_tpu.training.vdm_trainer import (
    init_vdm_train_state, make_vdm_train_step, param_group_labels,
)
from tests.test_vdm_trainer import make_batch


def _paths_by_label(params, **flags):
    labels = param_group_labels(params, **flags)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    out = {}
    for path, lab in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        out.setdefault(lab, []).append(name)
    return out


@pytest.fixture(scope="module")
def engine_and_params():
    cfg = EngineConfig.tiny(num_frames=2)
    eng = VideoDiffusionEngine(cfg)
    params = eng.init_params(jax.random.PRNGKey(0), 32, 32)
    return eng, params


def test_labels_slow_temporal(engine_and_params):
    _, params = engine_and_params
    by = _paths_by_label(params["unet"], slow_temporal_layers=True)
    assert "slow" in by and "base" in by
    slow = by["slow"]
    # temporal res stacks, temporal transformer blocks, and the
    # cond_time_stack_embed are all in the slow group
    assert any("time_stack" in n and "cond" not in n for n in slow)
    assert any("time_block" in n for n in slow)
    assert any("cond_time_stack_embed" in n for n in slow)
    # spatial side stays base; AlphaBlender mixers are NOT 'time_stack'
    assert all("time_stack" not in n and "time_block" not in n
               for n in by["base"])
    assert any("time_mixer" in n for n in by["base"])
    assert any("time_pos_embed" in n for n in by["base"])


def test_labels_slow_spatial_inverts(engine_and_params):
    _, params = engine_and_params
    by = _paths_by_label(params["unet"], slow_spatial_layers=True)
    assert any("time_stack" in n for n in by["base"])
    assert all("time_stack" not in n and "time_block" not in n
               for n in by["slow"])


def test_labels_peft(engine_and_params):
    _, params = engine_and_params
    by = _paths_by_label(params["unet"], train_peft_adapters=True)
    assert all("cond_time_stack_embed" in n or "adapter" in n
               for n in by["base"])
    assert "slow" not in by
    assert len(by["frozen"]) > len(by["base"])


def test_frozen_temporal_layers_bit_identical(engine_and_params):
    """N steps with slow_temporal_layers_scale=0: temporal params unchanged
    bitwise, spatial params moved."""
    eng, params = engine_and_params
    groups = {"slow_temporal_layers": True, "slow_temporal_layers_scale": 0.0}
    state = init_vdm_train_state(eng, params, lr=1e-3, param_groups=groups)
    step = make_vdm_train_step(eng, lr=1e-3, param_groups=groups,
                               guidance_dropout=0.0)
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 2, 2, 32, 32)
    for i in range(3):
        state, scalars = step(state, batch, jax.random.PRNGKey(2 + i))
    assert np.isfinite(float(scalars["loss"]))

    labels = param_group_labels(params["unet"], slow_temporal_layers=True)
    flat_new = jax.tree_util.tree_flatten(state.unet_params)[0]
    flat_old = jax.tree_util.tree_flatten(params["unet"])[0]
    flat_lab = jax.tree_util.tree_flatten(labels)[0]
    n_frozen = n_moved = 0
    for old, new, lab in zip(flat_old, flat_new, flat_lab):
        if lab == "slow":
            assert (np.asarray(old) == np.asarray(new)).all()
            n_frozen += 1
        else:
            n_moved += int(not (np.asarray(old) == np.asarray(new)).all())
    assert n_frozen > 0
    assert n_moved > 0


def test_slow_scale_half_moves_less(engine_and_params):
    """A nonzero slow scale moves temporal params, but less than base lr
    would."""
    eng, params = engine_and_params
    batch = make_batch(eng, params, jax.random.PRNGKey(1), 2, 2, 32, 32)

    def run(groups):
        state = init_vdm_train_state(eng, params, lr=1e-3,
                                     param_groups=groups)
        step = make_vdm_train_step(eng, lr=1e-3, param_groups=groups,
                                   guidance_dropout=0.0)
        state, _ = step(state, batch, jax.random.PRNGKey(5))
        return state.unet_params

    p_half = run({"slow_temporal_layers": True,
                  "slow_temporal_layers_scale": 0.5})
    p_full = run(None)
    labels = param_group_labels(params["unet"], slow_temporal_layers=True)
    flat = zip(jax.tree_util.tree_flatten(params["unet"])[0],
               jax.tree_util.tree_flatten(p_half)[0],
               jax.tree_util.tree_flatten(p_full)[0],
               jax.tree_util.tree_flatten(labels)[0])
    for old, half, full, lab in flat:
        if lab != "slow":
            continue
        d_half = float(jnp.abs(half - old).sum())
        d_full = float(jnp.abs(full - old).sum())
        if d_full > 1e-7:
            assert 0 < d_half < d_full + 1e-12
