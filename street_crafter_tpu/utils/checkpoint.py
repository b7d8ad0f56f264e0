"""Orbax checkpointing.

Replaces the reference's torch.save state dicts (train.py:321-331,
street_gaussian_model.py:113-153: params + optimizer states + densification
stats in one file per iteration; loaded via searchForMaxIteration,
system_utils.py:28-30) and the Lightning/DeepSpeed ckpt machinery on the
diffusion side.
"""

from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def checkpoint_dir(model_path: str, iteration: int) -> str:
    return os.path.join(os.path.abspath(model_path), "checkpoints",
                        f"iteration_{iteration}")


def save_checkpoint(model_path: str, iteration: int, state) -> str:
    """Save a pytree (e.g. GSTrainState) under model_path/checkpoints."""
    path = checkpoint_dir(model_path, iteration)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def search_max_iteration(model_path: str) -> int | None:
    """searchForMaxIteration analog (system_utils.py:28-30)."""
    root = os.path.join(model_path, "checkpoints")
    if not os.path.isdir(root):
        return None
    iters = [int(m.group(1)) for name in os.listdir(root)
             if (m := re.fullmatch(r"iteration_(\d+)", name))]
    return max(iters) if iters else None


def load_checkpoint(model_path: str, target, iteration: int | None = None):
    """Restore into the structure of ``target`` (an abstract or concrete
    pytree with the same treedef). Returns (state, iteration) or
    (None, None) when no checkpoint exists."""
    if iteration is None:
        iteration = search_max_iteration(model_path)
        if iteration is None:
            return None, None
    path = checkpoint_dir(model_path, iteration)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path, abstract)
    return state, iteration
