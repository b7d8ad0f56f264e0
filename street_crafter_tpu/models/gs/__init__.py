from .params import GaussianPool, init_pool_from_points
from .densify import DensifyState, init_densify_state, accumulate_stats, densify_and_prune, reset_opacity
from .optim import GaussianAdamState, init_adam, adam_update

__all__ = [
    "GaussianPool", "init_pool_from_points",
    "DensifyState", "init_densify_state", "accumulate_stats",
    "densify_and_prune", "reset_opacity",
    "GaussianAdamState", "init_adam", "adam_update",
]
