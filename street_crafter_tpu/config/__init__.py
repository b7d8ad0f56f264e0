from .config import Config, load_config, merge_dotlist, to_dict, save_config
from .registry import register, build, get_class, REGISTRY
from .defaults import default_config

__all__ = [
    "Config", "load_config", "merge_dotlist", "to_dict", "save_config",
    "register", "build", "get_class", "REGISTRY", "default_config",
]
