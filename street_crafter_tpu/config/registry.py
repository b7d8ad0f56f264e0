"""Class registry + config-driven instantiation.

Replaces the reference's reflection-based ``instantiate_from_config``
(vwm/util.py:154-173, which imports arbitrary dotted paths from YAML) with an
explicit registry: classes opt in via ``@register("name")`` and configs refer
to them by ``target: name`` + ``params: {...}``. Dotted import paths are still
accepted for flexibility.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Mapping

REGISTRY: dict[str, Any] = {}


def register(name: str) -> Callable[[Any], Any]:
    def deco(obj: Any) -> Any:
        if name in REGISTRY and REGISTRY[name] is not obj:
            raise KeyError(f"registry name collision: {name!r}")
        REGISTRY[name] = obj
        return obj
    return deco


def get_class(target: str) -> Any:
    if target in REGISTRY:
        return REGISTRY[target]
    if "." in target:
        module_name, _, attr = target.rpartition(".")
        module = importlib.import_module(module_name)
        return getattr(module, attr)
    raise KeyError(f"unknown registry target: {target!r}")


def build(spec: Mapping[str, Any], **extra_kwargs: Any) -> Any:
    """Instantiate ``spec['target']`` with ``spec.get('params', {})``."""
    if "target" not in spec:
        raise KeyError(f"config spec missing 'target': {dict(spec)!r}")
    cls = get_class(spec["target"])
    params = dict(spec.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)
