import os

import pytest

from street_crafter_tpu.config import (
    Config, default_config, load_config, merge_dotlist, register, build, to_dict,
)


def test_attribute_access_and_merge():
    cfg = Config({"a": 1, "b": {"c": 2}})
    assert cfg.a == 1
    assert cfg.b.c == 2
    cfg.merge({"b": {"d": 3}, "e": [1, 2]})
    assert cfg.b.c == 2 and cfg.b.d == 3 and cfg.e == [1, 2]


def test_freeze():
    cfg = Config({"a": {"b": 1}})
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.a.b = 2
    cfg.freeze(False)
    cfg.a.b = 2
    assert cfg.a.b == 2


def test_dotlist_overrides():
    cfg = default_config()
    merge_dotlist(cfg, ["optim.lambda_l1=0.5", "train.iterations=100",
                        "data.white_background=true"])
    assert cfg.optim.lambda_l1 == 0.5
    assert cfg.train.iterations == 100
    assert cfg.data.white_background is True
    # yacs opts-pair style
    merge_dotlist(cfg, ["render.fps", "24"])
    assert cfg.render.fps == 24


def test_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text("a: 1\nb:\n  c: 2\n  d: 3\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"parent_config: {os.path.basename(parent)}\nb:\n  c: 9\n")
    cfg = load_config(child, overrides=["b.d=7"])
    assert cfg.a == 1 and cfg.b.c == 9 and cfg.b.d == 7


def test_registry_build():
    @register("test_dummy_component")
    class Dummy:
        def __init__(self, x, y=2):
            self.x, self.y = x, y

    obj = build({"target": "test_dummy_component", "params": {"x": 1}})
    assert obj.x == 1 and obj.y == 2


def test_roundtrip_dict():
    cfg = default_config()
    d = to_dict(cfg)
    assert isinstance(d, dict) and isinstance(d["optim"], dict)
