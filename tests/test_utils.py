import json
import pickle
import random

import numpy as np
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu.utils import (
    Config,
    Registry,
    build_from_cfg,
    dump,
    is_list_of,
    is_str,
    load,
    merge_dicts,
    obj_from_dict,
    random_scale,
    to_array,
)


class TestRegistry:
    def test_register_and_build(self):
        R = Registry("things")

        @R.register_module
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        assert "Foo" in R
        obj = R.build({"type": "Foo", "a": 1})
        assert (obj.a, obj.b) == (1, 2)
        obj = build_from_cfg({"type": "Foo", "a": 3, "b": 4}, R)
        assert (obj.a, obj.b) == (3, 4)

    def test_named_registration_and_defaults(self):
        R = Registry("things")

        @R.register_module(name="Alias")
        def make(x, y=0):
            return (x, y)

        assert R.build({"type": "Alias", "x": 1}, y=9) == (1, 9)
        assert R.build({"type": "Alias", "x": 1, "y": 2}, y=9) == (1, 2)

    def test_duplicate_rejected(self):
        R = Registry("things")
        R.register_module(name="A")(lambda: None)
        with pytest.raises(KeyError):
            R.register_module(name="A")(lambda: None)

    def test_unknown_type(self):
        R = Registry("things")
        with pytest.raises(KeyError):
            R.build({"type": "Nope"})
        with pytest.raises(TypeError):
            R.build({"no_type": 1})

    def test_callable_type(self):
        R = Registry("things")
        assert R.build({"type": dict, "a": 1}) == {"a": 1}


def test_obj_from_dict_module_namespace():
    import collections

    d = obj_from_dict({"type": "OrderedDict"}, collections)
    assert isinstance(d, collections.OrderedDict)
    c = obj_from_dict({"type": "Counter", "a": 2}, collections)
    assert c["a"] == 2


class TestFileHandlers:
    @pytest.mark.parametrize("ext", ["pkl", "json", "yaml"])
    def test_roundtrip(self, tmp_path, ext):
        obj = {"a": 1, "b": [1, 2, 3], "c": "x"}
        p = tmp_path / f"f.{ext}"
        dump(obj, str(p))
        assert load(str(p)) == obj

    def test_fileobj(self, tmp_path):
        p = tmp_path / "f.json"
        with open(p, "w") as f:
            dump({"k": 1}, f, file_format="json")
        with open(p) as f:
            assert load(f, file_format="json") == {"k": 1}

    def test_bad_format(self, tmp_path):
        with pytest.raises(ValueError):
            load(str(tmp_path / "f.xyz"))


class TestMisc:
    def test_predicates(self):
        assert is_str("x") and not is_str(1)
        assert is_list_of([1, 2], int)
        assert not is_list_of([1, "a"], int)
        assert not is_list_of("ab", str)

    def test_to_array(self):
        assert to_array(3).shape == ()
        assert to_array([1, 2]).dtype.kind == "i"
        a = to_array(np.ones((2, 2)), dtype=np.float32)
        assert a.dtype == np.float32
        import torch

        t = to_array(torch.ones(3))
        assert isinstance(t, np.ndarray) and t.shape == (3,)

    def test_random_scale_single(self):
        assert random_scale((1333, 800)) == (1333, 800)

    def test_random_scale_value(self):
        rng = random.Random(0)
        choices = [(1333, 800), (1333, 640)]
        for _ in range(10):
            assert random_scale(choices, "value", rng) in choices

    def test_random_scale_range(self):
        rng = random.Random(0)
        for _ in range(20):
            long, short = random_scale([(1333, 800), (1000, 600)], "range", rng)
            assert 1000 <= long <= 1333 and 600 <= short <= 800

    def test_random_scale_errors(self):
        with pytest.raises(ValueError):
            random_scale((1, 2, 3))
        with pytest.raises(ValueError):
            random_scale([(1, 2), (3, 4), (5, 6)], "range")


class TestConfig:
    def test_attr_access_and_merge(self):
        cfg = Config({"model": {"backbone": {"type": "ResNet", "depth": 50}}})
        assert cfg.model.backbone.type == "ResNet"
        cfg.model.backbone.depth = 101
        assert cfg["model"]["backbone"]["depth"] == 101
        merged = merge_dicts({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}, "b": 4})
        assert merged == {"a": {"x": 1, "y": 3}, "b": 4}

    def test_fromfile_py_with_base(self, tmp_path):
        (tmp_path / "base.py").write_text("lr = 0.1\nmodel = dict(type='ResNet', depth=50)\n")
        (tmp_path / "child.py").write_text("_base_ = 'base.py'\nmodel = dict(depth=101)\n")
        cfg = Config.fromfile(tmp_path / "child.py")
        assert cfg.lr == 0.1
        assert cfg.model.type == "ResNet" and cfg.model.depth == 101

    def test_fromfile_yaml(self, tmp_path):
        (tmp_path / "c.yaml").write_text("a: 1\nb:\n  c: 2\n")
        cfg = Config.fromfile(tmp_path / "c.yaml")
        assert cfg.a == 1 and cfg.b.c == 2
