"""Config: attribute-accessible dict tree loadable from py/json/yaml files.

The reference uses bare python dicts with a ``'type'`` key resolved by
``obj_from_dict`` (``utils/utils.py:5-38``); it has no config *files*.  We keep
the same dict surface (every node is a plain dict under the hood, so
``Registry.build(cfg.model.backbone)`` works) and add file loading + dotted
attribute access + merge, which the absent trainer tier needs.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path
from typing import Any, Dict

from . import file_handler


class ConfigDict(dict):
    """dict with attribute access; nested dicts are wrapped on the fly."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_wrap(v) for v in obj)
    return obj


def _load_py_config(path: Path) -> Dict[str, Any]:
    spec = importlib.util.spec_from_file_location(f"_td_cfg_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    try:
        spec.loader.exec_module(mod)
        return {
            k: v
            for k, v in vars(mod).items()
            if (k == "_base_" or not k.startswith("_"))
            and not callable(v)
            and not isinstance(v, type(sys))
        }
    finally:
        sys.modules.pop(spec.name, None)


def merge_dicts(base: Dict, override: Dict) -> Dict:
    """Recursive merge; override wins. ``{'_delete_': True}`` replaces a node."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and v.pop("_delete_", False):
            out[k] = merge_dicts({}, v)
        elif k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


class Config(ConfigDict):
    """Top-level config. ``Config.fromfile`` supports .py/.json/.yaml with a
    ``_base_`` inheritance chain (str or list of str, relative to the file)."""

    @classmethod
    def fromfile(cls, filename) -> "Config":
        path = Path(filename).expanduser().resolve()
        if path.suffix == ".py":
            raw = _load_py_config(path)
        else:
            raw = file_handler.load(path)
        bases = raw.pop("_base_", None)
        merged: Dict[str, Any] = {}
        if bases is not None:
            if isinstance(bases, str):
                bases = [bases]
            for b in bases:
                merged = merge_dicts(merged, dict(cls.fromfile(path.parent / b)))
        merged = merge_dicts(merged, raw)
        return cls(_wrap(merged))

    def dump(self, filepath) -> None:
        file_handler.dump(_to_plain(self), filepath)


def _to_plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    return obj
