"""String-keyed component registry.

TPU-native re-design of the reference registry (``models/registry.py:4-41`` in
TCGGroup/Torch_Detection).  Differences from the reference, on purpose:

* no ``nn.Module`` subclass restriction — we register plain callables
  (flax modules, dataclasses, factory functions alike);
* ``build`` is part of the registry itself (the reference used a separate
  ``obj_from_dict`` helper at ``utils/utils.py:5-38``), so a config dict
  ``{'type': 'ResNet', ...kwargs}`` resolves against exactly one namespace.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> constructor mapping with decorator-based registration."""

    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Callable]:
        return dict(self._module_dict)

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={sorted(self._module_dict)})"

    def get(self, key: str) -> Optional[Callable]:
        return self._module_dict.get(key)

    def register_module(self, cls: Optional[Callable] = None, *, name: Optional[str] = None):
        """Register a class/callable.  Usable as ``@R.register_module`` or
        ``@R.register_module(name='Alias')``."""

        def _register(obj: Callable) -> Callable:
            if not callable(obj):
                raise TypeError(f"can only register callables, got {type(obj)}")
            key = name if name is not None else obj.__name__
            if key in self._module_dict:
                raise KeyError(f"{key} already registered in {self._name}")
            self._module_dict[key] = obj
            return obj

        if cls is None:
            return _register
        return _register(cls)

    def build(self, cfg: Dict[str, Any], **default_kwargs) -> Any:
        """Instantiate from ``{'type': <name-or-callable>, **kwargs}``.

        ``default_kwargs`` fill in keys absent from ``cfg`` (mirrors the
        reference ``obj_from_dict(info, parent, default_args)`` contract).
        """
        return build_from_cfg(cfg, self, **default_kwargs)


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, **default_kwargs) -> Any:
    if not isinstance(cfg, dict) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}")
    elif callable(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"'type' must be a str or callable, got {type(obj_type)}")
    for k, v in default_kwargs.items():
        args.setdefault(k, v)
    return obj_cls(**args)


def obj_from_dict(info: Dict[str, Any], parent: Any, default_args: Optional[Dict] = None) -> Any:
    """Instantiate ``{'type': Name, ...}`` against a module/namespace.

    API-compatible with the reference ``utils/utils.py:5-38`` so configs
    written for the reference keep working.
    """
    if not isinstance(info, dict) or "type" not in info:
        raise TypeError(f"info must be a dict with a 'type' key, got {info!r}")
    args = dict(info)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        if inspect.ismodule(parent):
            obj_type = getattr(parent, obj_type)
        else:
            obj_type = getattr(parent, obj_type, None) or parent[obj_type]
    elif not callable(obj_type):
        raise TypeError(f"'type' must be a str or callable, got {type(obj_type)}")
    if default_args is not None:
        for k, v in default_args.items():
            args.setdefault(k, v)
    return obj_type(**args)


# Global registries mirroring the reference's BACKBONES/NECKS
# (models/registry.py:40-41) plus the detection tiers the reference left
# absent (core/__init__.py empty).
BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
DETECTORS = Registry("detectors")
DATASETS = Registry("datasets")
TRANSFORMS = Registry("transforms")
