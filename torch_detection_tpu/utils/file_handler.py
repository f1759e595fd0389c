"""Pluggable file IO keyed by extension (pkl/json/yaml).

Parity surface: reference ``datasets/utils/file_handler.py:7-96`` (pkl + json);
yaml added because configs here are files, not inline dicts.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict

from .misc import is_str


class BaseFileHandler:
    binary = False

    def load_from_fileobj(self, file, **kwargs) -> Any:
        raise NotImplementedError

    def dump_to_fileobj(self, obj, file, **kwargs) -> None:
        raise NotImplementedError

    def load_from_path(self, filepath, **kwargs) -> Any:
        mode = "rb" if self.binary else "r"
        with open(filepath, mode) as f:
            return self.load_from_fileobj(f, **kwargs)

    def dump_to_path(self, obj, filepath, **kwargs) -> None:
        mode = "wb" if self.binary else "w"
        with open(filepath, mode) as f:
            self.dump_to_fileobj(obj, f, **kwargs)


class PickleHandler(BaseFileHandler):
    binary = True

    def load_from_fileobj(self, file, **kwargs):
        return pickle.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        kwargs.setdefault("protocol", pickle.HIGHEST_PROTOCOL)
        pickle.dump(obj, file, **kwargs)


class JsonHandler(BaseFileHandler):
    def load_from_fileobj(self, file, **kwargs):
        return json.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        json.dump(obj, file, **kwargs)


class YamlHandler(BaseFileHandler):
    def load_from_fileobj(self, file, **kwargs):
        import yaml

        kwargs.setdefault("Loader", yaml.SafeLoader)
        return yaml.load(file, **kwargs)

    def dump_to_fileobj(self, obj, file, **kwargs):
        import yaml

        yaml.safe_dump(obj, file, **kwargs)


_HANDLERS: Dict[str, BaseFileHandler] = {
    "pkl": PickleHandler(),
    "pickle": PickleHandler(),
    "json": JsonHandler(),
    "yaml": YamlHandler(),
    "yml": YamlHandler(),
}


def _ext(filepath) -> str:
    return Path(filepath).suffix.lstrip(".").lower()


def load(filepath, file_format: str = None, **kwargs) -> Any:
    """Load pkl/json/yaml by extension (or explicit ``file_format``)."""
    fmt = file_format or _ext(filepath)
    if fmt not in _HANDLERS:
        raise ValueError(f"unsupported file format: {fmt!r}")
    if is_str(filepath) or isinstance(filepath, Path):
        return _HANDLERS[fmt].load_from_path(filepath, **kwargs)
    return _HANDLERS[fmt].load_from_fileobj(filepath, **kwargs)


def dump(obj, filepath, file_format: str = None, **kwargs) -> None:
    fmt = file_format or _ext(filepath)
    if fmt not in _HANDLERS:
        raise ValueError(f"unsupported file format: {fmt!r}")
    if is_str(filepath) or isinstance(filepath, Path):
        _HANDLERS[fmt].dump_to_path(obj, filepath, **kwargs)
    else:
        _HANDLERS[fmt].dump_to_fileobj(obj, filepath, **kwargs)
