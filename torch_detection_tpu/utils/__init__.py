from .config import Config, ConfigDict, merge_dicts
from .file_handler import dump, load
from .misc import (
    exist_or_mkdir,
    file_is_exist,
    is_list_of,
    is_str,
    is_tuple_of,
    random_scale,
    to_array,
)
from .registry import (
    BACKBONES,
    DATASETS,
    DETECTORS,
    HEADS,
    NECKS,
    TRANSFORMS,
    Registry,
    build_from_cfg,
    obj_from_dict,
)

__all__ = [
    "Config",
    "ConfigDict",
    "merge_dicts",
    "dump",
    "load",
    "exist_or_mkdir",
    "file_is_exist",
    "is_list_of",
    "is_str",
    "is_tuple_of",
    "random_scale",
    "to_array",
    "BACKBONES",
    "DATASETS",
    "DETECTORS",
    "HEADS",
    "NECKS",
    "TRANSFORMS",
    "Registry",
    "build_from_cfg",
    "obj_from_dict",
]
