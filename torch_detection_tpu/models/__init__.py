from . import backbones, detectors, heads, necks
from .inits import bias_init_with_prob, kaiming_init, xavier_init
from .layers import (
    ConvModule,
    FrozenBatchNorm,
    SELayer,
    build_act,
    build_norm,
    channel_shuffle,
    channel_split,
    get_group_gn,
)
from .torch_import import (
    RESNET_KEY_RULES,
    convert_state_dict,
    load_torch_checkpoint,
    load_torch_weights,
)

__all__ = [
    "backbones",
    "necks",
    "bias_init_with_prob",
    "kaiming_init",
    "xavier_init",
    "ConvModule",
    "FrozenBatchNorm",
    "SELayer",
    "build_act",
    "build_norm",
    "channel_shuffle",
    "channel_split",
    "get_group_gn",
    "RESNET_KEY_RULES",
    "convert_state_dict",
    "load_torch_checkpoint",
    "load_torch_weights",
]
