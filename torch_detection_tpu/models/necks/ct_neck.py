"""CenterNet deconv neck: C5 -> stride-4 feature via three 2x upsamples.

The classic CenterNet (Zhou et al. 2019, "Objects as Points") recovers a
single high-resolution map from the backbone's coarsest level with a
deconvolution stack; no reference counterpart exists (the reference has no
detector tier — SURVEY.md §2 #33).  Each stage is a 3x3 channel-reducing
conv followed by a 4x4 stride-2 transposed conv, both norm+relu.  Output is
a 1-tuple so the SingleStageDetector head contract (sequence of levels)
holds.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from flax import linen as nn

from ...utils.registry import NECKS
from ..layers import ConvModule, build_norm

Dtype = Any


@NECKS.register_module
class CTResNetNeck(nn.Module):
    in_channels: int = 512
    num_deconv_filters: Tuple[int, ...] = (256, 128, 64)
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        # FrozenBN (affine-only at init stats) matches the framework-wide
        # frozen-batch-stats training convention — the train step never
        # mutates collections (parallel/train_step.py); a live-BN neck
        # would silently train with stale stats instead
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        x = feats[-1]
        for i, ch in enumerate(self.num_deconv_filters):
            x = ConvModule(
                ch, kernel_size=3, padding=1, norm_cfg=norm_cfg, act="relu",
                dtype=self.dtype, name=f"reduce{i}",
            )(x, train=train)
            x = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME", use_bias=False,
                dtype=self.dtype, name=f"up{i}",
            )(x)
            norm = build_norm(norm_cfg, dtype=self.dtype, name=f"up_norm{i}")
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            elif norm is not None:
                x = norm(x)
            x = nn.relu(x)
        return (x,)
