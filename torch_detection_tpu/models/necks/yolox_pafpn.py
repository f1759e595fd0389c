"""YOLOX PAFPN neck: CSP top-down + bottom-up path aggregation, SiLU.

Ge et al., YOLOX 2021.  Same PAN topology as the reference's PAFPN
(``models/necks/pafpn.py:9-148``) but with CSP fusion layers instead of
plain convs and nearest-2x upsampling, matching the YOLOX formulation.
Outputs one map per input level at the input strides (8, 16, 32), all
``out_channels`` wide.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS
from ..backbones.csp_darknet import CSPLayer
from ..layers import ConvModule

Dtype = Any


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x (bit-exact repeat, matches FPN's convention)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


@NECKS.register_module
class YOLOXPAFPN(nn.Module):
    in_channels: Tuple[int, ...] = (128, 256, 512)  # fine -> coarse (C3..C5)
    out_channels: int = 128
    num_csp_blocks: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        assert len(feats) == len(self.in_channels)
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        n = len(feats)
        ch = self.out_channels

        # top-down: reduce coarse, upsample, concat with finer, CSP-fuse
        inner = list(feats)
        for i in range(n - 1, 0, -1):
            reduced = ConvModule(ch, 1, norm_cfg=norm_cfg, act="silu",
                                 dtype=self.dtype, name=f"reduce{i}")(
                inner[i], train=train)
            inner[i] = reduced
            merged = jnp.concatenate([_upsample2x(reduced), inner[i - 1]], axis=-1)
            inner[i - 1] = CSPLayer(
                ch, num_blocks=self.num_csp_blocks, shortcut=False,
                norm_cfg=norm_cfg, dtype=self.dtype, name=f"td_csp{i - 1}",
            )(merged, train=train)

        # bottom-up: stride-2 conv down, concat with reduced coarse, CSP-fuse
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvModule(ch, 3, stride=2, padding=1, norm_cfg=norm_cfg,
                              act="silu", dtype=self.dtype, name=f"down{i}")(
                outs[-1], train=train)
            merged = jnp.concatenate([down, inner[i + 1]], axis=-1)
            outs.append(CSPLayer(
                ch, num_blocks=self.num_csp_blocks, shortcut=False,
                norm_cfg=norm_cfg, dtype=self.dtype, name=f"bu_csp{i}",
            )(merged, train=train))

        return tuple(
            ConvModule(ch, 1, norm_cfg=norm_cfg, act="silu", dtype=self.dtype,
                       name=f"out{i}")(o, train=train)
            for i, o in enumerate(outs)
        )
