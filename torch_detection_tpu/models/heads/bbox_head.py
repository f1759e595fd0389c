"""R-CNN second-stage box head: 2 shared FCs -> softmax cls + box deltas.

TPU notes: RoI features arrive as a fixed (B, R, 7, 7, C) tensor from
``ops/roi_align``; the head is two dense MXU matmuls over the flattened roi
batch.  Classification uses a (num_classes + 1)-way softmax with class 0 =
background (the standard Faster R-CNN convention).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS

Dtype = Any


@HEADS.register_module
class BBoxHead(nn.Module):
    num_classes: int  # foreground classes
    fc_channels: int = 1024
    reg_class_agnostic: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, roi_feats: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """roi_feats (B, R, S, S, C) -> (cls_logits (B, R, C+1), deltas)."""
        b, r = roi_feats.shape[:2]
        x = roi_feats.reshape(b * r, -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = nn.Dense(reg_dim, dtype=self.dtype, name="reg")(x)
        return cls.reshape(b, r, -1), reg.reshape(b, r, -1)
