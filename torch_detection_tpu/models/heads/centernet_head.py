"""CenterNet head: center heatmap + size + sub-pixel offset branches.

"Objects as Points" (Zhou et al. 2019) on the single stride-4 map the
CTResNetNeck produces.  No reference counterpart (the reference never built
a detector tier — SURVEY.md §2 #33).  Each branch is a 3x3 feature conv +
relu + 1x1 projection; the heatmap projection carries the focal bias init
(prior 0.1, the paper's -2.19) so early training isn't swamped by the
(H*W*C - G) negatives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..inits import bias_init_with_prob

Dtype = Any


@HEADS.register_module
class CenterNetHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 64
    feat_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(B, H, W, C_in) single-level input -> (heatmap (B, H, W, C),
        wh (B, H, W, 2), offset (B, H, W, 2)), raw logits/regressions."""
        x = feats[0]

        def branch(name, out_ch, bias_init=None):
            h = nn.Conv(
                self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                name=f"{name}_feat",
            )(x)
            h = nn.relu(h)
            kwargs = {}
            if bias_init is not None:
                kwargs["bias_init"] = lambda key, shape, dtype=jnp.float32: jnp.full(
                    shape, bias_init, dtype
                )
            return nn.Conv(
                out_ch, (1, 1), dtype=self.dtype, name=f"{name}_out", **kwargs
            )(h)

        heat = branch("heatmap", self.num_classes, bias_init=bias_init_with_prob(0.1))
        wh = branch("wh", 2)
        offset = branch("offset", 2)
        return heat, wh, offset
