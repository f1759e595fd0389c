"""SSD-VGG16 trunk (flax.linen, NHWC): VGG16 + SSD extra feature layers.

The reference ships a plain VGG backbone (``models/backbone/vgg.py`` in
TCGGroup/Torch_Detection) whose historical consumer is SSD; the detector
tier was never built there (SURVEY.md §2 #33 [ABSENT]).  This is the
SSD300/512 trunk that makes it a working detector:

  * VGG16 conv1_1..conv5_3 with ceil-mode pooling (SAME padding — for the
    300 canvas this is the canonical 300/150/75/38/19 ladder),
  * pool5 3x3 stride 1 + dilated fc6/fc7 (conv6 3x3 d6 -> 1024,
    conv7 1x1 -> 1024),
  * extra blocks conv8..conv11 (1x1 bottleneck + 3x3, stride 2 for 8/9,
    unpadded for 10/11),
  * learnable L2Norm rescale (init 20) on the conv4_3 output.

Outputs six maps: conv4_3n (stride 8), conv7 (16), conv8_2 (32),
conv9_2 (64), conv10_2 (~100), conv11_2 (~300) — matching
``ops.anchors.SSDAnchorGenerator``'s default strides for a 300 canvas.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule

Dtype = Any


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learnable per-channel scale."""

    init_scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param(
            "scale", lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32), (c,)
        )
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + self.eps
        return (xf / norm * scale).astype(x.dtype)


@BACKBONES.register_module
class SSDVGG(nn.Module):
    depth: int = 16  # VGG16 trunk (the SSD standard)
    input_size: int = 300  # 300 or 512: selects the extra-block geometry
    l2_norm_scale: float = 20.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        assert self.depth == 16, "SSDVGG implements the VGG16 trunk"
        assert self.input_size in (300, 512)

        def conv(x, ch, name, k=3, stride=1, pad=1, dil=1):
            return ConvModule(
                ch, k, stride=stride, padding=pad, dilation=dil,
                use_bias=True, act="relu", dtype=self.dtype, name=name,
            )(x, train=train)

        def pool(x, window=2, stride=2):
            # SAME padding = ceil-mode pooling (SSD's pool3: 75 -> 38)
            return nn.max_pool(x, (window, window), (stride, stride), padding="SAME")

        outs = []
        for j in range(2):
            x = conv(x, 64, f"layer1_{j}")
        x = pool(x)
        for j in range(2):
            x = conv(x, 128, f"layer2_{j}")
        x = pool(x)
        for j in range(3):
            x = conv(x, 256, f"layer3_{j}")
        x = pool(x)
        for j in range(3):
            x = conv(x, 512, f"layer4_{j}")
        outs.append(L2Norm(init_scale=self.l2_norm_scale, name="l2_norm")(x))
        x = pool(x)
        for j in range(3):
            x = conv(x, 512, f"layer5_{j}")
        x = pool(x, window=3, stride=1)  # pool5: 3x3 s1
        x = conv(x, 1024, "conv6", k=3, pad=6, dil=6)
        x = conv(x, 1024, "conv7", k=1, pad=0)
        outs.append(x)
        if self.input_size == 300:
            # (bottleneck_ch, out_ch, kernel, stride, pad) per extra block
            extras = [
                (256, 512, 3, 2, 1),  # conv8: 19 -> 10
                (128, 256, 3, 2, 1),  # conv9: 10 -> 5
                (128, 256, 3, 1, 0),  # conv10: 5 -> 3
                (128, 256, 3, 1, 0),  # conv11: 3 -> 1
            ]
        else:  # 512
            extras = [
                (256, 512, 3, 2, 1),  # conv8: 32 -> 16
                (128, 256, 3, 2, 1),  # conv9: 16 -> 8
                (128, 256, 3, 2, 1),  # conv10: 8 -> 4
                (128, 256, 3, 2, 1),  # conv11: 4 -> 2
                (128, 256, 4, 1, 1),  # conv12: 2 -> 1 (the SSD512 4x4 tail)
            ]
        for i, (mid, out_ch, k, s, p) in enumerate(extras):
            n = 8 + i
            x = conv(x, mid, f"conv{n}_1", k=1, pad=0)
            x = conv(x, out_ch, f"conv{n}_2", k=k, stride=s, pad=p)
            outs.append(x)
        return tuple(outs)
