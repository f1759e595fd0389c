"""Shared model building blocks (flax.linen, NHWC).

TPU-first re-design of reference ``models/utils/layers.py`` (TCGGroup/
Torch_Detection): ConvModule (conv+norm+act with configurable order,
ref ``layers.py:57-135``), 32-group GN rule (``:138-154``), channel shuffle
(``:157-171``), channel split (``:174-180``), SE block (``:183-202``).

Design notes:
* NHWC layout + HWIO kernels — XLA's native TPU convolution layout; the MXU
  consumes convs as implicit GEMMs, so channels-last keeps the contraction on
  the lane dimension.
* Norm is selected by a ``norm_cfg`` dict ({'type': 'BN'|'GN'|'FrozenBN'}).
  FrozenBN (running stats, still-affine) is the detection default: it removes
  batch-stat collectives, which matters under data parallelism on a mesh.
* The reference's ShuffleLayer float-division bug (``layers.py:170``) and
  ChannelSplit axis bug (``:179``) are fixed, not replicated.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def get_group_gn(channels: int, group_size: int = 0, num_groups: int = 32) -> int:
    """Group count for GN: fixed ``num_groups`` (default 32) or channels//group_size."""
    if group_size > 0:
        assert channels % group_size == 0, f"channels {channels} % group_size {group_size} != 0"
        return channels // group_size
    assert channels % num_groups == 0, f"channels {channels} % num_groups {num_groups} != 0"
    return num_groups


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored statistics (eval-mode BN).

    Matches the reference's ``bn_eval=True`` semantics (``resnet.py:270-279``):
    backbones run with frozen running stats during training.  Stats live in
    the ``batch_stats`` collection (importable from torch checkpoints); scale
    and bias live in ``params`` (freeze them via an optax mask for
    ``bn_frozen`` semantics).
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))
        # fold into a single multiply-add: y = x * k + b (fuses into the
        # producing conv under XLA)
        k = scale * jax.lax.rsqrt(var.value + self.epsilon)
        b = bias - mean.value * k
        dtype = self.dtype or x.dtype
        return x * k.astype(dtype) + b.astype(dtype)


def build_norm(norm_cfg: Optional[dict], dtype: Optional[Dtype] = None, name: Optional[str] = None) -> Optional[nn.Module]:
    """Instantiate a norm layer from a config dict.

    Supported types: ``BN`` (trainable batch stats), ``FrozenBN`` (eval-mode
    stats, the detection-backbone default), ``GN`` (32-group rule).
    """
    if norm_cfg is None:
        return None
    cfg = dict(norm_cfg)
    kind = cfg.pop("type")
    if kind == "BN":
        return nn.BatchNorm(
            use_running_average=cfg.pop("use_running_average", None),
            momentum=cfg.pop("momentum", 0.9),
            epsilon=cfg.pop("eps", 1e-5),
            dtype=dtype,
            name=name,
            **cfg,
        )
    if kind == "FrozenBN":
        return FrozenBatchNorm(epsilon=cfg.pop("eps", 1e-5), dtype=dtype, name=name)
    if kind == "GN":
        return nn.GroupNorm(
            num_groups=cfg.pop("num_groups", 32),
            epsilon=cfg.pop("eps", 1e-5),
            dtype=dtype,
            name=name,
        )
    raise ValueError(f"unknown norm type {kind!r}")


_ACTS: dict = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
    # Darknet convention (YOLO family): slope 0.1, not flax's 0.01 default
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "gelu": nn.gelu,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
    None: None,
}


def build_act(act: Optional[str]) -> Optional[Callable]:
    if act not in _ACTS:
        raise ValueError(f"unknown activation {act!r}")
    return _ACTS[act]


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def merged_group_count(cin: int, groups: int) -> int:
    """Merged feature_group_count for TPU grouped convs.

    Narrow conv groups starve the 128-lane MXU: XLA runs an X50-32x4d
    stage-1 3x3 (32 groups of width 4) at 7.8 ms where the SAME contraction
    block-diagonally merged runs at 0.56 (measured r3 @ b8 608x1024 bf16;
    every X50 stage shape optimizes at per-group input width 128 — one MXU
    tile: C=256 -> g2, C=512 -> g4, C=1024 -> g8, 4-14x each).  Returns the
    largest divisor of ``groups`` keeping merged input width >= 128 (1 — a
    dense block-diagonal conv — when groups are too narrow even merged).
    Depthwise convs (groups == cin) are left alone: XLA lowers those to the
    VPU, where merging would only inflate FLOPs.
    """
    if groups <= 1 or groups == cin:
        return groups
    best = 1
    for d in range(2, groups + 1):
        if groups % d == 0 and cin // d >= 128:
            best = d
    return best


class GroupMergedConv(nn.Module):
    """Grouped conv with TPU block-diagonal group merging.

    Param tree is identical to ``nn.Conv`` (``kernel`` of shape
    (kh, kw, cin/groups, features), optional ``bias``) so checkpoints and
    the torch importer are unaffected; the merged kernel is re-indexed from
    the logical one at trace time.  Off-TPU, or when
    ``merged_group_count`` keeps the native grouping, this lowers exactly
    like ``nn.Conv`` with ``feature_group_count=groups``.  Merging is
    numerics-preserving: the inserted off-diagonal weights are exact zeros,
    so every product they contribute is 0.0 and per-output accumulation
    is unchanged.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    merge: Optional[bool] = None  # None: merge on TPU only (tests force True)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        g0 = self.groups
        cg = cin // g0
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cg, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype

        do_merge = self.merge
        if do_merge is None:
            do_merge = jax.devices()[0].platform == "tpu"
        gm = merged_group_count(cin, g0) if do_merge else g0
        if gm != g0:
            m = g0 // gm  # logical groups per merged group
            co = self.features // g0  # outputs per logical group
            w_in = cg * m
            # K[.., s'*cg + c, (big, s, o)] = kernel[.., c, (big, s, o)] iff s' == s
            k6 = kernel.reshape(kh, kw, cg, gm, m, co)
            big = jnp.zeros((kh, kw, w_in, gm, m, co), jnp.float32)
            for s in range(m):
                big = big.at[:, :, s * cg:(s + 1) * cg, :, s, :].set(k6[:, :, :, :, s, :])
            kernel = big.reshape(kh, kw, w_in, self.features)
            g = gm
        else:
            g = g0
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            self.strides,
            self.padding if isinstance(self.padding, str) else list(self.padding),
            rhs_dilation=self.kernel_dilation,
            feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class ConvModule(nn.Module):
    """conv (+ norm) (+ act) with configurable op order.

    ``order=('conv','norm','act')`` is post-activation (default);
    ``('norm','act','conv')`` is pre-activation — both supported like the
    reference ``layers.py:57-135``.  Bias defaults to off when a norm follows
    the conv (reference convs are bias-free, ``layers.py:6-47``).
    """

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: Optional[bool] = None
    norm_cfg: Optional[dict] = None
    act: Optional[str] = "relu"
    order: Tuple[str, ...] = ("conv", "norm", "act")
    dtype: Optional[Dtype] = None

    def setup(self):
        assert set(self.order) <= {"conv", "norm", "act"} and "conv" in self.order
        bias = self.use_bias if self.use_bias is not None else (self.norm_cfg is None)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        if self.groups > 1:
            # grouped convs route through the TPU block-diagonal group
            # merger (param tree identical to nn.Conv — see GroupMergedConv)
            self.conv = GroupMergedConv(
                features=self.out_channels,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.stride),
                padding=pad,
                kernel_dilation=_pair(self.dilation),
                groups=self.groups,
                use_bias=bias,
                dtype=self.dtype,
                name="conv",
            )
        else:
            self.conv = nn.Conv(
                features=self.out_channels,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.stride),
                padding=pad,
                kernel_dilation=_pair(self.dilation),
                feature_group_count=self.groups,
                use_bias=bias,
                dtype=self.dtype,
                name="conv",
            )
        self.norm = build_norm(self.norm_cfg, dtype=self.dtype, name="norm")
        self.act_fn = build_act(self.act)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for op in self.order:
            if op == "conv":
                x = self.conv(x)
            elif op == "norm" and self.norm is not None:
                if isinstance(self.norm, nn.BatchNorm):
                    x = self.norm(x, use_running_average=not train)
                else:
                    x = self.norm(x)
            elif op == "act" and self.act_fn is not None:
                x = self.act_fn(x)
        return x


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """ShuffleNet channel shuffle on NHWC: (…, g*c) -> interleave groups.

    Pure reshape/transpose — XLA lowers this to a relayout, no copy through
    HBM in most fusions.
    """
    n, h, w, c = x.shape
    assert c % groups == 0, f"channels {c} not divisible by groups {groups}"
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


def channel_split(x: jax.Array, sections: int = 2) -> Sequence[jax.Array]:
    """Split NHWC channels into equal sections (ShuffleNet v2 dual branch)."""
    c = x.shape[-1]
    assert c % sections == 0
    return jnp.split(x, sections, axis=-1)


class SELayer(nn.Module):
    """Squeeze-and-Excitation: global-avg-pool -> fc/relu -> fc/sigmoid -> scale.

    The two FCs are 1x1 convs on the pooled vector so the whole block is two
    tiny MXU matmuls + a broadcast multiply.
    """

    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        squeezed = jnp.mean(x, axis=(1, 2))  # (N, C)
        hidden = max(self.channels // self.reduction, 1)
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(squeezed)
        y = nn.relu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


def max_pool_same_torch(x: jax.Array, window: int, stride: int, padding: int) -> jax.Array:
    """torch-style MaxPool2d (explicit symmetric padding, -inf fill), NHWC.

    Decomposed into H-then-W 1-D reduce_windows: max is separable, so the
    result is bit-identical to the joint 2-D window, and the split runs
    ~25% faster on TPU (measured r3 at the R50 stem shape: 2.10 -> 1.68 ms
    for 3x3 s2 at b8 400x608x64 bf16; a Pallas kernel attempt bottomed out
    at 1.47 ms for its DMAs alone and was not worth the complexity).
    """
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    y = jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, window, 1, 1),
        window_strides=(1, stride, 1, 1),
        padding=((0, 0), (padding, padding), (0, 0), (0, 0)),
    )
    return jax.lax.reduce_window(
        y,
        init,
        jax.lax.max,
        window_dimensions=(1, 1, window, 1),
        window_strides=(1, 1, stride, 1),
        padding=((0, 0), (0, 0), (padding, padding), (0, 0)),
    )


def avg_pool_torch(x: jax.Array, window: int, stride: int, padding: int = 0) -> jax.Array:
    """torch-style AvgPool2d (count includes padding), NHWC."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    return summed / (window * window)


def resize_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample on NHWC (FPN top-down path).

    Implemented as broadcast+reshape — cheaper for XLA than gather-based
    jax.image.resize and bit-exact with torch ``interpolate(mode='nearest')``.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def resize_nearest(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize to an arbitrary (H, W), matching torch
    ``interpolate(mode='nearest')`` index arithmetic (floor(i * in/out))."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (2 * h, 2 * w):
        return resize_nearest_2x(x)
    rows = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    cols = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, rows][:, :, cols]
