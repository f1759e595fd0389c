"""Weight initializers (parity surface: reference ``models/utils/inits.py:5-52``).

These return flax/jax initializer callables rather than mutating modules in
place (JAX params are immutable pytrees).  ``bias_init_with_prob`` mirrors the
focal-loss prior-bias trick (reference ``inits.py:49-52``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import nn as jnn
from jax.nn.initializers import constant as constant_init  # noqa: F401
from jax.nn.initializers import normal as normal_init  # noqa: F401
from jax.nn.initializers import uniform as uniform_init  # noqa: F401


def xavier_init(gain: float = 1.0, distribution: str = "normal"):
    """Xavier/Glorot initializer over (fan_in, fan_out) of HWIO kernels."""
    assert distribution in ("normal", "uniform")
    if distribution == "normal":
        return jnn.initializers.variance_scaling(gain, "fan_avg", "truncated_normal")
    return jnn.initializers.variance_scaling(gain, "fan_avg", "uniform")


def kaiming_init(mode: str = "fan_out", nonlinearity: str = "relu", distribution: str = "normal"):
    """He initializer (torch kaiming_normal_/kaiming_uniform_ equivalent)."""
    assert mode in ("fan_in", "fan_out", "fan_avg")
    assert distribution in ("normal", "uniform")
    gain = 2.0 if nonlinearity == "relu" else 1.0
    dist = "truncated_normal" if distribution == "normal" else "uniform"
    return jnn.initializers.variance_scaling(gain, mode, dist)


def bias_init_with_prob(prior_prob: float) -> float:
    """Bias value so that sigmoid(bias) == prior_prob (RetinaNet cls head)."""
    return float(-math.log((1 - prior_prob) / prior_prob))


def caffe2_xavier_init():
    """Caffe2-style 'XavierFill' = kaiming_uniform with fan_in (FPN convs)."""
    return jnn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
