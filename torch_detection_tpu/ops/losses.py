"""Detection losses (pure jnp, mask-weighted, fixed shapes).

The reference has no loss tier (SURVEY.md §2 #33 [ABSENT]); the only hook is
``bias_init_with_prob`` (reference ``models/utils/inits.py:49-52``) which
implies focal-loss heads.  This module supplies the standard detection set:
sigmoid focal loss, smooth L1, (binary) cross-entropy, IoU/GIoU.

Convention: every loss takes an elementwise ``weight`` and an ``avg_factor``;
reductions are explicit sums over masked elements so batches stay
fixed-shape (padding rows get weight 0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray], avg_factor: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    total = jnp.sum(loss)
    if avg_factor is None:
        return total
    return total / jnp.maximum(avg_factor, 1.0)


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # (..., C)
    targets: jnp.ndarray,  # (..., C) one-hot {0,1}
    weight: Optional[jnp.ndarray] = None,  # broadcastable to logits
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """RetinaNet focal loss: FL(p_t) = -alpha_t (1 - p_t)^gamma log(p_t)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    return _reduce(loss, weight, avg_factor)


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    beta: float = 1.0 / 9.0,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Huber-style bbox regression loss."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(
    logits: jnp.ndarray,  # (..., C)
    labels: jnp.ndarray,  # (...,) int
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor)


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return _reduce(optax_sigmoid_ce(logits, targets), weight, avg_factor)


def iou_loss(
    pred: jnp.ndarray,  # (..., 4) xyxy
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,  # (...,)
    mode: str = "giou",
    offset: float = 1.0,
    eps: float = 1e-7,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Aligned (elementwise) IoU / GIoU loss between matching box pairs."""
    assert mode in ("iou", "giou", "linear_iou")
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0] + offset) * (pred[..., 3] - pred[..., 1] + offset)
    at = (target[..., 2] - target[..., 0] + offset) * (target[..., 3] - target[..., 1] + offset)
    union = jnp.maximum(ap + at - inter, eps)
    iou = inter / union
    if mode == "iou":
        loss = -jnp.log(jnp.clip(iou, eps, 1.0))
    elif mode == "linear_iou":
        loss = 1.0 - iou
    else:  # giou
        elt = jnp.minimum(pred[..., :2], target[..., :2])
        erb = jnp.maximum(pred[..., 2:4], target[..., 2:4])
        ewh = jnp.clip(erb - elt + offset, 0.0, None)
        enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
        giou = iou - (enclose - union) / enclose
        loss = 1.0 - giou
    return _reduce(loss, weight, avg_factor)
